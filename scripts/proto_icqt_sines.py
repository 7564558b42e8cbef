"""Prototype: sinusoidal-model reconstruction of non-painless CQT bins.

Run CPU-only: PYTHONPATH=/root/repo python scripts/proto_icqt_sines.py
"""
import importlib

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

cqt_mod = importlib.import_module("audioflow_tpu.ops.cqt")

SR = 16000.0
HOP = 256
N_BINS = 84
BPO = 12
FMIN = cqt_mod.FMIN_C1
Q = 1.0 / (2.0 ** (1.0 / BPO) - 1.0)


def hann_spec_table(n=4097, umax=2.5):
    """Normalized hann-window spectrum H(u), u in kernel-DFT-bin units
    (u = delta_f * N / sr), H(0) = 1."""
    u = np.linspace(0.0, umax, n)
    # continuous hann of length N: W(u) = 0.5 sinc(u) + 0.25 sinc(u-1) + 0.25 sinc(u+1)
    def s(v):
        return np.sinc(v)
    h = 0.5 * s(u) + 0.25 * s(u - 1) + 0.25 * s(u + 1)
    return u, h / h[0]


U_TAB, H_TAB = hann_spec_table()


def h_of(u):
    u = np.clip(np.abs(u), 0, U_TAB[-1])
    return np.interp(u, U_TAB, H_TAB)


def sines_reconstruct(c, freqs, lengths, length, sin_mask):
    """c: [T_f, n_bins] complex coefficients (frame t centered at t*hop).
    sin_mask: bool per bin — synthesize only peaks among these bins."""
    c = np.asarray(c)
    tf, nb = c.shape
    mag = np.abs(c)
    # peaks across the FULL bin axis
    pad = np.pad(mag, ((0, 0), (1, 1)), constant_values=-1.0)
    is_peak = (mag > pad[:, :-2]) & (mag >= pad[:, 2:]) & sin_mask[None, :]
    # coarse freq: log-parabolic interp across bins (geometric spacing)
    lm = np.log(np.maximum(mag, 1e-12))
    lm_p = np.pad(lm, ((0, 0), (1, 1)), mode="edge")
    num = 0.5 * (lm_p[:, :-2] - lm_p[:, 2:])
    den = lm_p[:, :-2] - 2 * lm + lm_p[:, 2:]
    p = np.where(np.abs(den) > 1e-9, num / np.maximum(np.abs(den), 1e-9) * np.sign(den), 0.0)
    p = np.clip(p, -0.5, 0.5)
    f_coarse = freqs[None, :] * 2.0 ** (p / BPO)
    # phase advance between consecutive frames
    dphi = np.angle(c[1:] * np.conj(c[:-1]))  # [T_f-1, nb]
    dphi = np.concatenate([dphi, dphi[-1:]], axis=0) / (2 * np.pi)  # cycles/frame
    fr_rate = SR / HOP
    m = np.round(f_coarse / fr_rate - dphi)
    f_hat = (m + dphi) * fr_rate
    # amplitude calibration: a = |c| / H((f_hat - f_k) * N_k / sr)
    u = (f_hat - freqs[None, :]) * lengths[None, :] / SR
    calib = np.maximum(h_of(u), 0.1)
    amp = mag / calib
    phase0 = np.angle(c)
    # synthesis: hann bursts of length 2*hop OLA'd at hop (sums to 1)
    w = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(2 * HOP) / (2 * HOP))
    y = np.zeros(length + 4 * HOP)
    n_rel = np.arange(2 * HOP) - HOP  # relative to frame center
    for t in range(tf):
        ks = np.nonzero(is_peak[t])[0]
        if len(ks) == 0:
            continue
        ph = 2 * np.pi * f_hat[t, ks, None] * n_rel[None, :] / SR + phase0[t, ks, None]
        burst = (amp[t, ks, None] * np.cos(ph) * w[None, :]).sum(0)
        start = t * HOP - HOP + 2 * HOP  # offset by pad
        y[start:start + 2 * HOP] += burst
    return y[2 * HOP:2 * HOP + length]


def run():
    freqs = cqt_mod.cqt_frequencies(N_BINS, FMIN, BPO)
    lengths = cqt_mod.cqt_lengths(SR, N_BINS, FMIN, BPO).astype(np.float64)
    painless = HOP <= lengths / 3.0
    sin_mask = ~painless
    print(f"painless bins: {painless.sum()} (up to f={freqs[painless].max():.1f})")
    n = int(SR * 2)
    tvec = np.arange(n) / SR
    worst = 1e9
    for k in range(N_BINS):
        if painless[k]:
            continue
        f = freqs[k]
        x = np.sin(2 * np.pi * f * tvec + 0.7).astype(np.float32)[None]
        c = np.asarray(cqt_mod.cqt(jnp.asarray(x), SR, HOP, N_BINS, FMIN, BPO,
                                   output="complex", precision="highest"))[0]
        y = sines_reconstruct(c, freqs, lengths, n, sin_mask)
        edge = 4096
        xs, ys = x[0, edge:n - edge], y[edge:n - edge]
        snr = 10 * np.log10(np.mean(xs ** 2) / max(np.mean((ys - xs) ** 2), 1e-300))
        worst = min(worst, snr)
        print(f"bin {k:2d} f={f:8.1f} SNR {snr:6.1f} dB", flush=True)
    # mid-bin tone (hardest case): quarter-tone above bin 70
    for off in (0.25, 0.5):
        f = freqs[70] * 2 ** (off / 12)
        x = np.sin(2 * np.pi * f * tvec + 0.3).astype(np.float32)[None]
        c = np.asarray(cqt_mod.cqt(jnp.asarray(x), SR, HOP, N_BINS, FMIN, BPO,
                                   output="complex", precision="highest"))[0]
        y = sines_reconstruct(c, freqs, lengths, n, sin_mask)
        edge = 4096
        xs, ys = x[0, edge:n - edge], y[edge:n - edge]
        snr = 10 * np.log10(np.mean(xs ** 2) / max(np.mean((ys - xs) ** 2), 1e-300))
        print(f"mid-bin +{off} semitone f={f:.1f} SNR {snr:6.1f} dB")
    print(f"WORST bin-center {worst:.1f} dB")


if __name__ == "__main__":
    run()
