"""Prototype v2: hybrid inverse CQT at hop 256 / 84 bins / 16 kHz.

Low bins (painless at this hop): restricted dual-frame synthesis with a
spectral taper. High bins: sinusoidal-model synthesis (peak picking,
candidate-harmonic frequency estimation, calibrated oscillator OLA).
Crossfade in the taper band so both branches sum to one copy.

Run CPU-only: PYTHONPATH=/root/repo python scripts/proto_icqt_hybrid.py
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


def hann_spec_table(n=4097, umax=3.0):
    u = np.linspace(0.0, umax, n)
    h = 0.5 * np.sinc(u) + 0.25 * np.sinc(u - 1) + 0.25 * np.sinc(u + 1)
    return u, np.abs(h / h[0])


U_TAB, H_TAB = hann_spec_table()


def h_of(u):
    u = np.clip(np.abs(u), 0, U_TAB[-1])
    return np.maximum(np.interp(u, U_TAB, H_TAB), 1e-7)


def design_hybrid(taper_bins=3):
    """Returns (k_dual_hi, taper fn rho(f), dual bank restricted+tapered)."""
    freqs = cqt_mod.cqt_frequencies(N_BINS, FMIN, BPO)
    lengths = cqt_mod.cqt_lengths(SR, N_BINS, FMIN, BPO).astype(np.float64)
    painless = lengths >= 3 * HOP
    k_last = int(np.nonzero(painless)[0].max())  # last painless bin
    # spectral taper: 1 below freqs[k_last], cosine to 0 at freqs[k_last+taper]
    f_lo = freqs[k_last]
    f_hi = freqs[min(k_last + taper_bins, N_BINS - 1)]

    def rho(f):
        t = np.clip((np.log(np.maximum(f, 1e-9)) - np.log(f_lo))
                    / (np.log(f_hi) - np.log(f_lo)), 0.0, 1.0)
        return 0.5 * (1.0 + np.cos(np.pi * t))

    # dual design over bins 0..k_last only, with rho(omega) taper
    f0, _groups, onedot = cqt_mod._design(SR, HOP, N_BINS, FMIN, BPO, "hann", 1.0)
    nb_d = k_last + 1
    psi = (onedot[:, :nb_d].T.astype(np.float64)
           - 1j * onedot[:, N_BINS:N_BINS + nb_d].T.astype(np.float64))
    nd = f0 * 2
    psi_p = np.zeros((nb_d, nd), complex)
    off = nd // 2 - f0 // 2
    psi_p[:, off:off + f0] = psi
    ph = np.fft.fft(psi_p, axis=1)
    w_pos = (np.abs(ph) ** 2).sum(0)
    w_neg = np.empty_like(w_pos)
    w_neg[0] = w_pos[0]
    w_neg[1:] = w_pos[1:][::-1]
    w_tot = (w_pos + w_neg) / HOP
    amp = np.abs(ph)
    mask = amp >= amp.max(axis=1, keepdims=True) * 10.0 ** (-40.0 / 20.0)
    # frequency axis of the design grid (both signs)
    fgrid = np.fft.fftfreq(nd, d=1.0 / SR)
    taper = rho(np.abs(fgrid))
    d_hat = ph * mask * taper[None, :] / np.maximum(w_tot, 1e-2 * w_tot.max())[None, :]
    d = np.fft.ifft(d_hat, axis=1)
    bank = np.concatenate([2.0 * d.real, -2.0 * d.imag], axis=0)  # [2*nb_d, nd]
    return k_last, rho, nd, bank, freqs, lengths


def dual_reconstruct(c, k_last, nd, bank, length):
    """c: [T_f, n_bins] complex. Linear branch from bins 0..k_last."""
    tf = c.shape[0]
    ri = np.concatenate([c[:, :k_last + 1].real, c[:, :k_last + 1].imag], axis=1)
    frames = ri @ bank  # [T_f, nd]
    y = np.zeros(tf * HOP + nd)
    for t in range(tf):
        y[t * HOP:t * HOP + nd] += frames[t]
    start = nd // 2
    out = np.zeros(length)
    avail = min(length, y.shape[0] - start)
    out[:avail] = y[start:start + avail]
    return out


def sines_reconstruct(c, freqs, lengths, length, rho, k_min):
    """Sinusoidal branch: peaks at bins >= k_min, weight 1-rho(f_hat)."""
    c = np.asarray(c)
    tf, nb = c.shape
    mag = np.abs(c)
    gmax = mag.max()
    pad = np.pad(mag, ((0, 0), (1, 1)), constant_values=-1.0)
    is_peak = (mag > pad[:, :-2]) & (mag >= pad[:, 2:]) & (mag > 1e-4 * gmax)
    is_peak[:, :k_min] = False
    lm = np.log(np.maximum(mag, 1e-12))
    dphi = np.angle(c[1:] * np.conj(c[:-1]))
    dphi = np.concatenate([dphi, dphi[-1:]], axis=0) / (2 * np.pi)  # cycles/frame
    fr_rate = SR / HOP
    # candidate-harmonic scoring: m in round(f_k/fr - dphi) + {-4..4}
    m0 = np.round(freqs[None, :] / fr_rate - dphi)
    cand = m0[:, :, None] + np.arange(-4, 5)[None, None, :]  # [T, nb, 9]
    f_cand = (cand + dphi[:, :, None]) * fr_rate
    # predicted log-amp ratios vs neighbors
    def pred_lH(fc, k_idx):
        # fc: [T, nb, 9] candidate freqs evaluated against bin k_idx's kernel
        u = (fc - freqs[k_idx][None, :, None]) * lengths[k_idx][None, :, None] / SR
        return np.log(h_of(u))
    ks = np.arange(nb)
    k_lo = np.maximum(ks - 1, 0)
    k_up = np.minimum(ks + 1, nb - 1)
    r_pred_lo = pred_lH(f_cand, ks) - pred_lH(f_cand, k_lo)
    r_pred_up = pred_lH(f_cand, ks) - pred_lH(f_cand, k_up)
    r_obs_lo = (lm - lm[:, k_lo])[:, :, None]
    r_obs_up = (lm - lm[:, k_up])[:, :, None]
    has_lo = (ks > 0)[None, :, None]
    has_up = (ks < nb - 1)[None, :, None]
    score = (np.where(has_lo, (r_pred_lo - r_obs_lo) ** 2, 0.0)
             + np.where(has_up, (r_pred_up - r_obs_up) ** 2, 0.0))
    best = np.argmin(score, axis=2)
    f_hat = np.take_along_axis(f_cand, best[:, :, None], axis=2)[:, :, 0]
    f_hat = np.clip(f_hat, 1.0, SR / 2 - 1.0)
    u = (f_hat - freqs[None, :]) * lengths[None, :] / SR
    amp = mag / np.maximum(h_of(u), 0.1)
    wgt = 1.0 - rho(f_hat)
    phase0 = np.angle(c)
    w = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(2 * HOP) / (2 * HOP))
    y = np.zeros(length + 4 * HOP)
    n_rel = np.arange(2 * HOP) - HOP
    for t in range(tf):
        kk = np.nonzero(is_peak[t])[0]
        if len(kk) == 0:
            continue
        ph = 2 * np.pi * f_hat[t, kk, None] * n_rel[None, :] / SR + phase0[t, kk, None]
        burst = (wgt[t, kk, None] * amp[t, kk, None] * np.cos(ph) * w[None, :]).sum(0)
        start = t * HOP - HOP + 2 * HOP
        y[start:start + 2 * HOP] += burst
    return y[2 * HOP:2 * HOP + length]


def run():
    k_last, rho, nd, bank, freqs, lengths = design_hybrid()
    print(f"painless dual bins: 0..{k_last} (f<={freqs[k_last]:.1f}); "
          f"sin branch from bin {max(k_last - 1, 0)}")
    n = int(SR * 2)
    tvec = np.arange(n) / SR
    k_min = max(k_last - 1, 0)

    def recon(x):
        c = np.asarray(cqt_mod.cqt(jnp.asarray(x), SR, HOP, N_BINS, FMIN, BPO,
                                   output="complex", precision="highest"))[0]
        y = dual_reconstruct(c, k_last, nd, bank, n)
        y += sines_reconstruct(c, freqs, lengths, n, rho, k_min)
        return y

    def snr(x, y):
        edge = 4096
        xs, ys = x[edge:n - edge], y[edge:n - edge]
        return 10 * np.log10(np.mean(xs ** 2) / max(np.mean((ys - xs) ** 2), 1e-300))

    worst = (1e9, -1)
    for k in range(N_BINS):
        x = np.sin(2 * np.pi * freqs[k] * tvec + 0.7).astype(np.float32)
        s = snr(x, recon(x[None]))
        if s < worst[0]:
            worst = (s, k)
        flag = " <<<" if s < 30 else ""
        print(f"bin {k:2d} f={freqs[k]:8.1f} SNR {s:6.1f} dB{flag}", flush=True)
    print(f"WORST bin-center {worst[0]:.1f} dB at bin {worst[1]}")
    # mid-bin tones across the range (hardest: boundary + top)
    for k in (20, 41, 43, 46, 60, 70, 80, 82):
        for off in (0.25, 0.5):
            f = freqs[k] * 2 ** (off / 12)
            if f > SR / 2:
                continue
            x = np.sin(2 * np.pi * f * tvec + 0.3).astype(np.float32)
            s = snr(x, recon(x[None]))
            print(f"mid-bin k={k}+{off} f={f:7.1f} SNR {s:6.1f} dB")
    # two-tone (boundary + top octave together)
    x = (0.7 * np.sin(2 * np.pi * freqs[30] * tvec + 0.2)
         + 0.3 * np.sin(2 * np.pi * freqs[78] * tvec + 1.1)).astype(np.float32)
    s = snr(x, recon(x[None]))
    print(f"two-tone bins 30+78 SNR {s:6.1f} dB")


if __name__ == "__main__":
    run()
