"""Prototype: alias-constrained dual design for icqt past the painless hop.

Run CPU-only: PYTHONPATH=/root/repo python scripts/proto_icqt_alias.py
"""
import time

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from audioflow_tpu.ops import cqt as _  # noqa: E402  (functions via module)
import importlib  # noqa: E402

cqt_mod = importlib.import_module("audioflow_tpu.ops.cqt")

SR = 16000.0
HOP = 256
N_BINS = 84
BPO = 12
FMIN = cqt_mod.FMIN_C1


def alias_dual(sample_rate, hop, n_bins, fmin, bpo, window="hann",
               filter_scale=1.0, nd_mult=2, eps=1e-2, mask_db=40.0,
               dom_db=6.0):
    f0, _groups, onedot = cqt_mod._design(
        sample_rate, hop, n_bins, fmin, bpo, window, filter_scale)
    psi = (onedot[:, :n_bins].T.astype(np.float64)
           - 1j * onedot[:, n_bins:].T.astype(np.float64))
    nd = f0 * nd_mult
    psi_p = np.zeros((n_bins, nd), complex)
    off = nd // 2 - f0 // 2
    psi_p[:, off:off + f0] = psi
    ph = np.fft.fft(psi_p, axis=1)
    amp = np.abs(ph)
    side_mask = amp >= amp.max(axis=1, keepdims=True) * 10.0 ** (-mask_db / 20.0)
    # alias-dominance mask: keep w where |psi_hat(w)| beats every copy of
    # itself shifted by multiples of sr/hop (the hop-sampling image spacing)
    assert nd % hop == 0
    L = nd // hop  # grid bins per image spacing... wait: sr/hop in Hz = sr/hop; grid spacing sr/nd -> shift = nd/hop bins
    shift = nd // hop
    a = (amp * side_mask)
    # reshape trick: bin j = q*shift + r ; shifting by m*shift moves q
    q = nd // shift  # == hop
    ar = a.reshape(n_bins, q, shift)
    mx = ar.max(axis=1, keepdims=True)
    # second max per residue column (for positions that ARE the max)
    srt = np.sort(ar, axis=1)
    second = srt[:, -2:-1, :]
    others = np.where(ar >= mx, second, mx)  # max over m != 0 copies
    dom = ar >= np.maximum(others * 10.0 ** (dom_db / 20.0), 1e-300)
    dom_mask = dom.reshape(n_bins, nd)
    mask = side_mask & dom_mask
    w_pos = ((amp ** 2) * mask).sum(0)
    w_neg = np.empty_like(w_pos)
    w_neg[0] = w_pos[0]
    w_neg[1:] = w_pos[1:][::-1]
    w_tot = (w_pos + w_neg) / hop
    d_hat = ph * mask / np.maximum(w_tot, eps * w_tot.max())[None, :]
    d = np.fft.ifft(d_hat, axis=1)
    bank = np.concatenate([2.0 * d.real, -2.0 * d.imag], axis=0).astype(np.float32)
    return nd, bank


def icqt_with_bank(c, nd, bank, hop, length, center=True):
    from audioflow_tpu.ops.framing import overlap_add
    ri = jnp.concatenate([jnp.real(c), jnp.imag(c)], axis=-1)
    frames = ri @ jnp.asarray(bank)
    y = overlap_add(frames, hop)
    start = nd // 2
    need = start + length
    if y.shape[-1] < need:
        y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, need - y.shape[-1])])
    return y[..., start:need]


def tone_snr(freq, nd, bank, dur=2.0, edge=None):
    n = int(SR * dur)
    t = np.arange(n) / SR
    x = np.sin(2 * np.pi * freq * t).astype(np.float32)[None]
    c = cqt_mod.cqt(jnp.asarray(x), SR, HOP, N_BINS, FMIN, BPO,
                    output="complex", precision="highest")
    y = np.asarray(icqt_with_bank(c, nd, bank, HOP, n))
    if edge is None:
        edge = nd // 2  # exclude half the dual span at each end
    xs, ys = x[0, edge:n - edge], y[0, edge:n - edge]
    err = ys - xs
    return 10 * np.log10(np.mean(xs ** 2) / max(np.mean(err ** 2), 1e-300))


if __name__ == "__main__":
    t0 = time.time()
    freqs = cqt_mod.cqt_frequencies(N_BINS, FMIN, BPO)
    nd, bank = alias_dual(SR, HOP, N_BINS, FMIN, BPO)
    print(f"design {time.time()-t0:.1f}s nd={nd} bank={bank.shape}")
    snrs = []
    for k in range(0, N_BINS, 1):
        s = tone_snr(freqs[k], nd, bank)
        snrs.append(s)
        print(f"bin {k:2d} f={freqs[k]:8.1f} Hz SNR {s:6.1f} dB", flush=True)
    print(f"worst {min(snrs):.1f} dB median {np.median(snrs):.1f} dB "
          f"({time.time()-t0:.1f}s)")
