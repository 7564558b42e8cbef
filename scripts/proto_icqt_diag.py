"""Diagnose hybrid icqt problem bins: branch-wise SNR + f_hat errors.

Run: PYTHONPATH=/root/repo python scripts/proto_icqt_diag.py
"""
import importlib

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

proto = importlib.import_module("scripts.proto_icqt_hybrid") if False else None
import sys
sys.path.insert(0, "/root/repo/scripts")
import proto_icqt_hybrid as H  # noqa: E402

cqt_mod = importlib.import_module("audioflow_tpu.ops.cqt")

SR, HOP, N_BINS, BPO, FMIN = H.SR, H.HOP, H.N_BINS, H.BPO, H.FMIN


def main():
    k_last, rho, nd, bank, freqs, lengths = H.design_hybrid()
    n = int(SR * 4)  # longer signal for low-bin edge study
    tvec = np.arange(n) / SR
    k_min = max(k_last - 1, 0)

    def parts(x):
        c = np.asarray(cqt_mod.cqt(jnp.asarray(x), SR, HOP, N_BINS, FMIN, BPO,
                                   output="complex", precision="highest"))[0]
        yd = H.dual_reconstruct(c, k_last, nd, bank, n)
        ys = H.sines_reconstruct(c, freqs, lengths, n, rho, k_min)
        return c, yd, ys

    def snr(x, y, edge):
        xs, ys = x[edge:n - edge], y[edge:n - edge]
        return 10 * np.log10(np.mean(xs ** 2) / max(np.mean((ys - xs) ** 2), 1e-300))

    for k in (0, 1, 43, 45, 48, 49):
        f = freqs[k]
        x = np.sin(2 * np.pi * f * tvec + 0.7).astype(np.float32)
        c, yd, ys = parts(x[None])
        y = yd + ys
        for edge in (4096, 12000):
            print(f"bin {k} f={f:.1f}: edge={edge} total {snr(x, y, edge):6.1f} dB  "
                  f"dual-only {snr(x, yd, edge):6.1f}  sin-only {snr(x, ys, edge):6.1f}  "
                  f"dualRMS {np.sqrt(np.mean(yd[edge:n-edge]**2)):.4f} "
                  f"sinRMS {np.sqrt(np.mean(ys[edge:n-edge]**2)):.4f}")
        # f_hat error stats at the peak bin (interior frames)
        mag = np.abs(c)
        tsl = slice(40, c.shape[0] - 40)
        pk = mag[tsl].argmax(axis=1)
        # recompute f_hat exactly as sines_reconstruct does
        lm = np.log(np.maximum(mag, 1e-12))
        dphi = np.angle(c[1:] * np.conj(c[:-1]))
        dphi = np.concatenate([dphi, dphi[-1:]], axis=0) / (2 * np.pi)
        fr = SR / HOP
        m0 = np.round(freqs[None, :] / fr - dphi)
        cand = m0[:, :, None] + np.arange(-4, 5)[None, None, :]
        f_cand = (cand + dphi[:, :, None]) * fr
        ks = np.arange(N_BINS)
        k_lo, k_up = np.maximum(ks - 1, 0), np.minimum(ks + 1, N_BINS - 1)
        def lH(fc, idx):
            u = (fc - freqs[idx][None, :, None]) * lengths[idx][None, :, None] / SR
            return np.log(H.h_of(u))
        r_pred_lo = lH(f_cand, ks) - lH(f_cand, k_lo)
        r_pred_up = lH(f_cand, ks) - lH(f_cand, k_up)
        r_obs_lo = (lm - lm[:, k_lo])[:, :, None]
        r_obs_up = (lm - lm[:, k_up])[:, :, None]
        has_lo = (ks > 0)[None, :, None]
        has_up = (ks < N_BINS - 1)[None, :, None]
        score = (np.where(has_lo, (r_pred_lo - r_obs_lo) ** 2, 0.0)
                 + np.where(has_up, (r_pred_up - r_obs_up) ** 2, 0.0))
        best = np.argmin(score, axis=2)
        f_hat = np.take_along_axis(f_cand, best[:, :, None], axis=2)[:, :, 0]
        rows = np.arange(c.shape[0])[tsl]
        fh = f_hat[rows, pk]
        off = best[rows, pk] - 4
        print(f"   peak-bin f_hat: mean {fh.mean():8.2f} (true {f:.1f}) "
              f"std {fh.std():6.3f}  cand-offset uniq {np.unique(off)} "
              f"rho(f)={rho(np.array([f]))[0]:.3f}")


if __name__ == "__main__":
    main()
