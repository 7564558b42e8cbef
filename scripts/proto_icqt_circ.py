"""Circular identity test for the per-coset LS dual design.

Analysis and synthesis both on the nd circle — isolates the LS math from
framing/edge effects. Run: PYTHONPATH=/root/repo python scripts/proto_icqt_circ.py
"""
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo/scripts")
import proto_icqt_v3 as V  # noqa: E402
import importlib  # noqa: E402

cqt_mod = importlib.import_module("audioflow_tpu.ops.cqt")

SR, HOP, N_BINS, BPO, FMIN = V.SR, V.HOP, V.N_BINS, V.BPO, V.FMIN


def main():
    freqs = cqt_mod.cqt_frequencies(N_BINS, FMIN, BPO)
    k_dual = 46
    nd, bank, rho = V.design_ls_dual(k_dual, 40, 43)
    f0, _groups, onedot = cqt_mod._design(SR, HOP, N_BINS, FMIN, BPO, "hann", 1.0)
    psi = (onedot[:, :k_dual].T.astype(np.float64)
           - 1j * onedot[:, N_BINS:N_BINS + k_dual].T.astype(np.float64))
    psi_p = np.zeros((k_dual, nd), complex)
    off = nd // 2 - f0 // 2
    psi_p[:, off:off + f0] = psi
    T = nd // HOP

    def circ_analyze(x):
        # c_k(t) = sum_n x(n) conj(psi_k)(n - t*hop) circularly
        c = np.empty((T, k_dual), complex)
        for t in range(T):
            c[t] = np.roll(np.conj(psi_p), t * HOP, axis=1) @ x
        return c

    def circ_synth(c):
        # y(n) = sum_t sum_k 2 Re{c_k(t) d_k(n - t*hop)} via the bank
        ri = np.concatenate([c.real, c.imag], axis=1)  # [T, 2K]
        fr = ri @ bank  # [T, nd]
        y = np.zeros(nd)
        for t in range(T):
            y += np.roll(fr[t], t * HOP)
        return y

    # on-grid tones at several bin centers (snapped to nearest grid index)
    for k in (0, 5, 20, 35, 40, 42, 44):
        gi = int(round(freqs[k] * nd / SR))
        n = np.arange(nd)
        x = np.cos(2 * np.pi * gi * n / nd + 0.7)
        y = circ_synth(circ_analyze(x))
        g = (y @ x) / (x @ x)
        resid = y - g * x
        snr = 10 * np.log10((x @ x) / max(resid @ resid, 1e-300))
        err = 10 * np.log10((x @ x) / max(((y - x) @ (y - x)), 1e-300))
        print(f"bin {k:2d} grid-f={gi * SR / nd:8.2f}: gain {g:7.4f} "
              f"shape-SNR {snr:6.1f} dB  abs-SNR {err:6.1f} dB")
    # broadband within the dual band: sum of on-grid tones bins 3..40
    rng = np.random.default_rng(0)
    x = np.zeros(nd)
    n = np.arange(nd)
    for k in range(3, 41):
        gi = int(round(freqs[k] * nd / SR))
        x += rng.normal() * np.cos(2 * np.pi * gi * n / nd + rng.uniform(0, 6))
    y = circ_synth(circ_analyze(x))
    err = 10 * np.log10((x @ x) / max(((y - x) @ (y - x)), 1e-300))
    print(f"multi-tone bins 3..40 abs-SNR {err:6.1f} dB")


if __name__ == "__main__":
    main()
