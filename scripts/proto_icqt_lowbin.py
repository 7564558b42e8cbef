"""Sweep nd_mult x lambda for the bottom-bin linear (off-grid) behavior.

Run: PYTHONPATH=/root/repo python scripts/proto_icqt_lowbin.py
"""
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo/scripts")
import proto_icqt_v3 as V  # noqa: E402
import importlib  # noqa: E402

cqt_mod = importlib.import_module("audioflow_tpu.ops.cqt")

SR, HOP, N_BINS, BPO, FMIN = V.SR, V.HOP, V.N_BINS, V.BPO, V.FMIN


def main():
    freqs = cqt_mod.cqt_frequencies(N_BINS, FMIN, BPO)
    n = int(SR * 4)
    tvec = np.arange(n) / SR
    cs = {}
    for k in (0, 1, 2, 3, 20):
        x = np.sin(2 * np.pi * freqs[k] * tvec + 0.7).astype(np.float32)
        cs[k] = (x, np.asarray(cqt_mod.cqt(
            jnp.asarray(x[None]), SR, HOP, N_BINS, FMIN, BPO,
            output="complex", precision="highest"))[0])

    for nd_mult in (2, 4):
        for lam in (1e-3, 1e-2, 1e-1):
            nd, bank, rho = V.design_ls_dual(46, 40, 43, nd_mult=nd_mult,
                                             lam_rel=lam)
            dnorm = np.abs(bank[:4]).max()
            line = [f"nd_mult={nd_mult} lam={lam:g} |d0..1|max={dnorm:.3f}:"]
            for k in (0, 1, 2, 3, 20):
                x, c = cs[k]
                y = V.dual_reconstruct(c, 46, nd, bank, n)
                edge = 16000
                xs, ys = x[edge:n - edge], y[edge:n - edge]
                s = 10 * np.log10(np.mean(xs ** 2)
                                  / max(np.mean((ys - xs) ** 2), 1e-300))
                line.append(f"b{k}={s:5.1f}")
            print("  ".join(line), flush=True)


if __name__ == "__main__":
    main()
