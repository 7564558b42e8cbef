"""Full 84-bin hybrid icqt sweep + throughput on the real TPU.

Measures, at the framework defaults (hop 256 / 84 bins / C1 / 16 kHz):
  * tone round-trip SNR at every bin center (worst is the BENCHMARKS figure)
  * forward+inverse and inverse-only throughput (x realtime) at batch 16x4 s

Run WITH the axon sitecustomize (real TPU): python scripts/chip_r4_icqt_sweep.py
"""
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from audioflow_tpu import ops  # noqa: E402
from audioflow_tpu.obs.metrics import measure_throughput  # noqa: E402

SR, HOP, NB = 16000, 256, 84
T_LEN = 64000  # 4 s; LS dual support nd/2 = 16896 per edge
EDGE = 17000


def main():
    print("backend:", jax.default_backend(), flush=True)
    freqs = ops.cqt_frequencies(NB)
    n = np.arange(T_LEN)

    def fwd(x):
        return ops.cqt(x, SR, HOP, NB, output="complex")

    def rt(x):
        c = fwd(x)
        y = ops.icqt(c, SR, HOP, NB, length=T_LEN)
        return y

    rt_j = jax.jit(rt)
    # --- SNR sweep, batched 12 bins at a time (84 = 7 x 12)
    snrs = np.zeros(NB)
    for g in range(0, NB, 12):
        ks = list(range(g, min(g + 12, NB)))
        xb = np.stack(
            [np.sin(2 * np.pi * freqs[k] * n / SR + 0.7) for k in ks]
        ).astype(np.float32)
        yb = np.asarray(rt_j(jnp.asarray(xb)))
        e = yb[:, EDGE:-EDGE] - xb[:, EDGE:-EDGE]
        s = 10 * np.log10(
            (xb[:, EDGE:-EDGE] ** 2).sum(1) / np.maximum((e ** 2).sum(1), 1e-30)
        )
        snrs[ks] = s
        for k, v in zip(ks, s):
            print(f"bin {k:2d} f={freqs[k]:8.1f} SNR {v:6.1f} dB", flush=True)
    worst = int(np.argmin(snrs))
    print(f"WORST {snrs[worst]:.1f} dB at bin {worst}; "
          f"median {np.median(snrs):.1f} dB")

    # --- throughput (batch 16 x 4 s = 64 s of audio per call)
    rng = np.random.default_rng(0)
    xb = (0.1 * rng.standard_normal((16, T_LEN))).astype(np.float32)
    audio_s = 16 * T_LEN / SR

    def rt_sum(x):
        return rt(x).sum()

    def inv_sum(c_ri):
        c = jax.lax.complex(c_ri[0], c_ri[1])
        return ops.icqt(c, SR, HOP, NB, length=T_LEN).sum()

    # complex stays on device end to end (complex64 cannot cross the
    # host<->device boundary on this runtime); re/im split inside jit
    c_ri = jax.jit(
        lambda x: (lambda c: jnp.stack([jnp.real(c), jnp.imag(c)]))(fwd(x))
    )(jnp.asarray(xb))
    for name, f, arg in (("cqt+icqt", rt_sum, jnp.asarray(xb)),
                         ("icqt-only", inv_sum, c_ri)):
        m = measure_throughput(f, arg, audio_seconds=audio_s, iters=10)
        sec = m.wall_seconds / max(m.batches, 1)
        print(f"{name}: {sec*1e3:.2f} ms/call -> {audio_s/sec:,.0f}x realtime",
              flush=True)
    out = {
        "worst_snr_db": float(snrs.min()),
        "worst_bin": worst,
        "median_snr_db": float(np.median(snrs)),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
