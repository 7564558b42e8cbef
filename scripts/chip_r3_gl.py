"""Chip batch r3/6: fused Griffin-Lim kernel (VERDICT r2 item 3).

Measures at the BENCHMARKS.md row config (batch 64 x 10 s @16k, n_fft 1024
hop 256, n_iter=8): XLA matmul path vs the fused pallas iteration kernel,
plus spectral-convergence agreement and the griffinlim_tone_err gate value
through the auto dispatch. Writes /tmp/chip_r3_gl.jsonl. Single process.
"""
import json
import time

import numpy as np

OUT = open("/tmp/chip_r3_gl.jsonl", "a", buffering=1)


def emit(**kw):
    kw["t"] = round(time.time(), 1)
    OUT.write(json.dumps(kw) + "\n")
    print(kw, flush=True)


import jax
import jax.numpy as jnp

emit(stage="backend", backend=jax.default_backend())

from audioflow_tpu import ops
from audioflow_tpu.obs.metrics import measure_throughput
from audioflow_tpu.ops.pallas.griffinlim import griffin_lim_pallas

rng = np.random.default_rng(0)
B, SECS, SR = 64, 10.0, 16000
audio_s = B * SECS

t = np.arange(int(SR * SECS)) / SR
x = (0.4 * np.sin(2 * np.pi * 220.0 * t) + 0.2 * np.sin(2 * np.pi * 660.0 * t)
     + 0.02 * rng.standard_normal(t.shape)).astype(np.float32)
xb = jnp.asarray(np.broadcast_to(x, (B, x.shape[0])).copy())

mag = jax.jit(lambda z: jnp.abs(ops.stft(z, 1024, 256, impl="matmul")))(xb)
mag = jax.block_until_ready(mag)
F = mag.shape[-2]
emit(stage="mag", frames=int(F))


def gl_xla(m):
    return ops.griffin_lim(m, 1024, 256, n_iter=8, impl="matmul",
                           precision="default")


def gl_fused(m):
    return griffin_lim_pallas(m, 1024, 256, n_iter=8)


# quality agreement first (small slice, on chip)
ms = mag[:4]
sc = {}
for name, fn in (("xla", gl_xla), ("fused", gl_fused)):
    y = jax.jit(fn)(ms)
    m2 = jax.jit(lambda z: jnp.abs(ops.stft(z, 1024, 256, impl="matmul")))(y)
    m2 = m2[..., :F, :]
    sc[name] = float(jnp.linalg.norm(m2 - ms) / jnp.linalg.norm(ms))
emit(stage="specconv", **{k: round(v, 5) for k, v in sc.items()})

for name, fn in (("gl_xla", gl_xla), ("gl_fused", gl_fused)):
    m = measure_throughput(fn, mag, audio_s, iters=10)
    emit(stage=name, ms_per_iter=round(m.wall_seconds * 100, 2),
         x_realtime=round(m.realtime_factor, 1),
         compile_s=round(m.compile_seconds, 1))

# validate-gate value through the auto dispatch (pallas on TPU)
tt = np.arange(SR) / SR
tone = jnp.asarray((0.5 * np.sin(2 * np.pi * 440.0 * tt)).astype(np.float32))
mag_g = jax.jit(lambda z: ops.magnitude(ops.stft(z, 1024, 256)))(tone)
yg = jax.jit(lambda m: ops.griffin_lim(m, 1024, 256, n_iter=16))(mag_g)
rec = jax.jit(lambda z: ops.magnitude(ops.stft(z, 1024, 256)))(yg)
fg = min(rec.shape[0], mag_g.shape[0])
err = float(jnp.linalg.norm(rec[:fg] - mag_g[:fg]) / jnp.linalg.norm(mag_g))
emit(stage="gate_tone_err", value=round(err, 5))
emit(stage="done")
