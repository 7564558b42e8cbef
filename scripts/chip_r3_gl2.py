"""Chip batch r3/7: fused GL with bf16 state planes + roofline calibration.

Writes /tmp/chip_r3_gl2.jsonl. Single process.
"""
import json
import time

import numpy as np

OUT = open("/tmp/chip_r3_gl2.jsonl", "a", buffering=1)


def emit(**kw):
    kw["t"] = round(time.time(), 1)
    OUT.write(json.dumps(kw) + "\n")
    print(kw, flush=True)


import jax
import jax.numpy as jnp

emit(stage="backend", backend=jax.default_backend())

from audioflow_tpu import ops
from audioflow_tpu.bench import run_benchmark
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


def gl_fused(m):
    return griffin_lim_pallas(m, 1024, 256, n_iter=8)


ms = mag[:4]
y = jax.jit(gl_fused)(ms)
m2 = jax.jit(lambda z: jnp.abs(ops.stft(z, 1024, 256, impl="matmul")))(y)[..., :F, :]
emit(stage="specconv_bf16state",
     value=round(float(jnp.linalg.norm(m2 - ms) / jnp.linalg.norm(ms)), 5))

m = measure_throughput(gl_fused, mag, audio_s, iters=10)
emit(stage="gl_fused_bf16state", ms_per_iter=round(m.wall_seconds * 100, 2),
     x_realtime=round(m.realtime_factor, 1), compile_s=round(m.compile_seconds, 1))

# gate value through auto dispatch
tt = np.arange(SR) / SR
tone = jnp.asarray((0.5 * np.sin(2 * np.pi * 440.0 * tt)).astype(np.float32))
mag_g = jax.jit(lambda z: ops.magnitude(ops.stft(z, 1024, 256)))(tone)
yg = jax.jit(lambda mm: ops.griffin_lim(mm, 1024, 256, n_iter=16))(mag_g)
rec = jax.jit(lambda z: ops.magnitude(ops.stft(z, 1024, 256)))(yg)
fg = min(rec.shape[0], mag_g.shape[0])
emit(stage="gate_tone_err", value=round(
    float(jnp.linalg.norm(rec[:fg] - mag_g[:fg]) / jnp.linalg.norm(mag_g)), 5))

emit(stage="roofline", **{k: v for k, v in run_benchmark("roofline").items()
                          if k != "benchmark"})
emit(stage="done")
