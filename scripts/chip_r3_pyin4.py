"""Chip batch r3/5: integrated pyin after the count-only pass-1 scan
(n_q via [.., F, M] carry instead of the [.., F, L, M] broadcast-reduce).

Measures full ops.pyin at the BENCHMARKS.md defaults row and checks the
validate-gate agreement (pyin_220_rel style: pure 220 Hz tone, f0 rel err).
Writes /tmp/chip_r3_pyin4.jsonl. Single process.
"""
import json
import time

import numpy as np

OUT = open("/tmp/chip_r3_pyin4.jsonl", "a", buffering=1)


def emit(**kw):
    kw["t"] = round(time.time(), 1)
    OUT.write(json.dumps(kw) + "\n")
    print(kw, flush=True)


import jax
import jax.numpy as jnp

emit(stage="backend", backend=jax.default_backend())

from audioflow_tpu import ops
from audioflow_tpu.obs.metrics import measure_throughput

rng = np.random.default_rng(0)
B, SECS, SR = 64, 10.0, 16000
FMIN, FMAX, FRAME, HOP = 65.0, 2093.0, 2048, 256
audio_s = B * SECS

t = np.arange(int(SR * SECS)) / SR
x = (0.4 * np.sin(2 * np.pi * (110 + 80 * np.sin(2 * np.pi * 0.3 * t)) * t)
     + 0.02 * rng.standard_normal(t.shape)).astype(np.float32)
x = jnp.asarray(np.broadcast_to(x, (B, x.shape[0])).copy())

# validate-style gate first: pure 220 Hz tone, median f0 rel error
tt = np.arange(SR) / SR
tone = jnp.asarray(0.5 * np.sin(2 * np.pi * 220.0 * tt), jnp.float32)[None]
f0, vflag, vprob = jax.jit(
    lambda z: ops.pyin(z, SR, FMIN, FMAX, FRAME, HOP)
)(tone)
f0 = np.asarray(f0)[0]
vf = np.asarray(vflag)[0]
med = float(np.median(f0[vf])) if vf.any() else float("nan")
emit(stage="gate_220", median_f0=round(med, 3),
     rel_err=round(abs(med - 220.0) / 220.0, 8),
     voiced_frac=round(float(vf.mean()), 3))


def full(z):
    return ops.pyin(z, SR, FMIN, FMAX, FRAME, HOP)[0]


m = measure_throughput(full, x, audio_s, iters=10)
emit(stage="full_pyin", ms_per_iter=round(m.wall_seconds * 100, 2),
     x_realtime=round(m.realtime_factor, 1),
     compile_s=round(m.compile_seconds, 1))
emit(stage="done")
