"""Chip r4 follow-up: pyin after the REVISED levers (scan unroll=8 on the
three lag-axis scans + multiplicative rank-weight carry; the delta-emitting
Viterbi was rejected — window gathers, see /tmp/chip_r4_sweep.jsonl).

Measures the gate + the two BENCHMARKS configs + pyin_online, writes
/tmp/chip_r4_pyin.jsonl. Run with PYTHONPATH=/root/.axon_site:/root/repo.
"""
import json
import time

OUT = open("/tmp/chip_r4_pyin.jsonl", "a", buffering=1)


def emit(**kw):
    kw["t"] = round(time.time(), 1)
    OUT.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


import numpy as np

import jax
import jax.numpy as jnp

emit(stage="backend", backend=jax.default_backend())

from audioflow_tpu import ops
from audioflow_tpu.obs.metrics import measure_throughput

rng = np.random.default_rng(0)
B, SECS, SR = 64, 10.0, 16000
FMIN, FMAX, FRAME, HOP = 65.0, 2093.0, 2048, 256

tt = np.arange(SR) / SR
tone = jnp.asarray(0.5 * np.sin(2 * np.pi * 220.0 * tt), jnp.float32)[None]
f0, vflag, vprob = jax.jit(lambda z: ops.pyin(z, SR, FMIN, FMAX, FRAME, HOP))(tone)
vf = np.asarray(vflag)[0]
med = float(np.median(np.asarray(f0)[0][vf])) if vf.any() else float("nan")
emit(stage="pyin_gate_220", median_f0=round(med, 3),
     rel_err=round(abs(med - 220.0) / 220.0, 8),
     voiced_frac=round(float(vf.mean()), 3))

t = np.arange(int(SR * SECS)) / SR
x = (0.4 * np.sin(2 * np.pi * (110 + 80 * np.sin(2 * np.pi * 0.3 * t)) * t)
     + 0.02 * rng.standard_normal(t.shape)).astype(np.float32)
x = jnp.asarray(np.broadcast_to(x, (B, x.shape[0])).copy())

m = measure_throughput(lambda z: ops.pyin(z, SR, FMIN, FMAX, FRAME, HOP)[0],
                       x, B * SECS, iters=10)
emit(stage="pyin_full", ms_per_iter=round(m.wall_seconds * 100, 2),
     x_realtime=round(m.realtime_factor, 1),
     compile_s=round(m.compile_seconds, 1))

m2 = measure_throughput(
    lambda z: ops.pyin(z, SR, FMIN, FMAX, FRAME, HOP,
                       n_thresholds=32, resolution=0.5)[0],
    x, B * SECS, iters=10)
emit(stage="pyin_coarse", ms_per_iter=round(m2.wall_seconds * 100, 2),
     x_realtime=round(m2.realtime_factor, 1))

# the fixed-lag streaming tracker, same signal (one chunk = worst case for
# the per-frame ring shifts; streaming sessions amortize identically)
m3 = measure_throughput(
    lambda z: ops.pyin_online(z, SR, FMIN, FMAX, FRAME, HOP, 25)[0],
    x, B * SECS, iters=3)
emit(stage="pyin_online", ms_per_iter=round(m3.wall_seconds * 1000 / 3, 2),
     x_realtime=round(m3.realtime_factor, 1),
     compile_s=round(m3.compile_seconds, 1))

emit(stage="done")
