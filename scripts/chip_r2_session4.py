"""Batched chip run: refactored Pallas ts variants + resample compact_tail + validate.

Writes incremental JSON lines to /tmp/chip_r2s4.jsonl (flush per result).
"""
import json
import sys
import time

import numpy as np

OUT = open("/tmp/chip_r2s4.jsonl", "a", buffering=1)


def emit(**kw):
    kw["t"] = round(time.time(), 1)
    OUT.write(json.dumps(kw) + "\n")
    print(kw, flush=True)


import jax
import jax.numpy as jnp

emit(stage="backend", backend=jax.default_backend())

from audioflow_tpu.obs.metrics import measure_throughput
from audioflow_tpu.ops.pallas.timestretch import time_stretch_pallas as ts

rng = np.random.default_rng(0)
B, SR, SECS = 256, 16000, 10.0
x = rng.standard_normal((B, int(SR * SECS))).astype(np.float32)
xj = jnp.asarray(x)
audio_s = B * SECS

# fidelity oracle: on-chip highest/highest (one shot)
t0 = time.time()
ref = np.asarray(ts(xj, 1.25, precision="highest"))
emit(stage="ts_oracle_compile", secs=round(time.time() - t0, 1))

variants = [("high", "high"), ("high", "default"), ("default", "default")]
for p, ip in variants:
    t0 = time.time()
    fn = lambda z: ts(z, 1.25, precision=p, inv_precision=ip)
    got = np.asarray(fn(xj))
    compile_s = time.time() - t0
    rel = float(np.abs(ref - got).max() / np.abs(ref).max())
    m = measure_throughput(fn, xj, audio_s, iters=10)
    emit(stage="ts", p=p, ip=ip, ms=round(1000 * m.wall_seconds / m.batches, 2),
         x_rt=round(m.realtime_factor), rel_vs_highest=rel,
         compile_s=round(compile_s, 1))

# resample compact_tail experiment: config-2 rate pair, batch 256 x 10 s
from audioflow_tpu.ops.resample import make_plan, resample_apply

plan = make_plan(44100, 16000)
xr = rng.standard_normal((B, int(44100 * SECS))).astype(np.float32)
xrj = jnp.asarray(xr)
base = None
for ct in (False, True):
    fn = lambda z: resample_apply(z, plan, compact_tail=ct)
    t0 = time.time()
    got = np.asarray(fn(xrj))
    compile_s = time.time() - t0
    if base is None:
        base = got
        diff = 0.0
    else:
        diff = float(np.abs(base - got).max())
    m = measure_throughput(fn, xrj, audio_s, iters=10)
    emit(stage="resample", compact_tail=ct,
         ms=round(1000 * m.wall_seconds / m.batches, 2),
         x_rt=round(m.realtime_factor), max_diff=diff,
         compile_s=round(compile_s, 1))

# full validation gate on chip (real Mosaic compile gate)
from audioflow_tpu.validate import run_validation

t0 = time.time()
rep = run_validation()
emit(stage="validate", secs=round(time.time() - t0, 1), **rep)
emit(stage="done")
