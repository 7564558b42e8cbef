"""Round-5 pyin measurement after the gather-avoidance + split-histogram
levers (masked-reduce backtrace / online walk, matmul bin histogram for the
|d|<=2 lag tail). Gates + timings at the BENCHMARKS configs.

Appends to bench_records/chip_r5_pyin.jsonl.
Run WITH the axon sitecustomize: PYTHONPATH=/root/repo:/root/.axon_site.
"""

import json
import time

OUT = open("/root/repo/bench_records/chip_r5_pyin.jsonl", "a", buffering=1)


def emit(**kw):
    kw["t"] = round(time.time(), 1)
    OUT.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


import numpy as np

import jax
import jax.numpy as jnp

emit(stage="backend", backend=jax.default_backend(), run="r5_levers")

from audioflow_tpu import ops
from audioflow_tpu.obs.metrics import measure_throughput

rng = np.random.default_rng(0)
B, SECS, SR = 64, 10.0, 16000
FMIN, FMAX, FRAME, HOP = 65.0, 2093.0, 2048, 256

# gate: 220 Hz tone decode
tt = np.arange(SR) / SR
tone = jnp.asarray(0.5 * np.sin(2 * np.pi * 220.0 * tt), jnp.float32)[None]
f0, vflag, vprob = jax.jit(lambda z: ops.pyin(z, SR, FMIN, FMAX, FRAME, HOP))(tone)
vf = np.asarray(vflag)[0]
med = float(np.median(np.asarray(f0)[0][vf])) if vf.any() else float("nan")
emit(stage="pyin_gate_220_r5", median_f0=round(med, 3),
     rel_err=round(abs(med - 220.0) / 220.0, 8), voiced_frac=round(float(vf.mean()), 3))

t = np.arange(int(SR * SECS)) / SR
x = (0.4 * np.sin(2 * np.pi * (110 + 80 * np.sin(2 * np.pi * 0.3 * t)) * t)
     + 0.02 * rng.standard_normal(t.shape)).astype(np.float32)
x = jnp.asarray(np.broadcast_to(x, (B, x.shape[0])).copy())
audio = B * SECS

m = measure_throughput(lambda z: ops.pyin(z, SR, FMIN, FMAX, FRAME, HOP)[0],
                       x, audio, iters=10)
emit(stage="pyin_full_r5", ms_per_iter=round(m.wall_seconds * 100, 2),
     x_realtime=round(m.realtime_factor, 1), compile_s=round(m.compile_seconds, 1))

m2 = measure_throughput(
    lambda z: ops.pyin(z, SR, FMIN, FMAX, FRAME, HOP, n_thresholds=32, resolution=0.5)[0],
    x, audio, iters=10)
emit(stage="pyin_coarse_r5", ms_per_iter=round(m2.wall_seconds * 100, 2),
     x_realtime=round(m2.realtime_factor, 1))

# pyin_online at defaults (lag 25): inherits the masked-reduce walk
m3 = measure_throughput(
    lambda z: ops.pyin_online(z, SR, FMIN, FMAX, FRAME, HOP, 25)[0], x, audio,
    iters=10)
emit(stage="pyin_online_r5", ms_per_iter=round(m3.wall_seconds * 100, 2),
     x_realtime=round(m3.realtime_factor, 1))

# decode unchanged by the restructures: chip equality old-vs-new is covered
# by the CPU oracle suite; here assert the histogram-split path agrees with
# a forced no-split run (l_star == L via a monkeypatched window)
from audioflow_tpu.ops import pitch as P

a = jax.jit(lambda z: ops.pyin(z, SR, FMIN, FMAX, FRAME, HOP))(x[:2])
orig_fn = P._pyin_bin_split


def _all_scan(sr, fm, nb, nbps_, lg, dmax):
    _ls, base, _s0 = orig_fn(sr, fm, nb, nbps_, lg, dmax)
    return lg, base, np.zeros((0, nb + 2 * dmax), np.float32)


P._pyin_bin_split = _all_scan
b = jax.jit(lambda z: ops.pyin(z, SR, FMIN, FMAX, FRAME, HOP))(x[:2])
P._pyin_bin_split = orig_fn
diff = [float(np.abs(np.asarray(u).astype(np.float64) - np.asarray(v).astype(np.float64)).max())
        for u, v in zip(a, b)]
emit(stage="pyin_split_consistency", max_abs=diff)
