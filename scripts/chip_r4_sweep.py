"""Chip batch r4: the dated round-4 headline sweep + the pyin levers.

One process, one consistent code state (VERDICT r3 items 2+3):
  1. pyin gate (pure 220 Hz tone rel err) + full-tracker timing at the
     librosa-defaults benchmark config, after the scan-unroll + delta-
     emitting-Viterbi restructure (was 87.1 ms / 7,351x).
  2. icqt throughput at the framework defaults (BENCHMARKS row).
  3. roofline calibration + every BENCHMARKS.md headline config at
     iters=10 with XLA cost columns + session p50/p99 latency.
  4. the full `audioflow validate` oracle gate on the TPU.

Writes JSON lines to /tmp/chip_r4_sweep.jsonl.
Run WITH the axon sitecustomize: PYTHONPATH=/root/.axon_site:/root/repo.
"""
import json
import time

OUT = open("/tmp/chip_r4_sweep.jsonl", "a", buffering=1)


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

# --- 1. pyin: gate + timing at the librosa-defaults benchmark config ---
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

# coarse config from the BENCHMARKS secondary row
m2 = measure_throughput(
    lambda z: ops.pyin(z, SR, FMIN, FMAX, FRAME, HOP,
                       n_thresholds=32, resolution=0.5)[0],
    x, B * SECS, iters=10)
emit(stage="pyin_coarse", ms_per_iter=round(m2.wall_seconds * 100, 2),
     x_realtime=round(m2.realtime_factor, 1))

# --- 2. icqt throughput at the framework defaults ---
T_LEN = 64000
n = np.arange(T_LEN)
sig = jnp.asarray(np.broadcast_to(
    (0.3 * np.sin(2 * np.pi * 220.0 * n / 16000)
     + 0.2 * np.sin(2 * np.pi * 523.25 * n / 16000)).astype(np.float32),
    (16, T_LEN)).copy())
coef = jax.jit(lambda z: ops.cqt(z, 16000, 256, 84, output="complex"))(sig)
coef = jax.block_until_ready(coef)
mi = measure_throughput(
    lambda c: ops.icqt(c, 16000, 256, 84, length=T_LEN),
    coef, 16 * T_LEN / 16000, iters=10)
emit(stage="icqt_inverse_only", ms_per_iter=round(mi.wall_seconds * 100, 2),
     x_realtime=round(mi.realtime_factor, 1))
mrt = measure_throughput(
    lambda z: ops.icqt(ops.cqt(z, 16000, 256, 84, output="complex"),
                       16000, 256, 84, length=T_LEN),
    sig, 16 * T_LEN / 16000, iters=10)
emit(stage="icqt_roundtrip", ms_per_iter=round(mrt.wall_seconds * 100, 2),
     x_realtime=round(mrt.realtime_factor, 1))

# --- 3. the headline sweep with roofline/cost/latency columns ---
from audioflow_tpu.bench import run_benchmark

ROWS = [
    ("roofline", {}),
    ("stft", {"batch": 64}),
    ("stft", {"batch": 512}),
    ("logmel", {"batch": 256}),
    ("master", {"batch": 64}),
    ("master", {"batch": 512}),
    ("pvoc", {"batch": 256}),
    ("pitch", {"batch": 64}),
    ("streaming", {"batch": 256}),
    ("streaming", {"batch": 1024}),
    ("logmel_stream", {"batch": 512}),
    ("session", {}),
    ("session_drain", {}),
]
for name, kw in ROWS:
    t0 = time.time()
    try:
        out = run_benchmark(name, **kw)
        out["sweep_wall_s"] = round(time.time() - t0, 1)
        emit(**out)
    except Exception as e:
        emit(stage=name, error=repr(e), **kw)

# --- 4. the full oracle validate gate on the TPU ---
try:
    from audioflow_tpu.validate import run_validation

    rep = run_validation()
    emit(stage="validate", ok=bool(rep["pass"]),
         **{k: (round(v, 8) if isinstance(v, float) else v)
            for k, v in rep.items() if k != "pass"
            and isinstance(v, (int, float, bool, str))})
except Exception as e:
    emit(stage="validate", error=repr(e))

emit(stage="done")
