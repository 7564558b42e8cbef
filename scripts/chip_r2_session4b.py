"""Second chip batch: Pallas melspec (bf16x3) vs XLA log-mel pipeline at 'high'.

Writes incremental JSON lines to /tmp/chip_r2s4b.jsonl.
"""
import json
import time

import numpy as np

OUT = open("/tmp/chip_r2s4b.jsonl", "a", buffering=1)


def emit(**kw):
    kw["t"] = round(time.time(), 1)
    OUT.write(json.dumps(kw) + "\n")
    print(kw, flush=True)


import jax
import jax.numpy as jnp

emit(stage="backend", backend=jax.default_backend())

from audioflow_tpu import ops
from audioflow_tpu.obs.metrics import measure_throughput
from audioflow_tpu.ops.pallas import mel_spectrogram_pallas as mp

rng = np.random.default_rng(0)
B, SR, SECS = 256, 16000, 10.0
x = rng.standard_normal((B, int(SR * SECS))).astype(np.float32)
xj = jnp.asarray(x)
audio_s = B * SECS

fb = ops.mel_filterbank(513, 128, SR)


def xla_pipe(z):
    return ops.log_mel(ops.spectrogram(z, 1024, 256, center=False), fb, floor=1e-10)


ref = None
for name, fn in [
    ("xla_high", jax.jit(xla_pipe)),
    ("pallas_high", lambda z: mp(z, 1024, 256, 128, SR, precision="high")),
    ("pallas_highest", lambda z: mp(z, 1024, 256, 128, SR, precision="highest")),
]:
    t0 = time.time()
    got = np.asarray(fn(xj))
    compile_s = time.time() - t0
    if ref is None:
        ref = got
        diff = 0.0
    else:
        n = min(ref.shape[1], got.shape[1])
        diff = float(np.abs(ref[:, :n] - got[:, :n]).max())
    m = measure_throughput(fn, xj, audio_s, iters=10)
    emit(stage="melspec", impl=name, ms=round(1000 * m.wall_seconds / m.batches, 2),
         x_rt=round(m.realtime_factor), max_diff_vs_xla=diff,
         compile_s=round(compile_s, 1))

# confirm the auto-dispatch default (pallas fwd-high / inv-default) end to end
fn = jax.jit(lambda z: ops.time_stretch(z, 1.25))
t0 = time.time()
np.asarray(fn(xj))
m = measure_throughput(fn, xj, audio_s, iters=10)
emit(stage="ts_auto", ms=round(1000 * m.wall_seconds / m.batches, 2),
     x_rt=round(m.realtime_factor), compile_s=round(time.time() - t0, 1))

# re-validate on chip: the pvoc row now gates the (high, default) combo
from audioflow_tpu.validate import run_validation

t0 = time.time()
rep = run_validation()
emit(stage="validate", secs=round(time.time() - t0, 1), **rep)
emit(stage="done")
