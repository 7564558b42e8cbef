"""Chip r4 probe 2: pyin stage split at librosa defaults + unroll ladder.

Times (a) the observation stage alone (_pyin_observations), (b) full pyin,
at _CAND_UNROLL in {1, 4, 8}; the difference is the Viterbi+backtrace+
refinement share. Writes /tmp/chip_r4_pyin2.jsonl.
"""
import json
import time

OUT = open("/tmp/chip_r4_pyin2.jsonl", "a", buffering=1)


def emit(**kw):
    kw["t"] = round(time.time(), 1)
    OUT.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


import numpy as np

import jax
import jax.numpy as jnp

emit(stage="backend", backend=jax.default_backend())

from audioflow_tpu import ops
from audioflow_tpu.ops import pitch
from audioflow_tpu.ops.framing import frame as _frame
from audioflow_tpu.obs.metrics import measure_throughput

rng = np.random.default_rng(0)
B, SECS, SR = 64, 10.0, 16000
FMIN, FMAX, FRAME, HOP = 65.0, 2093.0, 2048, 256

t = np.arange(int(SR * SECS)) / SR
x = (0.4 * np.sin(2 * np.pi * (110 + 80 * np.sin(2 * np.pi * 0.3 * t)) * t)
     + 0.02 * rng.standard_normal(t.shape)).astype(np.float32)
x = jnp.asarray(np.broadcast_to(x, (B, x.shape[0])).copy())
pads = [(0, 0), (FRAME // 2, FRAME // 2)]


def obs_only(z):
    zp = jnp.pad(z, pads, mode="reflect")
    fr = _frame(zp, FRAME, HOP)
    out = pitch._pyin_observations(fr, SR, FMIN, FMAX)
    return out[0]  # obs_v


def cmnd_only(z):
    zp = jnp.pad(z, pads, mode="reflect")
    fr = _frame(zp, FRAME, HOP)
    w = FRAME // 2
    tau_hi = min(int(np.ceil(SR / FMIN)), w - 1)
    return pitch.cmnd_frames(fr, w, min(tau_hi + 1, w))


for unroll in (1, 4, 8):
    pitch._CAND_UNROLL = unroll
    mo = measure_throughput(obs_only, x, B * SECS, iters=10)
    mf = measure_throughput(
        lambda z: ops.pyin(z, SR, FMIN, FMAX, FRAME, HOP)[0], x, B * SECS,
        iters=10)
    emit(stage="unroll_probe", unroll=unroll,
         obs_ms=round(mo.wall_seconds * 100, 2),
         full_ms=round(mf.wall_seconds * 100, 2))

pitch._CAND_UNROLL = 8
mc = measure_throughput(cmnd_only, x, B * SECS, iters=10)
emit(stage="cmnd_only", ms=round(mc.wall_seconds * 100, 2))

emit(stage="done")
