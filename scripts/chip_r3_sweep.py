"""Chip batch r3/2: throughput of the new/changed ops at the standard
batch-64 x 10 s @16 kHz config (iters=10), for the BENCHMARKS.md table.

yin (new matmul-ACF default), pyin (defaults + resolution 0.5 variant),
griffin_lim (new bf16 default, 8 iters), tempo + beat_track (onset autocorr
now matmul), lpc (order 16 on 2048-frames), dtw (1000x1000 MFCC pair).
Writes JSON lines to /tmp/chip_r3_sweep.jsonl.
"""
import json
import time

import numpy as np

OUT = open("/tmp/chip_r3_sweep.jsonl", "a", buffering=1)


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
audio_s = B * SECS
t = np.arange(int(SR * SECS)) / SR
x = (0.4 * np.sin(2 * np.pi * (110 + 80 * np.sin(2 * np.pi * 0.3 * t)) * t)
     + 0.02 * rng.standard_normal(t.shape)).astype(np.float32)
x = jnp.asarray(np.broadcast_to(x, (B, x.shape[0])).copy())


def bench(name, fn, arg, asec=audio_s, iters=10):
    t0 = time.time()
    jax.block_until_ready(jax.jit(fn)(arg))
    compile_s = time.time() - t0
    m = measure_throughput(jax.jit(fn), arg, asec, iters=iters)
    emit(stage=name, ms=round(1000 * m.wall_seconds / m.batches, 2),
         x_rt=round(m.realtime_factor), compile_s=round(compile_s, 1))


# yin with the new default (auto -> matmul, minimal banks)
bench("yin_default", lambda z: ops.yin(z, SR, fmin=65, fmax=1000), x)

# pyin at shipped defaults and at the coarser music resolution
bench("pyin_defaults", lambda z: ops.pyin(z, SR, fmin=65, fmax=1000)[0], x)
bench("pyin_res05_thr32",
      lambda z: ops.pyin(z, SR, fmin=65, fmax=1000, resolution=0.5,
                         n_thresholds=32)[0], x)

# griffin_lim at the new bf16 default
mag = jax.jit(lambda z: ops.magnitude(ops.stft(z, 1024, 256)))(x)
jax.block_until_ready(mag)
bench("griffinlim_default8", lambda m: ops.griffin_lim(m, 1024, 256, n_iter=8), mag)

# rhythm stack with the matmul autocorrelation
fb = ops.mel_filterbank(513, 128, SR)
env = jax.jit(lambda z: ops.onset_strength(
    ops.apply_mel(ops.power(ops.spectrogram(z, 1024, 256, center=False)), fb)))(x)
jax.block_until_ready(env)
bench("tempo_matmul", lambda e: ops.tempo(e, SR, 256), env)
bench("beat_track", lambda e: ops.beat_track(e, SR, 256)[0], env)

# lpc: order-16 per 2048-sample frame (hop 512) over the batch
from audioflow_tpu.ops.framing import frame
fr = jax.jit(lambda z: frame(z, 2048, 512))(x)
jax.block_until_ready(fr)
bench("lpc16_frames", lambda f: ops.lpc(f, 16), fr)

# dtw: one 1000x1000 alignment of 13-dim MFCC-ish features
a = jnp.asarray(rng.standard_normal((1000, 13)).astype(np.float32))
b = jnp.asarray(rng.standard_normal((1000, 13)).astype(np.float32))
t0 = time.time()
acc, path = ops.dtw(a, b)
emit(stage="dtw_1000x1000", wall_s=round(time.time() - t0, 2),
     path_len=int(path.shape[0]))

emit(stage="done")
