"""Chip batch 5: DFT formulation shootout for config 2's spectrogram stage.

Candidates (ops/stft.py):
  - matmul  (shipped default): two [.., 1024] @ [1024, 513] dots at 'high'
  - onedot  : cos|sin banks concatenated to exactly [1024, 1024] (sin k=0 /
              k=512 columns are identically zero) -> ONE dot, zero pad waste
  - radix2  : even/odd decimation -> two [512, 512] combined-bank dots
              (half the MACs) + elementwise twiddle combine

Measured standalone (16 kHz post-resample stage) and end-to-end on config 2
(44.1k -> 16k resample -> spectrogram -> 128 log-mel, chunked Graph.compile).
Writes incremental JSON lines to /tmp/chip_r2s5.jsonl.
"""
import json
import time

import numpy as np

OUT = open("/tmp/chip_r2s5.jsonl", "a", buffering=1)


def emit(**kw):
    kw["t"] = round(time.time(), 1)
    OUT.write(json.dumps(kw) + "\n")
    print(kw, flush=True)


import jax
import jax.numpy as jnp

emit(stage="backend", backend=jax.default_backend())

from audioflow_tpu import ops
from audioflow_tpu.graph import Graph, MelProject, Resample, Spectrogram
from audioflow_tpu.obs.metrics import measure_throughput

rng = np.random.default_rng(0)
B, SECS = 256, 10.0

# ---- standalone spectrogram stage (16 kHz, center=False, power) ----
SR = 16000
x16 = jnp.asarray(rng.standard_normal((B, int(SR * SECS))).astype(np.float32))
audio_s = B * SECS

ref = None
for impl in ["matmul", "onedot", "radix2"]:
    fn = jax.jit(lambda z, i=impl: ops.spectrogram(z, 1024, 256, center=False, impl=i))
    t0 = time.time()
    got = np.asarray(fn(x16))
    compile_s = time.time() - t0
    if ref is None:
        ref, diff = got, 0.0
    else:
        diff = float(np.abs(ref - got).max() / np.abs(ref).max())
    m = measure_throughput(fn, x16, audio_s, iters=10)
    emit(stage="spec_standalone", impl=impl,
         ms=round(1000 * m.wall_seconds / m.batches, 2),
         x_rt=round(m.realtime_factor), rel_vs_matmul=diff,
         compile_s=round(compile_s, 1))

# ---- standalone log-mel (spectrogram + mel @ shipped precisions) ----
fb = ops.mel_filterbank(513, 128, SR)
for impl in ["matmul", "onedot", "radix2"]:
    fn = jax.jit(
        lambda z, i=impl: ops.log_mel(
            ops.spectrogram(z, 1024, 256, center=False, impl=i), fb
        )
    )
    t0 = time.time()
    np.asarray(fn(x16))
    compile_s = time.time() - t0
    m = measure_throughput(fn, x16, audio_s, iters=10)
    emit(stage="logmel_standalone", impl=impl,
         ms=round(1000 * m.wall_seconds / m.batches, 2),
         x_rt=round(m.realtime_factor), compile_s=round(compile_s, 1))

# ---- config 2 end-to-end (chunked Graph.compile) ----
SRIN = 44100
x44 = jnp.asarray(rng.standard_normal((B, int(SRIN * SECS))).astype(np.float32))
ref = None
for impl in ["matmul", "onedot", "radix2"]:
    g = Graph(
        (
            Resample(SRIN, 16000, "kaiser"),
            Spectrogram(1024, 256, center=False, power=True, impl=impl),
            MelProject(n_mels=128),
        ),
        input_rate=SRIN,
        name=f"c2_{impl}",
    )
    fn = g.compile()
    t0 = time.time()
    got = np.asarray(fn(x44))
    compile_s = time.time() - t0
    if ref is None:
        ref, diff = got, 0.0
    else:
        diff = float(np.abs(ref - got).max())
    m = measure_throughput(fn, x44, audio_s, iters=10)
    emit(stage="config2", impl=impl,
         ms=round(1000 * m.wall_seconds / m.batches, 2),
         x_rt=round(m.realtime_factor), max_abs_diff_logmel=diff,
         compile_s=round(compile_s, 1))

emit(stage="done")
