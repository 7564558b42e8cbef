"""Chip batch r3/3: throughput of the effects + utility ops at batch
64 x 10 s @16 kHz (iters=10) for the BENCHMARKS.md table. One process."""
import json
import time

import numpy as np

OUT = open("/tmp/chip_r3_effects.jsonl", "a", buffering=1)


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
x = jnp.asarray((0.3 * rng.standard_normal((B, int(SR * SECS)))).astype(np.float32))


def bench(name, fn, arg, iters=10):
    t0 = time.time()
    jax.block_until_ready(jax.jit(fn)(arg))
    compile_s = time.time() - t0
    m = measure_throughput(jax.jit(fn), arg, audio_s, iters=iters)
    emit(stage=name, ms=round(1000 * m.wall_seconds / m.batches, 2),
         x_rt=round(m.realtime_factor), compile_s=round(compile_s, 1))


bench("delay_echo", lambda z: ops.feedback_delay(z, 4000, 0.4, 0.5)[0], x)
bench("tremolo", lambda z: ops.tremolo(z, SR, 5.0, 0.5), x)
bench("vibrato", lambda z: ops.vibrato(z, SR, 5.0, 0.002), x)
bench("chorus3", lambda z: ops.chorus(z, SR), x)
bench("flanger", lambda z: ops.flanger(z, SR), x)
bench("deemphasis", lambda z: ops.deemphasis(z, 0.97), x)

# segmentation stack at feature scale: 625-frame MFCC self-sim + novelty
fb = ops.mel_filterbank(513, 64, SR)
feats = jax.jit(lambda z: ops.mfcc(ops.log_mel(
    ops.power(ops.spectrogram(z, 1024, 256, center=False)), fb), 13))(x)
jax.block_until_ready(feats)
bench("selfsim_novelty",
      lambda f: ops.novelty_curve(ops.self_similarity(f), 32), feats)

# spec_augment at feature scale
key = jax.random.PRNGKey(0)
bench("spec_augment", lambda f: ops.spec_augment(f, key), feats)

emit(stage="done")
