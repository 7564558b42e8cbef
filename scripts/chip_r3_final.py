"""Chip batch r3/4: throughput of the last additions at batch 64 x 10 s
@16 kHz (iters=10) — piptrack, chroma_cqt, batched NMF — plus a final
yin/griffinlim confirmation at the shipped defaults after the shared-bank
refactor. Writes /tmp/chip_r3_final.jsonl."""
import json
import time

import numpy as np

OUT = open("/tmp/chip_r3_final.jsonl", "a", buffering=1)


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


def bench(name, fn, arg, iters=10):
    t0 = time.time()
    jax.block_until_ready(jax.jit(fn)(arg))
    compile_s = time.time() - t0
    m = measure_throughput(jax.jit(fn), arg, audio_s, iters=iters)
    emit(stage=name, ms=round(1000 * m.wall_seconds / m.batches, 2),
         x_rt=round(m.realtime_factor), compile_s=round(compile_s, 1))


bench("piptrack", lambda z: ops.piptrack(
    ops.magnitude(ops.stft(z, 2048, 512, center=False)), SR, 2048)[0], x)
bench("chroma_cqt", lambda z: ops.chroma_cqt(z, SR, n_octaves=6), x)

spec = jax.jit(lambda z: ops.magnitude(ops.stft(z, 1024, 256, center=False)))(x)
jax.block_until_ready(spec)
bench("nmf_k4_100it", lambda s: ops.nmf(s, 4, n_iter=100)[0], spec)

# post-refactor confirmation of the shipped defaults
bench("yin_default_confirm", lambda z: ops.yin(z, SR, fmin=65, fmax=1000), x)
mag = jax.jit(lambda z: ops.magnitude(ops.stft(z, 1024, 256)))(x)
jax.block_until_ready(mag)
bench("griffinlim_confirm", lambda m: ops.griffin_lim(m, 1024, 256, n_iter=8), mag)

emit(stage="done")
