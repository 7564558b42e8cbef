"""Round-3 verify drive: the changed surfaces, end-to-end on the real TPU.

1. griffin_lim default dispatch — impl="auto" must route to the fused
   Pallas kernel on TPU, bit-identical to impl="pallas", and reconstruct a
   tone (specconv + dominant frequency).
2. StreamSession.open(precompile=True) — the first push must not stall on
   a compile (wall ~= steady-state), and streamed == offline still holds.
3. The full `audioflow validate` gate (float64 oracles, all rows), which
   now exercises the Pallas GL path through griffinlim_tone_err.

One process (the chip is claimed per process). JSON lines to stdout.
"""
import json
import time

import numpy as np


def emit(**kw):
    print(json.dumps(kw), flush=True)


import jax
import jax.numpy as jnp

emit(stage="backend", backend=jax.default_backend())

# --- 1. fused GL dispatch + quality -----------------------------------------
from audioflow_tpu.ops.griffinlim import griffin_lim
from audioflow_tpu.ops.stft import stft

sr = 16000
t = np.arange(sr) / sr
x = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
mag = jnp.abs(stft(jnp.asarray(x[None]), 1024, 256, impl="matmul",
                   precision="highest"))
y_auto = np.asarray(griffin_lim(mag, n_iter=8, length=sr))
y_pallas = np.asarray(griffin_lim(mag, n_iter=8, length=sr, impl="pallas"))
assert np.array_equal(y_auto, y_pallas), "auto did not route to pallas on TPU"
m2 = np.asarray(jnp.abs(stft(jnp.asarray(y_auto), 1024, 256, impl="matmul",
                             precision="highest")))[:, : mag.shape[-2]]
sc = float(np.linalg.norm(m2 - np.asarray(mag)) / np.linalg.norm(np.asarray(mag)))
sp = np.abs(np.fft.rfft(y_auto[0] * np.hanning(sr)))
fdom = float(np.argmax(sp) * sr / sr)
emit(stage="gl_auto_pallas", specconv=round(sc, 4), fdom_hz=round(fdom, 1))
assert sc < 0.25 and abs(fdom - 440.0) < 3.0

# --- 2. session precompile: first push == steady push ------------------------
from audioflow_tpu.graph import Graph, LogMelSpec
from audioflow_tpu.session import StreamSession

g = Graph([LogMelSpec(1024, 256, 128, center=False, sample_rate=16000)])
chunk = 16128  # multiple of hop 256
xs = np.random.default_rng(0).standard_normal((4, 8 * chunk)).astype(np.float32)
sess = StreamSession(g, chunk_in=chunk, lead_shape=(4,)).open()
# device barrier: make sure open's warm dispatches have retired before timing
sess.push(np.zeros((4, 0), np.float32)) if False else None
walls = []
for i in range(8):
    t0 = time.perf_counter()
    sess.push(xs[:, i * chunk : (i + 1) * chunk])
    for r in sess.poll_all():
        np.asarray(r.data).sum()
    walls.append(time.perf_counter() - t0)
sess.close()
emit(stage="session_first_push", first_s=round(walls[0], 3),
     steady_s=[round(w, 3) for w in walls[1:]])

# streamed == offline (the invariant, latency-aligned, via precompile="all")
off = np.asarray(jax.jit(g)(jnp.asarray(xs)))
lat = g.stream_latency(chunk)
sess = StreamSession(g, chunk_in=chunk, lead_shape=(4,)).open(precompile="all")
for i in range(8):
    sess.push(xs[:, i * chunk : (i + 1) * chunk])
outs = [np.asarray(r.data) for r in sess.poll_all()]
sess.close()
strm = np.concatenate(outs, axis=-2)
m = min(strm.shape[-2] - lat, off.shape[-2])
d = np.abs(strm[..., lat : lat + m, :] - off[..., :m, :]).max()
emit(stage="session_stream_vs_offline", max_delta=float(d), frames=m, lat=lat)
assert d < 2e-5, d

# --- 3. the full validate gate -----------------------------------------------
from audioflow_tpu.validate import run_validation

t0 = time.perf_counter()
rep = run_validation()
emit(stage="validate", ok=bool(rep["pass"]), wall_s=round(time.perf_counter() - t0, 1),
     rows={k: (round(v, 7) if isinstance(v, float) else v)
           for k, v in rep.items() if k != "pass"})
assert rep["pass"], rep
emit(stage="done")
