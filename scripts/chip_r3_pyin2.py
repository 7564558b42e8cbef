"""Chip batch r3/3: pyin tail breakdown — obs scatter vs banded Viterbi —
plus Viterbi variants (VERDICT r2 item 2 continued).

chip_r3_pyin.py showed: full 267.5 ms = cmnd 2.9 + thr-scan 114 (27 with
the lag-axis form) + tail ~150. This script splits the tail: the pitch-bin
scatter-add ([40k, 249] -> [40k, 602] at[].add) and the 139-offset
two-track banded Viterbi (625 scan steps over [64, 602]), and measures:
  V0) shipped two-track step (two max_plus_band_argmax calls);
  V1) stacked tracks: one call over [2, B, N] (fewer HLO ops per step);
  V2) stacked + composed double-step (two frames per scan step).
Writes JSON lines to /tmp/chip_r3_pyin2.jsonl.
"""
import json
import time

import numpy as np

OUT = open("/tmp/chip_r3_pyin2.jsonl", "a", buffering=1)


def emit(**kw):
    kw["t"] = round(time.time(), 1)
    OUT.write(json.dumps(kw) + "\n")
    print(kw, flush=True)


import jax
import jax.numpy as jnp

emit(stage="backend", backend=jax.default_backend())

from audioflow_tpu.obs.metrics import measure_throughput
from audioflow_tpu.ops.sequence import max_plus_band_argmax

rng = np.random.default_rng(0)
B, F, N, HALF = 64, 626, 602, 69
audio_s = B * 10.0
K = 2 * HALF + 1

tri = 1.0 - np.abs(np.arange(-HALF, HALF + 1, dtype=np.float64)) / (HALF + 1.0)
LK = jnp.asarray(np.log(tri / tri.sum()).astype(np.float32))
LOG_STAY = jnp.float32(np.log1p(-0.01))
LOG_SWITCH = jnp.float32(np.log(0.01))

ov = jnp.asarray(rng.standard_normal((F, B, N)).astype(np.float32)) - 5.0
ou = jnp.asarray(rng.standard_normal((F, B, N)).astype(np.float32)) - 5.0


def vit_shipped(obs):
    ov, ou = obs[0], obs[1]
    dv0, du0 = ov[0], ou[0]

    def step(carry, obs_t):
        dv, du = carry
        lv, lu = obs_t
        bv, av = max_plus_band_argmax(dv, LK)
        bu, au = max_plus_band_argmax(du, LK)
        sv, su = bv + LOG_STAY, bu + LOG_SWITCH
        pick_v = su > sv
        new_v = lv + jnp.where(pick_v, su, sv)
        off_v = jnp.where(pick_v, au, av)
        sv2, su2 = bv + LOG_SWITCH, bu + LOG_STAY
        pick_u = su2 > sv2
        new_u = lu + jnp.where(pick_u, su2, sv2)
        off_u = jnp.where(pick_u, au, av)
        return (new_v, new_u), (off_v, pick_v, off_u, pick_u)

    (dv, du), bps = jax.lax.scan(step, (dv0, du0), (ov[1:], ou[1:]))
    return dv + du + bps[0].astype(jnp.float32).sum(0) * 0  # force materialize


def vit_stacked(obs):
    ov, ou = obs[0], obs[1]
    d0 = jnp.stack([ov[0], ou[0]])  # [2, B, N]
    o = jnp.stack([ov, ou], axis=1)  # [F, 2, B, N]

    def step(d, obs_t):
        b, a = max_plus_band_argmax(d, LK)  # [2, B, N]
        bv, bu = b[0], b[1]
        av, au = a[0], a[1]
        sv, su = bv + LOG_STAY, bu + LOG_SWITCH
        pick_v = su > sv
        new_v = obs_t[0] + jnp.where(pick_v, su, sv)
        off_v = jnp.where(pick_v, au, av)
        sv2, su2 = bv + LOG_SWITCH, bu + LOG_STAY
        pick_u = su2 > sv2
        new_u = obs_t[1] + jnp.where(pick_u, su2, sv2)
        off_u = jnp.where(pick_u, au, av)
        return jnp.stack([new_v, new_u]), (off_v, pick_v, off_u, pick_u)

    d, bps = jax.lax.scan(step, d0, o[1:])
    return d.sum(0) + bps[0].astype(jnp.float32).sum(0) * 0


# numerical agreement on a slice
sl = jnp.stack([ov[:40, :4], ou[:40, :4]])
r0 = jax.jit(vit_shipped)(sl)
r1 = jax.jit(vit_stacked)(sl)
emit(stage="vit_agreement", stacked_max=float(jnp.abs(r0 - r1).max()))

for name, fn in [("vit_shipped", vit_shipped), ("vit_stacked", vit_stacked)]:
    m = measure_throughput(fn, jnp.stack([ov, ou]), audio_s, iters=10)
    emit(stage=name, ms_per_iter=round(m.wall_seconds * 100, 2),
         compile_s=round(m.compile_seconds, 1))

# --- obs scatter cost at real shapes ---
L = 249
prob = jnp.asarray(rng.random((B, F, L)).astype(np.float32))
bins = jnp.asarray(rng.integers(0, N, (B, F, L)).astype(np.int32))


def obs_scatter(prob):
    pf = prob.reshape(-1, L)
    bf = bins.reshape(pf.shape)
    rows = jnp.arange(pf.shape[0])[:, None]
    return jnp.zeros((pf.shape[0], N), jnp.float32).at[rows, bf].add(pf)


m = measure_throughput(obs_scatter, prob, audio_s, iters=10)
emit(stage="obs_scatter", ms_per_iter=round(m.wall_seconds * 100, 2),
     compile_s=round(m.compile_seconds, 1))


# one-hot matmul-style alternative: chunked accumulation over lag blocks
def obs_onehot_scan(prob):
    ngrid = jnp.arange(N, dtype=jnp.int32)
    pf = jnp.moveaxis(prob, -1, 0)  # [L, B, F]
    bf = jnp.moveaxis(bins.reshape(prob.shape), -1, 0)

    def body(acc, inp):
        p, b = inp
        return acc + jnp.where(b[..., None] == ngrid, p[..., None], 0.0), None

    acc0 = jnp.zeros((*prob.shape[:-1], N), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, (pf, bf))
    return acc


import functools
def _with_small_bins(fn, b):
    return lambda p: fn(p)
bins_small = bins[:4, :40]
bins_full = bins
bins = bins_small
s0 = jax.jit(obs_scatter)(prob[:4, :40]).reshape(4, 40, N)
s1 = jax.jit(obs_onehot_scan)(prob[:4, :40])
bins = bins_full
emit(stage="obs_agreement", diff=float(jnp.abs(s0 - s1).max()))
m = measure_throughput(obs_onehot_scan, prob, audio_s, iters=10)
emit(stage="obs_onehot_scan", ms_per_iter=round(m.wall_seconds * 100, 2),
     compile_s=round(m.compile_seconds, 1))

emit(stage="done")
