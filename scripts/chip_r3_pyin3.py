"""Chip batch r3/4: why is integrated pyin 231 ms when the isolated stages
sum to ~84 ms? Stage-cutoff knockouts of the CURRENT ops/pitch.py code.

Cutoffs (each jitted end-to-end from audio): dn -> prob (lag-axis scan) ->
obs_v (one-hot scan) -> viterbi fwd -> full. Writes /tmp/chip_r3_pyin3.jsonl.
"""
import json
import time

import numpy as np

OUT = open("/tmp/chip_r3_pyin3.jsonl", "a", buffering=1)


def emit(**kw):
    kw["t"] = round(time.time(), 1)
    OUT.write(json.dumps(kw) + "\n")
    print(kw, flush=True)


import jax
import jax.numpy as jnp

emit(stage="backend", backend=jax.default_backend())

from audioflow_tpu import ops
from audioflow_tpu.obs.metrics import measure_throughput
from audioflow_tpu.ops.framing import frame
from audioflow_tpu.ops.pitch import (
    _beta_interval_masses,
    _parabolic_refine,
    cmnd_frames,
)

rng = np.random.default_rng(0)
B, SECS, SR = 64, 10.0, 16000
FMIN, FMAX, FRAME, HOP = 65.0, 2093.0, 2048, 256
audio_s = B * SECS

t = np.arange(int(SR * SECS)) / SR
x = (0.4 * np.sin(2 * np.pi * (110 + 80 * np.sin(2 * np.pi * 0.3 * t)) * t)
     + 0.02 * rng.standard_normal(t.shape)).astype(np.float32)
x = jnp.asarray(np.broadcast_to(x, (B, x.shape[0])).copy())


def staged(z, cutoff):
    """ops/pitch.py::pyin_frames replicated with stage cutoffs."""
    sample_rate, fmin, fmax, hop = SR, FMIN, FMAX, HOP
    n_thresholds, resolution = 100, 0.1
    boltzmann_parameter, switch_prob, no_trough_prob = 2.0, 0.01, 0.01
    max_transition_rate = 35.92
    pads = [(0, 0)] * (z.ndim - 1) + [(FRAME // 2, FRAME // 2)]
    frames = frame(jnp.pad(z, pads, mode="reflect"), FRAME, hop)

    l = frames.shape[-1]
    w = l // 2
    tau_lo = max(int(np.floor(sample_rate / fmax)), 2)
    tau_hi = min(int(np.ceil(sample_rate / fmin)), w - 1)
    dn = cmnd_frames(frames, w, min(tau_hi + 1, w))
    if cutoff == "dn":
        return dn
    dtype = dn.dtype
    lags = jnp.arange(dn.shape[-1])
    in_range = (lags >= tau_lo) & (lags <= tau_hi)
    prev = jnp.concatenate([dn[..., :1], dn[..., :-1]], axis=-1)
    nxt = jnp.concatenate([dn[..., 1:], dn[..., -1:]], axis=-1)
    trough = (dn < prev) & (dn <= nxt) & in_range
    delta = _parabolic_refine(prev, dn, nxt)
    f0_lag = sample_rate / jnp.maximum(lags.astype(dtype) + delta, 1.0)

    lam = float(boltzmann_parameter)
    m_count = int(n_thresholds)
    masses = jnp.asarray(_beta_interval_masses(2.0, 18.0, m_count), dtype)
    thresholds = jnp.asarray(
        np.linspace(0.0, 1.0, m_count + 1)[1:].astype(np.float64), dtype)
    geo = dtype.type(1.0) - jnp.exp(jnp.asarray(-lam, dtype))
    m0 = jnp.clip(jnp.floor(dn * m_count).astype(jnp.int32), 0, m_count)
    t_at = thresholds[jnp.clip(m0, 0, m_count - 1)]
    m0 = jnp.where((m0 < m_count) & (dn >= t_at), m0 + 1, m0)
    t_prev = thresholds[jnp.clip(m0 - 1, 0, m_count - 1)]
    m0 = jnp.where((m0 >= 1) & (dn < t_prev), m0 - 1, m0)
    mg = jnp.arange(m_count, dtype=jnp.int32)
    hist = ((m0[..., None] == mg) & trough[..., None]).astype(dtype).sum(axis=-2)
    n_q = jnp.cumsum(hist, axis=-1)
    if cutoff == "hist":
        return n_q
    norm_inv = jnp.where(n_q > 0, 1.0 / (1.0 - jnp.exp(-lam * n_q)), 1.0)
    cmn = masses * norm_inv * geo
    nt_mass = (masses * (n_q <= 0)).sum(axis=-1)

    tr_t = jnp.moveaxis(trough, -1, 0)
    m0_t = jnp.moveaxis(m0, -1, 0)

    def lag_step(cnt, inp):
        tr, m0l = inp
        q_m = tr[..., None] & (mg >= m0l[..., None])
        w_ = jnp.exp(-lam * cnt) * cmn
        prob_l = jnp.where(q_m, w_, 0.0).sum(axis=-1)
        return cnt + q_m.astype(dtype), prob_l

    cnt0 = jnp.zeros((*dn.shape[:-1], m_count), dtype)
    _, prob_t = jax.lax.scan(lag_step, cnt0, (tr_t, m0_t))
    prob = jnp.moveaxis(prob_t, 0, -1)
    if cutoff == "prob":
        return prob

    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    depth_masked = jnp.where(trough, dn, big)
    gmin = jnp.argmin(depth_masked, axis=-1)
    has_any = trough.any(axis=-1)
    gmin_hot = (lags == gmin[..., None]) & has_any[..., None]
    prob = prob + gmin_hot * (no_trough_prob * nt_mass)[..., None]
    voiced_prob = jnp.clip(prob.sum(axis=-1), 0.0, 1.0)

    nbps = max(1, int(round(1.0 / resolution)))
    n_bins = int(np.floor(12.0 * nbps * np.log2(fmax / fmin))) + 1
    bins = jnp.clip(
        jnp.round(12.0 * nbps * jnp.log2(f0_lag / fmin)).astype(jnp.int32),
        0, n_bins - 1)
    ngrid = jnp.arange(n_bins, dtype=jnp.int32)
    prob_l_t = jnp.moveaxis(prob, -1, 0)
    bins_t = jnp.moveaxis(bins, -1, 0)

    def bin_step(acc, inp):
        p, b = inp
        return acc + jnp.where(b[..., None] == ngrid, p[..., None], 0.0), None

    obs_v, _ = jax.lax.scan(
        bin_step, jnp.zeros((*dn.shape[:-1], n_bins), dtype), (prob_l_t, bins_t))
    if cutoff == "obs":
        return obs_v
    return obs_v.sum() + voiced_prob.sum()  # terminal for "tail-less"


def full(z):
    return ops.pyin(z, SR, FMIN, FMAX, FRAME, HOP)[0]


for name, fn in [
    ("dn", lambda z: staged(z, "dn")),
    ("hist", lambda z: staged(z, "hist")),
    ("prob", lambda z: staged(z, "prob")),
    ("obs", lambda z: staged(z, "obs")),
    ("full", full),
]:
    m = measure_throughput(fn, x, audio_s, iters=10)
    emit(stage=name, ms_per_iter=round(m.wall_seconds * 100, 2),
         compile_s=round(m.compile_seconds, 1))

emit(stage="done")
