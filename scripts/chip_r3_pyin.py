"""Chip batch r3/2: pyin stage breakdown + threshold-scan levers
(VERDICT r2 item 2).

Config = the BENCHMARKS.md defaults row: batch 64 x 10 s @16 kHz, fmin 65 /
fmax 2093, frame 2048, hop 256, resolution 0.1 st, 100 thresholds.
Stages: cmnd -> trough prep -> threshold scan (100 passes over [F, 249])
-> pitch-bin scatter -> 139-offset two-track banded Viterbi + backtrace.

Measured knockouts: full pyin, cmnd-only, through-threshold-scan,
through-obs; then two exact threshold-scan variants:
  A) triangular-MATMUL rank counts: the per-threshold lag cumsum becomes
     one [.., 249] @ [249, 249] upper-triangular dot on the MXU (0/1
     operands and f32 accumulation make bf16 exact here);
  B) lag-axis scan with an f32 [F, M] count carry (ROADMAP's est <=1.5x):
     one scan step per lag, carrying per-threshold counts, emitting
     prob[l] as a masked reduce over M.

Writes JSON lines to /tmp/chip_r3_pyin.jsonl. Single process.
"""
import json
import time

import numpy as np

OUT = open("/tmp/chip_r3_pyin.jsonl", "a", buffering=1)


def emit(**kw):
    kw["t"] = round(time.time(), 1)
    OUT.write(json.dumps(kw) + "\n")
    print(kw, flush=True)


import jax
import jax.numpy as jnp

emit(stage="backend", backend=jax.default_backend())

from audioflow_tpu import ops
from audioflow_tpu.obs.metrics import measure_throughput
from audioflow_tpu.ops._mm import mm
from audioflow_tpu.ops.framing import frame
from audioflow_tpu.ops.pitch import (
    _beta_interval_masses,
    _parabolic_refine,
    cmnd_frames,
)

rng = np.random.default_rng(0)
B, SECS, SR = 64, 10.0, 16000
FMIN, FMAX, FRAME, HOP = 65.0, 2093.0, 2048, 256
M = 100
audio_s = B * SECS

t = np.arange(int(SR * SECS)) / SR
x = (0.4 * np.sin(2 * np.pi * (110 + 80 * np.sin(2 * np.pi * 0.3 * t)) * t)
     + 0.02 * rng.standard_normal(t.shape)).astype(np.float32)
x = jnp.asarray(np.broadcast_to(x, (B, x.shape[0])).copy())

W = FRAME // 2
TAU_LO = max(int(np.floor(SR / FMAX)), 2)
TAU_HI = min(int(np.ceil(SR / FMIN)), W - 1)
T_MAX = min(TAU_HI + 1, W)
LAM = 2.0
GEO = 1.0 - np.exp(-LAM)


def _pad_frames(z):
    pads = [(0, 0)] * (z.ndim - 1) + [(FRAME // 2, FRAME // 2)]
    return frame(jnp.pad(z, pads, mode="reflect"), FRAME, HOP)


def full(z):
    return ops.pyin(z, SR, FMIN, FMAX, FRAME, HOP)[0]


def stage_cmnd(z):
    return cmnd_frames(_pad_frames(z), W, T_MAX)


def _prep(dn):
    lags = jnp.arange(dn.shape[-1])
    in_range = (lags >= TAU_LO) & (lags <= TAU_HI)
    prev = jnp.concatenate([dn[..., :1], dn[..., :-1]], axis=-1)
    nxt = jnp.concatenate([dn[..., 1:], dn[..., -1:]], axis=-1)
    trough = (dn < prev) & (dn <= nxt) & in_range
    return trough


MASSES = jnp.asarray(_beta_interval_masses(2.0, 18.0, M), jnp.float32)
THRESH = jnp.asarray(np.linspace(0.0, 1.0, M + 1)[1:], jnp.float32)


def thr_scan_current(dn, trough):
    geo = jnp.float32(GEO)

    def thr_step(carry, tm):
        prob, nt_mass = carry
        thr, mass = tm
        qualify = trough & (dn < thr)
        cnt = jnp.cumsum(qualify.astype(jnp.float32), axis=-1)
        n_q = cnt[..., -1:]
        rank = cnt - 1.0
        weight = jnp.exp(-LAM * rank) * geo
        norm = jnp.where(n_q > 0, 1.0 - jnp.exp(-LAM * n_q), 1.0)
        prob = prob + jnp.where(qualify, weight / norm, 0.0) * mass
        nt_mass = nt_mass + mass * (n_q[..., 0] <= 0)
        return (prob, nt_mass), None

    (prob, nt), _ = jax.lax.scan(
        thr_step, (jnp.zeros(dn.shape, jnp.float32),
                   jnp.zeros(dn.shape[:-1], jnp.float32)), (THRESH, MASSES)
    )
    return prob, nt


UT = np.triu(np.ones((T_MAX + 1, T_MAX + 1), np.float32)).T  # cnt[l] = sum_{l'<=l}


def thr_scan_matmul(dn, trough):
    geo = jnp.float32(GEO)
    ut = jnp.asarray(UT)

    def thr_step(carry, tm):
        prob, nt_mass = carry
        thr, mass = tm
        qualify = trough & (dn < thr)
        cnt = mm(qualify.astype(jnp.float32), ut, "default")  # exact: 0/1, f32 acc
        n_q = cnt[..., -1:]
        weight = jnp.exp(-LAM * (cnt - 1.0)) * geo
        norm = jnp.where(n_q > 0, 1.0 - jnp.exp(-LAM * n_q), 1.0)
        prob = prob + jnp.where(qualify, weight / norm, 0.0) * mass
        nt_mass = nt_mass + mass * (n_q[..., 0] <= 0)
        return (prob, nt_mass), None

    (prob, nt), _ = jax.lax.scan(
        thr_step, (jnp.zeros(dn.shape, jnp.float32),
                   jnp.zeros(dn.shape[:-1], jnp.float32)), (THRESH, MASSES)
    )
    return prob, nt


def thr_scan_lagaxis(dn, trough):
    """One scan step per lag; carry = per-threshold counts [.., M] f32.

    qualify[l, m] = trough[l] & (dn[l] < thr_m); since thr is the sorted
    grid, dn[l] < thr_m <=> m >= m0[l] with m0 = floor(dn*M) (thr_m =
    (m+1)/M). norm needs the FINAL counts, so pass 1 computes n_q via a
    histogram of m0 over troughs + cumsum over M (tiny), pass 2 scans lags
    accumulating ranks.
    """
    geo = jnp.float32(GEO)
    m0 = jnp.clip(jnp.floor(dn * M).astype(jnp.int32), 0, M)  # dn>=1 -> M: none
    mg = jnp.arange(M, dtype=jnp.int32)
    # pass 1: n_q[m] = #troughs with m0 <= m  (scatter + cumsum over M)
    lead = dn.shape[:-1]
    oneh = (m0[..., None] == mg) & trough[..., None]  # [.., L, M+?]: m0==M never hits
    hist = oneh.astype(jnp.float32).sum(axis=-2)  # [.., M]
    n_q = jnp.cumsum(hist, axis=-1)
    norm_inv = jnp.where(n_q > 0, 1.0 / (1.0 - jnp.exp(-LAM * n_q)), 1.0)
    cmn = MASSES * norm_inv * geo  # [.., M]
    nt_mass = (MASSES * (n_q <= 0)).sum(axis=-1)

    dn_t = jnp.moveaxis(dn, -1, 0)
    tr_t = jnp.moveaxis(trough, -1, 0)
    m0_t = jnp.moveaxis(m0, -1, 0)

    def lag_step(cnt, inp):
        tr, m0l = inp
        q_m = tr[..., None] & (mg >= m0l[..., None])  # [.., M]
        w = jnp.exp(-LAM * cnt) * cmn
        prob_l = jnp.where(q_m, w, 0.0).sum(axis=-1)
        cnt = cnt + q_m.astype(jnp.float32)
        return cnt, prob_l

    cnt0 = jnp.zeros((*lead, M), jnp.float32)
    _, prob_t = jax.lax.scan(lag_step, cnt0, (tr_t, m0_t))
    return jnp.moveaxis(prob_t, 0, -1), nt_mass


def stage_thr(z):
    dn = stage_cmnd(z)
    return thr_scan_current(dn, _prep(dn))[0]


def stage_thr_matmul(z):
    dn = stage_cmnd(z)
    return thr_scan_matmul(dn, _prep(dn))[0]


def stage_thr_lagaxis(z):
    dn = stage_cmnd(z)
    return thr_scan_lagaxis(dn, _prep(dn))[0]


# --- numerical agreement of the variants (CPU-fast shapes would differ in
# backend numerics; check ON CHIP, small slice) ---
xs = x[:4, : SR * 2]
dn_s = jax.jit(stage_cmnd)(xs)
tr_s = _prep(dn_s)
p_cur, nt_cur = jax.jit(thr_scan_current)(dn_s, tr_s)
p_mm, nt_mm = jax.jit(thr_scan_matmul)(dn_s, tr_s)
p_lag, nt_lag = jax.jit(thr_scan_lagaxis)(dn_s, tr_s)
emit(stage="agreement",
     mm_max=float(jnp.abs(p_cur - p_mm).max()),
     lag_max=float(jnp.abs(p_cur - p_lag).max()),
     nt_mm=float(jnp.abs(nt_cur - nt_mm).max()),
     nt_lag=float(jnp.abs(nt_cur - nt_lag).max()))

for name, fn in [
    ("full_pyin", full),
    ("cmnd_only", stage_cmnd),
    ("thru_thr_current", stage_thr),
    ("thru_thr_matmul", stage_thr_matmul),
    ("thru_thr_lagaxis", stage_thr_lagaxis),
]:
    m = measure_throughput(fn, x, audio_s, iters=10)
    emit(stage=name, ms_per_iter=round(m.wall_seconds * 100, 2),
         x_realtime=round(m.realtime_factor, 1),
         compile_s=round(m.compile_seconds, 1))

emit(stage="done")
