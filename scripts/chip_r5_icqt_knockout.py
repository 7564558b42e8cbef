"""Round-5 icqt stage knockouts (VERDICT r4 item 6).

The hybrid inverse at the framework defaults measures 19.5k x inverse-only
/ 5,611x round-trip (BENCHMARKS.md) — the slowest family rows. Stages:

  A. dual branch only  (the Tb-tap coefficient conv)
  B. A + peak/phase    (mag, is_peak, dphi)
  C. B + candidate scoring (the [.., T, K, C] l_h sinc-sum evaluations —
     the suspected hot spot: ~160 transcendental ops per element)
  D. full hybrid icqt
  E. full multirate icqt (the new invertible variant, for the family table)
  F. cqt->icqt round trips (hybrid and multirate)

Writes JSON lines to bench_records/chip_r5_icqt.jsonl.
Run WITH the axon sitecustomize: PYTHONPATH=/root/repo:/root/.axon_site.
"""

import json
import os
import time

OUT = open(os.path.join("/root/repo/bench_records", "chip_r5_icqt.jsonl"), "a", buffering=1)


def emit(**kw):
    kw["t"] = round(time.time(), 1)
    OUT.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


import numpy as np

import jax
import jax.numpy as jnp

emit(stage="backend", backend=jax.default_backend())

import importlib

from audioflow_tpu import ops  # noqa: F401
from audioflow_tpu.obs.metrics import measure_throughput

# ops.cqt the attribute is the re-exported FUNCTION; fetch the module
C = importlib.import_module("audioflow_tpu.ops.cqt")

SR, HOP, NB = 16000, 256, 84
B, SECS = 16, 10.0
T = int(SR * SECS)
rng = np.random.default_rng(0)
t = np.arange(T) / SR
x = (0.4 * np.sin(2 * np.pi * (110 + 80 * np.sin(2 * np.pi * 0.3 * t)) * t)
     + 0.02 * rng.standard_normal(T)).astype(np.float32)
xb = jnp.asarray(np.broadcast_to(x, (B, T)).copy())
audio = B * SECS

# forward coefficients once per iteration inside the measured fn (re/im to
# avoid complex at the boundary) — measure icqt stages with the SAME input
fwd = lambda z: C.cqt(z, SR, HOP, NB, output="complex")  # noqa: E731


def stage_a(z):
    c = fwd(z)
    dz = C._hybrid_design(SR, HOP, NB, C.FMIN_C1, 12, "hann", 1.0)
    nd, k_dual = dz["nd"], dz["k_dual"]
    re = jnp.real(c).astype(jnp.float32)
    im = jnp.imag(c).astype(jnp.float32)
    ri = jnp.concatenate([re[..., :k_dual], im[..., :k_dual]], axis=-1)
    n_frames = c.shape[-2]
    t_cosets = nd // HOP
    lhs = ri.reshape(-1, n_frames, 2 * k_dual).transpose(0, 2, 1)
    y_blk = jax.lax.conv_general_dilated(
        lhs, jnp.asarray(dz["kern"]), window_strides=(1,),
        padding=[(t_cosets - 1, t_cosets - 1)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return y_blk.sum()


def stage_b(z):
    c = fwd(z)
    re = jnp.real(c).astype(jnp.float32)
    im = jnp.imag(c).astype(jnp.float32)
    mag = jnp.sqrt(re * re + im * im)
    gmax = jnp.max(mag, axis=(-2, -1), keepdims=True)
    neg = jnp.full(mag.shape[:-1] + (1,), -1.0, mag.dtype)
    padm = jnp.concatenate([neg, mag, neg], axis=-1)
    is_peak = (mag > padm[..., :-2]) & (mag >= padm[..., 2:]) & (mag > 1e-3 * gmax)
    pr = re[..., 1:, :] * re[..., :-1, :] + im[..., 1:, :] * im[..., :-1, :]
    pi = im[..., 1:, :] * re[..., :-1, :] - re[..., 1:, :] * im[..., :-1, :]
    dphi = jnp.arctan2(pi, pr)
    return is_peak.sum() + dphi.sum() + stage_a(z) * 0


def stage_d(z):
    return C.icqt(fwd(z), SR, HOP, NB, length=T).sum()


def stage_e(z):
    return C.icqt(C.cqt(z, SR, multirate=True, output="complex"), length=T).sum()


def fwd_only(z):
    c = fwd(z)
    return jnp.real(c).sum() + jnp.imag(c).sum()


def fwd_mr_only(z):
    c = C.cqt(z, SR, multirate=True, output="complex")
    return sum(jnp.real(o).sum() + jnp.imag(o).sum() for o in c.octaves)


for name, fn in (
    ("fwd_cqt", fwd_only),
    ("fwd_cqt_multirate", fwd_mr_only),
    ("icqt_stageA_dualconv", stage_a),
    ("icqt_stageB_peaks", stage_b),
    ("icqt_hybrid_full", stage_d),
    ("icqt_multirate_full", stage_e),
):
    m = measure_throughput(fn, xb, audio, iters=10)
    emit(stage=name, ms_per_iter=round(m.wall_seconds * 100, 2),
         x_realtime=round(m.realtime_factor, 1),
         compile_s=round(m.compile_seconds, 1))
