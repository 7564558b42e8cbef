"""Fused Pallas kernel for the pYIN two-track banded Viterbi forward pass.

The XLA formulation (ops/pitch.py::pyin_frames) is a ``lax.scan`` over
frames where each step runs ``max_plus_band_argmax`` twice (2*half+1
shifted adds + max/select trees over [.., n_bins] vectors) plus the
voiced/unvoiced track merge — compute-light (~20 G vector ops at the
librosa-defaults benchmark batch) but emitted as hundreds of small HLO ops
per sequential scan step: ~26 ms of the 84.8 ms defaults tracker by the
round-3 knockouts (docs/ROADMAP.md item 0 — this kernel is that roadmap's
named lever: messages VMEM-resident, the band as in-register lane
rotations, backpointers int8).

Kernel design (one ``pallas_call``, grid = frames, sequential):

* both tracks' messages live as ONE ``[2B, W]`` f32 VMEM scratch (voiced
  rows then unvoiced rows — batch in sublanes, so every vector op serves
  the whole batch), ``W = roundup(n_bins + 2*half, 128)`` lanes with the
  valid bins at ``[half, half + n_bins)`` and -1e30 margins. The state
  never leaves VMEM between steps;
* the banded max-plus runs as ``2*half+1`` UNROLLED taps of one
  incremental lane-rotation (``pltpu.roll`` by -1) + add + compare/select
  pair, shared by both tracks (they ride the same [2B, W] registers). The
  -inf margins make out-of-range sources lose automatically; the initial
  ``+half`` rotation wraps only -inf lanes (W >= n_bins + 2*half);
* the voiced<->unvoiced merge splits the sublane halves and transcribes
  the XLA ``vit_step`` literally — same strict-compare tie conventions,
  so the decode is bit-identical (verified exact on CPU interpret and
  gated by pyin_220_rel + the serial float64 oracle);
* per-step backpointers are written as int8 CENTERED offset (off -
  half) + int8
  source-track flag ``[F, 2B, W]``; the caller slices valid lanes/rows and
  runs the UNCHANGED width-1 backtrace (the delta-emitting recompute
  variant was measured and rejected round 4 — serial window gathers).

The log-kernel (a design constant, <= a few hundred taps) is baked into
the unrolled loop as immediates — no SMEM reads on the hot path.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from .common import PALLAS_OK, roll as _roll

if PALLAS_OK:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30
#: unroll budget AND the int8 backpointer range: offsets are stored
#: CENTERED (off - half, in [-half, half]) so they fit int8 exactly for
#: kernels up to 255 taps — the uncentered form overflowed at the
#: library-default 139 taps (offset 130 wrapped to -126; caught by the r5
#: code review's repro)
_MAX_KERNEL_TAPS = 255


def supported(n_bins: int, kernel_len: int) -> bool:
    """True when the fused forward pass can run this config."""
    return (
        bool(PALLAS_OK)
        and kernel_len % 2 == 1
        and kernel_len <= _MAX_KERNEL_TAPS
        and n_bins >= 1
    )


def _kernel(
    obs_ref, d_ref, off_ref, pick_ref, d_scr,
    *, lk, half, w, b, log_init, log_stay, log_switch, interpret,
):
    t = pl.program_id(0)
    obs = obs_ref[0]  # [2B, W]: voiced rows then unvoiced rows

    @pl.when(t == 0)
    def _init():
        d_scr[...] = obs + log_init
        off_ref[0] = jnp.zeros((2 * b, w), jnp.int8)
        pick_ref[0] = jnp.zeros((2 * b, w), jnp.int8)

    @pl.when(t > 0)
    def _step():
        q = d_scr[...]
        # band: acc[i] = max_k q[i + k - half] + lk[k]; start at k=0 via a
        # +half rotation, then rotate by -1 per unrolled tap
        cur = _roll(q, half, 1, interpret)
        acc = cur + lk[0]
        arg = jnp.zeros((2 * b, w), jnp.int32)
        for k in range(1, len(lk)):
            cur = _roll(cur, -1, 1, interpret)
            cand = cur + lk[k]
            take = cand > acc
            acc = jnp.where(take, cand, acc)
            arg = jnp.where(take, k, arg)
        # track merge: literal transcription of the XLA vit_step (strict
        # compares; both tracks resolve exact ties to the voiced source)
        bv, av = acc[:b], arg[:b]
        bu, au = acc[b:], arg[b:]
        sv, su = bv + log_stay, bu + log_switch
        pick_v = su > sv  # source is the unvoiced track
        new_v = obs[:b] + jnp.where(pick_v, su, sv)
        off_v = jnp.where(pick_v, au, av)
        sv2, su2 = bv + log_switch, bu + log_stay
        pick_u = su2 > sv2
        new_u = obs[b:] + jnp.where(pick_u, su2, sv2)
        off_u = jnp.where(pick_u, au, av)
        d_scr[...] = jnp.concatenate([new_v, new_u], axis=0)
        # centered offsets (off - half) fit int8 for any supported kernel
        off_ref[0] = (
            jnp.concatenate([off_v, off_u], axis=0) - half
        ).astype(jnp.int8)
        pick_ref[0] = jnp.concatenate(
            [pick_v, pick_u], axis=0
        ).astype(jnp.int8)

    d_ref[...] = d_scr[...]


def pyin_viterbi_forward(
    log_obs_v: jnp.ndarray,
    log_obs_u: jnp.ndarray,
    log_kernel: np.ndarray,
    log_init: float,
    log_stay: float,
    log_switch: float,
    interpret: bool = False,
):
    """Fused forward pass. ``log_obs_v/u`` are ``[F, B, n_bins]`` (B may be
    1 for a single signal). Returns ``(dv, du, off, pick)``: final messages
    ``[B, n_bins]`` each, and per-step backpointers ``off`` int8 /
    ``pick`` int8 ``[F, 2, B, n_bins]`` (track axis: 0 voiced, 1 unvoiced).
    ``off`` is the CENTERED kernel offset (true offset minus half — int8-
    safe for any supported kernel width; the caller adds half back) and
    ``pick`` means "source is the unvoiced track", matching the XLA
    emissions; rows ``1:`` feed the standard backtrace (row 0 is the init
    step — no transition, all zeros).
    """
    f, batch, n_bins = log_obs_v.shape
    lk = np.asarray(log_kernel, np.float64).astype(np.float32)
    half = (len(lk) - 1) // 2
    w = -(-(n_bins + 2 * half) // 128) * 128
    b = -(-batch // 8) * 8  # sublane-pad the batch
    dtype = jnp.float32

    obs = jnp.full((f, 2 * b, w), _NEG, dtype)
    obs = obs.at[:, :batch, half : half + n_bins].set(log_obs_v.astype(dtype))
    obs = obs.at[:, b : b + batch, half : half + n_bins].set(
        log_obs_u.astype(dtype)
    )

    kernel = functools.partial(
        _kernel,
        lk=tuple(float(v) for v in lk),
        half=half,
        w=w,
        b=b,
        log_init=float(log_init),
        log_stay=float(log_stay),
        log_switch=float(log_switch),
        interpret=interpret,
    )
    d, off, pick = pl.pallas_call(
        kernel,
        grid=(f,),
        in_specs=[
            pl.BlockSpec((1, 2 * b, w), lambda t: (t, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=[
            pl.BlockSpec((2 * b, w), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * b, w), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * b, w), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((2 * b, w), dtype),
            jax.ShapeDtypeStruct((f, 2 * b, w), jnp.int8),
            jax.ShapeDtypeStruct((f, 2 * b, w), jnp.int8),
        ],
        scratch_shapes=[pltpu.VMEM((2 * b, w), dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(obs)
    sl = slice(half, half + n_bins)
    off4 = off.reshape(f, 2, b, w)[:, :, :batch, sl]
    pick4 = pick.reshape(f, 2, b, w)[:, :, :batch, sl]
    return d[:batch, sl], d[b : b + batch, sl], off4, pick4
