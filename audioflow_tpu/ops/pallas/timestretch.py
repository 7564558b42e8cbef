"""Fused Pallas time-stretch: STFT -> phase vocoder -> ISTFT in one kernel.

The XLA path (ops.phase_vocoder + ops.stft/istft) is HBM-bound: frames,
spectrograms, phases and overlap-add buffers — each ~4-8x the signal size —
round-trip through HBM between stages (measured 56-70 ms at batch 256 on TPU
v5e, stage profile in BENCHMARKS.md). This kernel keeps the whole round trip
in VMEM per tile: the only HBM traffic is the input signal once and the
output samples once, plus the resident DFT banks.

Per grid step (one 8-row batch block x one tile of ``tile`` output frames):

1. forward windowed real DFT of the tile's input frames as ``k = n_fft/hop``
   segment dots against VMEM-resident cos/sin banks (analysis window folded
   in — same banks as ops.stft(impl="matmul"));
2. per-input-frame magnitude + consecutive-frame *increment phasors*
   ``u[t] = s[t+1]*conj(s[t]) / (|s[t+1]||s[t]|)`` — the trig-free form of
   the classic ``phi_adv + wrap(dphase)`` increment (exp() cancels both the
   expected advance and the wrap; see ops.phase_vocoder.increment_phasors);
3. fractional-position selection (lo/hi frames) via masked ``pltpu.roll``
   passes — the shift set ``src(u) - u`` is small for rates near 1, so
   selection is a few VPU passes instead of a gather;
4. exclusive cumulative phasor product (Hillis-Steele with ``pltpu.roll``,
   O(log tile) passes), seeded by the phase phasor carried in VMEM scratch
   across time tiles (renormalized each tile so |z| cannot drift);
5. inverse real DFT (synthesis window folded into the iDFT banks) and
   overlap-add via rolled partial sums, with the (n_fft-hop)-sample tail
   carried in scratch to the next tile.

The host wrapper reproduces ops.time_stretch semantics: center/reflect
padding, ``out_len = round(T*q/p)``, and the offline window-square (WOLA)
normalization — so outputs match the XLA path to float tolerance. Known
convention difference: at the very tail the XLA path clamps ``hi`` to the
last frame while the kernel interpolates toward the zero padding; this only
affects trailing samples when the final fractional position is non-integral.

Supported statically: rational rate p/q (auto-derived from the float rate),
hop | n_fft, and a tile size that keeps the selection shift set small; the
public ``supported()`` predicate gates dispatch, and ops.time_stretch falls
back to the XLA path otherwise.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from fractions import Fraction
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ...utils import cdiv
from ..framing import overlap_add
from ..stft import _dft_banks, _idft_banks
from ..windows import get_window

from .common import (
    PALLAS_OK as _PALLAS_OK,
    PRECISIONS as _PRECISIONS,
    ROWS as _ROWS,
    make_dot as _make_dot,
    np_hi_lo as _np_hi_lo,
    raw_dot as _raw_dot,
    roll as _common_roll,
    split_hi_lo as _split_hi_lo,
)

if _PALLAS_OK:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

_MAX_SHIFTS = 24  # selection-pass budget; larger sets fall back to XLA


@dataclass(frozen=True)
class _Plan:
    p: int
    q: int
    tile: int  # output frames per grid step (multiple of q and of 8)
    a: int  # input-frame advance per tile = tile*p/q
    ft: int  # valid input frames per tile (a + 1)
    ft_pad: int  # ft rounded up to a multiple of 8
    n_rows: int  # hop-rows of signal per tile = ft_pad + k - 1
    k: int  # n_fft // hop
    shifts: tuple[int, ...]  # distinct values of (u*p)//q - u for u < tile
    contiguous: bool  # floor(r*p/q) == r for r < q: selection is reshape+slice


def _rationalize(rate: float, max_den: int = 12) -> tuple[int, int] | None:
    fr = Fraction(rate).limit_denominator(max_den)
    if fr.numerator <= 0 or abs(float(fr) - rate) > 1e-9:
        return None
    return fr.numerator, fr.denominator


_VMEM_BUDGET = int(14.8 * 2**20)  # the model under-predicts the compiler's
# scoped-vmem accounting by ~0.7 MiB (tile=64 est. 15.3 vs measured 16.02),
# so this keeps actual usage ~15.5 MiB under the 16 MiB limit


def _vmem_estimate(tile: int, ft_pad: int, n_rows: int, n_fft: int, hop: int) -> int:
    """Peak-VMEM model (f32; lanes pad to 128, sublanes to 8): resident
    banks + double-buffered in/out blocks + scratch + live temporaries.
    Calibrated on v5e: tile=64/ft_pad=88 at n_fft=1024 predicts 16.08 MB vs
    the compiler's measured 16.02 MB."""
    def pad(n, m):
        return cdiv(n, m) * m

    n_bins = n_fft // 2 + 1
    banks = 2 * n_fft * pad(n_bins, 128) * 4 + 2 * pad(n_bins, 8) * n_fft * 4
    io = _ROWS * (pad(n_rows, 8) + tile) * hop * 4 * 2
    scratch = _ROWS * tile * hop * 4 + 2 * _ROWS * 8 * pad(n_bins, 128) * 4
    # slow-downs pad the _select frame axis up to tile, so the live
    # selection temporaries are max(ft_pad, tile)-sized
    temps = (max(ft_pad, tile) + tile) * _ROWS * pad(n_bins, 128) * 4
    return banks + io + scratch + temps


def _make_plan(p: int, q: int, n_fft: int, hop: int) -> _Plan | None:
    if n_fft % hop:
        return None
    k = n_fft // hop
    lcmq = math.lcm(q, _ROWS)
    # largest tile <= 64 (multiple of lcm(q, 8)) whose selection shift set is
    # small AND whose working set fits VMEM
    tile = (64 // lcmq) * lcmq
    while tile >= lcmq:
        u = np.arange(tile)
        shifts = np.unique((u * p) // q - u)
        a = tile * p // q
        ft_pad = cdiv(a + 1, _ROWS) * _ROWS
        n_rows = ft_pad + k - 1
        if (
            len(shifts) <= _MAX_SHIFTS
            and _vmem_estimate(tile, ft_pad, n_rows, n_fft, hop) <= _VMEM_BUDGET
        ):
            break
        tile -= lcmq
    else:
        return None
    a = tile * p // q
    ft = a + 1
    ft_pad = cdiv(ft, _ROWS) * _ROWS
    n_rows = ft_pad + k - 1
    if n_rows > 2 * a:  # two-shifted-reshape tiling needs span <= 2*stride
        return None
    u = np.arange(tile)
    shifts = tuple(int(s) for s in np.unique((u * p) // q - u))
    d = (np.arange(q) * p) // q
    contiguous = bool(np.array_equal(d, np.arange(q)))
    return _Plan(p, q, tile, a, ft, ft_pad, n_rows, k, shifts, contiguous)


def supported(rate: float, n_fft: int = 1024, hop: int = 256) -> bool:
    """True when the fused kernel handles this (rate, n_fft, hop) config."""
    if not _PALLAS_OK:
        return False
    pq = _rationalize(rate)
    if pq is None:
        return False
    return _make_plan(pq[0], pq[1], n_fft, hop) is not None


# --------------------------------------------------------------------------
# kernel
# --------------------------------------------------------------------------

_roll = _common_roll


def _select(x, plan: _Plan, extra: int, row, interpret=False):
    """y[.., u, :] = x[.., (u*p)//q + extra, :] for u < tile.

    Fast path (``plan.contiguous``: q==1 or p==q+1, i.e. the common stretch
    family 1.25/1.33/1.5/2x and all integer rates): the per-group offsets
    floor(r*p/q) are exactly 0..q-1, so selection is a sublane reshape +
    slice — two relayout copies instead of |shifts| masked-roll passes
    (measured 258 -> ~15 MB of VMEM traffic per tile at rate 1.25).

    Fallback: one masked ``pltpu.roll`` pass per distinct shift value of
    (u*p)//q - u. ``row`` is the broadcasted sublane iota of x's shape.
    Either way the result is [.., tile, :].
    """
    r, ft_pad, b = x.shape
    if plan.contiguous:
        g = plan.tile // plan.q
        xs = x[:, extra : extra + g * plan.p, :].reshape(r, g, plan.p, b)
        return xs[:, :, : plan.q, :].reshape(r, plan.tile, b)
    if ft_pad < plan.tile:
        # slow-down (p < q): more output rows than input frames. The rolls
        # need the frame axis at least tile long; zero-pad it (tile is a
        # multiple of 8, so sublane alignment holds) — the mask below only
        # ever selects x[(u*p)//q + extra] <= a + 1 < ft_pad, never padding.
        x = jnp.concatenate(
            [x, jnp.zeros((r, plan.tile - ft_pad, b), x.dtype)], axis=1
        )
        row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    shift_of_row = (row * plan.p) // plan.q - row + extra
    y = jnp.zeros_like(x)
    for s in [s + extra for s in plan.shifts]:
        # rolled[u] = x[u + s]
        rolled = _roll(x, -s, 1, interpret)
        y = y + jnp.where((row < plan.tile) & (shift_of_row == s), rolled, 0.0)
    return y[:, : plan.tile, :]


def _cumprod_phasor(ur, ui, tile, row, interpret=False):
    """Inclusive Hillis-Steele prefix product of unit phasors along axis 1.

    (A lane-concatenated variant — one wide roll of (re, im) per pass instead
    of two — was measured 3% SLOWER at batch 256: Mosaic's roll cost scales
    with bytes, so fusing the planes buys nothing and the concat adds a copy.
    Same result for the step-2/3 rolls and selects; see BENCHMARKS.md.)"""
    zr, zi = ur, ui
    s = 1
    while s < tile:
        rr = _roll(zr, s, 1, interpret)
        ri = _roll(zi, s, 1, interpret)
        take = row >= s
        pr = jnp.where(take, rr, 1.0)
        pi = jnp.where(take, ri, 0.0)
        zr, zi = zr * pr - zi * pi, zr * pi + zi * pr
        s *= 2
    return zr, zi


def _kernel(
    *refs, plan: _Plan, hop, n_fft, n_bins, precision, inv_precision, interpret,
):
    # inputs: sig, cos, sin, ci, si, [cos_lo, sin_lo] if fwd high,
    # [ci_lo, si_lo] if inv high; then out, then scratch (zr, zi, tail).
    it = iter(refs)
    sig_ref, cos_ref, sin_ref, ci_ref, si_ref = (next(it) for _ in range(5))
    cos_lo = sin_lo = ci_lo = si_lo = None
    if precision == "high":
        cos_lo, sin_lo = next(it), next(it)
    if inv_precision == "high":
        ci_lo, si_lo = next(it), next(it)
    out_ref, zr_ref, zi_ref, tl_ref = next(it), next(it), next(it), next(it)

    t = pl.program_id(1)
    dot = _make_dot(precision)
    dot_inv = dot if inv_precision == precision else _make_dot(inv_precision)

    k, ft_pad, tile = plan.k, plan.ft_pad, plan.tile
    sig = sig_ref[0]  # [ROWS, n_rows, hop]

    # 1. forward windowed rDFT as k segment dots (frames never materialized);
    # in "high" mode the segment's hi/lo split is shared by the cos and sin
    # dots, and the bank splits are VMEM-resident (see _make_dot)
    def seg(j):
        return sig[:, j : j + ft_pad, :].reshape(_ROWS * ft_pad, hop)

    re = im = None
    for j in range(k):
        s = seg(j)
        sl = slice(j * hop, (j + 1) * hop)
        if precision == "high":
            a_hi, a_lo = _split_hi_lo(s)
            d = jax.lax.Precision.DEFAULT
            ch, cl = cos_ref[sl, :], cos_lo[sl, :]
            sh, sn = sin_ref[sl, :], sin_lo[sl, :]
            re_j = _raw_dot(a_hi, ch, d) + _raw_dot(a_hi, cl, d) + _raw_dot(a_lo, ch, d)
            im_j = _raw_dot(a_hi, sh, d) + _raw_dot(a_hi, sn, d) + _raw_dot(a_lo, sh, d)
        else:
            re_j = dot(s, (cos_ref[sl, :], None))
            im_j = dot(s, (sin_ref[sl, :], None))
        re = re_j if re is None else re + re_j
        im = im_j if im is None else im + im_j
    re3 = re.reshape(_ROWS, ft_pad, n_bins)
    im3 = im.reshape(_ROWS, ft_pad, n_bins)

    # 2. per-input-frame magnitudes + unit increment phasors u[t] ~ s[t+1]conj(s[t])
    mag = jnp.sqrt(re3 * re3 + im3 * im3)
    r1 = _roll(re3, -1, 1, interpret)
    i1 = _roll(im3, -1, 1, interpret)
    m1 = _roll(mag, -1, 1, interpret)
    uvr = r1 * re3 + i1 * im3
    uvi = i1 * re3 - r1 * im3
    denom = m1 * mag
    ok = denom > 0
    safe = jnp.where(ok, denom, 1.0)
    ur_in = jnp.where(ok, uvr / safe, 1.0)
    ui_in = jnp.where(ok, uvi / safe, 0.0)

    # 3. fractional-position selection (masked rolls, no gather)
    row_ft = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, ft_pad, n_bins), 1)
    mag_lo = _select(mag, plan, 0, row_ft, interpret)
    mag_hi = _select(mag, plan, 1, row_ft, interpret)
    u_r = _select(ur_in, plan, 0, row_ft, interpret)
    u_i = _select(ui_in, plan, 0, row_ft, interpret)

    row = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, tile, n_bins), 1)
    frac = ((row * plan.p) % plan.q).astype(jnp.float32) * (1.0 / plan.q)
    mag_o = (1.0 - frac) * mag_lo + frac * mag_hi

    # 4. phase accumulation: carry (zr,zi) seeded with unit(s[0]) at t == 0
    @pl.when(t == 0)
    def _init():
        m0 = mag[:, 0:1, :]
        ok0 = m0 > 0
        s0 = jnp.where(ok0, m0, 1.0)
        zr_ref[...] = jnp.where(ok0, re3[:, 0:1, :] / s0, 1.0)
        zi_ref[...] = jnp.where(ok0, im3[:, 0:1, :] / s0, 0.0)
        tl_ref[...] = jnp.zeros(tl_ref.shape, tl_ref.dtype)

    incl_r, incl_i = _cumprod_phasor(u_r, u_i, tile, row, interpret)
    # exclusive prefix: shift down one, row 0 -> identity phasor
    exc_r = jnp.where(row >= 1, _roll(incl_r, 1, 1, interpret), 1.0)
    exc_i = jnp.where(row >= 1, _roll(incl_i, 1, 1, interpret), 0.0)
    zr = zr_ref[...]
    zi = zi_ref[...]
    zo_r = zr * exc_r - zi * exc_i
    zo_i = zr * exc_i + zi * exc_r
    s_re = (mag_o * zo_r).reshape(_ROWS * tile, n_bins)
    s_im = (mag_o * zo_i).reshape(_ROWS * tile, n_bins)

    # carry = old carry * full product, renormalized so |z| cannot drift
    lr = incl_r[:, tile - 1 : tile, :]
    li = incl_i[:, tile - 1 : tile, :]
    nr = zr * lr - zi * li
    ni = zr * li + zi * lr
    nmag = jnp.sqrt(nr * nr + ni * ni)
    nok = nmag > 0
    nsafe = jnp.where(nok, nmag, 1.0)
    zr_ref[...] = jnp.where(nok, nr / nsafe, 1.0)
    zi_ref[...] = jnp.where(nok, ni / nsafe, 0.0)

    # 5. inverse rDFT (synthesis window folded into ci/si) + overlap-add
    frames = dot_inv(
        s_re, (ci_ref[...], ci_lo[...] if ci_lo is not None else None)
    ) + dot_inv(s_im, (si_ref[...], si_lo[...] if si_lo is not None else None))
    of3 = frames.reshape(_ROWS, tile, n_fft)
    row_h = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, tile, hop), 1)
    # tail scratch only has nonzeros in rows < k-1 (built below); plain add
    emit = of3[..., 0:hop] + tl_ref[...]
    tail = jnp.zeros((_ROWS, tile, hop), jnp.float32)
    for j in range(1, k):
        rolled = _roll(of3[..., j * hop : (j + 1) * hop], j, 1, interpret)
        emit = emit + jnp.where(row_h >= j, rolled, 0.0)
        tail = tail + jnp.where(row_h < j, rolled, 0.0)
    tl_ref[...] = tail
    out_ref[0] = emit


# --------------------------------------------------------------------------
# host wrapper
# --------------------------------------------------------------------------

@partial(
    jax.jit,
    static_argnames=(
        "rate", "n_fft", "hop", "window", "precision", "inv_precision", "interpret",
    ),
)
def time_stretch_pallas(
    x: jnp.ndarray,
    rate: float,
    n_fft: int = 1024,
    hop: int = 256,
    window: str = "hann",
    precision: str = "highest",
    inv_precision: str | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused time stretch of ``x [batch, T]`` (or ``[T]``) by ``1/rate``.

    Semantics match ``ops.time_stretch(x, rate, n_fft, hop, impl="matmul")``
    (center=True STFT, WOLA ISTFT, length = round(T/rate)); see the module
    docstring for the one tail-frame convention difference.
    """
    if not _PALLAS_OK:
        raise RuntimeError("pallas unavailable in this JAX build")
    if precision not in _PRECISIONS:
        raise ValueError(f"unknown precision {precision!r}; known: {sorted(_PRECISIONS)}")
    if inv_precision is None:
        inv_precision = precision
    if inv_precision not in _PRECISIONS:
        raise ValueError(
            f"unknown inv_precision {inv_precision!r}; known: {sorted(_PRECISIONS)}"
        )
    if x.ndim == 1:
        return time_stretch_pallas(
            x[None], rate, n_fft, hop, window, precision, inv_precision, interpret
        )[0]
    if x.ndim != 2:
        raise ValueError(f"expected [batch, T] or [T], got shape {x.shape}")
    pq = _rationalize(rate)
    if pq is None:
        raise ValueError(f"rate {rate} is not a small rational; use the XLA path")
    p, q = pq
    plan = _make_plan(p, q, n_fft, hop)
    if plan is None:
        raise ValueError(
            f"unsupported (rate={rate}, n_fft={n_fft}, hop={hop}) for the fused kernel"
        )
    batch, t_sig = x.shape
    n_bins = n_fft // 2 + 1
    t_in_frames = t_sig // hop + 1  # frames of the center-padded signal
    t_out_off = cdiv(t_in_frames * q, p)  # == len(np.arange(0, t_in, p/q))
    out_len = int(round(t_sig * q / p))
    f_out_need = cdiv(n_fft // 2 + out_len, hop)
    # floor at 2 tiles: with a single-tile grid the whole output array is one
    # block and XLA promotes it (and the input) into VMEM next to the
    # kernel's ~15 MB working set — observed scoped-vmem OOM (21.1 MB > 16)
    # on 1 s mono inputs. One spare tile of compute is noise on short clips.
    n_tiles = max(2, cdiv(f_out_need, plan.tile))
    f_out = n_tiles * plan.tile

    # ---- tile the center-padded signal into [n_tiles, B_pad, n_rows, hop]
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    # enough rows for the tile reshapes AND the whole padded signal
    rows_total = max(n_tiles * plan.a + plan.n_rows, cdiv(xp.shape[-1], hop))
    xp = jnp.pad(xp, ((0, 0), (0, rows_total * hop - xp.shape[-1])))
    xr = xp.reshape(batch, rows_total, hop)
    head = xr[:, : n_tiles * plan.a].reshape(batch, n_tiles, plan.a, hop)
    tail = xr[:, plan.a : plan.a + n_tiles * plan.a].reshape(batch, n_tiles, plan.a, hop)
    tiles = jnp.concatenate([head, tail[:, :, : plan.n_rows - plan.a]], axis=2)
    b_pad = cdiv(batch, _ROWS) * _ROWS
    if b_pad != batch:
        tiles = jnp.pad(tiles, ((0, b_pad - batch), (0, 0), (0, 0), (0, 0)))
    tiles = jnp.transpose(tiles, (1, 0, 2, 3))  # [n_tiles, B_pad, n_rows, hop]

    # ---- banks (host-designed f64 -> f32, shared with the XLA path)
    cosb, sinb = _dft_banks(n_fft, window, None)
    ci, si = _idft_banks(n_fft)
    w = get_window(window, n_fft, periodic=True)
    ciw = (ci * w[None, :]).astype(np.float32)
    siw = (si * w[None, :]).astype(np.float32)

    np_hi_lo = _np_hi_lo  # host-side hi/lo split (ops/pallas/common.py)

    # In "high" mode the bank passed as the dot's hi operand MUST itself be
    # bf16-representable (the lo residual is computed against that rounding);
    # shipping the full-f32 bank as "hi" double-counts the residual wherever
    # the dot doesn't truncate (CPU interpret; and Mosaic may keep f32 too).
    if precision == "high":
        (cosb, cos_lo), (sinb, sin_lo) = np_hi_lo(cosb), np_hi_lo(sinb)
    if inv_precision == "high":
        (ciw, ci_lo), (siw, si_lo) = np_hi_lo(ciw), np_hi_lo(siw)

    fwd_spec = pl.BlockSpec((n_fft, n_bins), lambda r, t: (0, 0), memory_space=pltpu.VMEM)
    inv_spec = pl.BlockSpec((n_bins, n_fft), lambda r, t: (0, 0), memory_space=pltpu.VMEM)
    inputs = [tiles, jnp.asarray(cosb), jnp.asarray(sinb), jnp.asarray(ciw), jnp.asarray(siw)]
    in_specs = [
        pl.BlockSpec(
            (1, _ROWS, plan.n_rows, hop), lambda r, t: (t, r, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        fwd_spec, fwd_spec, inv_spec, inv_spec,
    ]
    if precision == "high":  # VMEM-resident bank residuals (see _make_dot)
        inputs += [jnp.asarray(cos_lo), jnp.asarray(sin_lo)]
        in_specs += [fwd_spec, fwd_spec]
    if inv_precision == "high":
        inputs += [jnp.asarray(ci_lo), jnp.asarray(si_lo)]
        in_specs += [inv_spec, inv_spec]

    kernel = partial(
        _kernel, plan=plan, hop=hop, n_fft=n_fft, n_bins=n_bins,
        precision=precision, inv_precision=inv_precision, interpret=interpret,
    )
    grid = (b_pad // _ROWS, n_tiles)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, _ROWS, plan.tile, hop), lambda r, t: (t, r, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, b_pad, plan.tile, hop), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_ROWS, 1, n_bins), jnp.float32),  # phase carry re
            pltpu.VMEM((_ROWS, 1, n_bins), jnp.float32),  # phase carry im
            pltpu.VMEM((_ROWS, plan.tile, hop), jnp.float32),  # OLA tail
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # the kernel budgets ~15 MB of VMEM for itself (plus up to 8.4 MB
            # of resident bank residuals in "high" modes); on small inputs
            # XLA additionally promotes the whole (sub-MB) output array into
            # VMEM, which blows the default 16 MB scoped limit (observed
            # 17.9 MB on a 1 s mono clip). Physical VMEM is far larger;
            # raise the scoped limit so short clips compile.
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*inputs)

    y = jnp.transpose(out, (1, 0, 2, 3)).reshape(b_pad, f_out * hop)[:batch]

    # ---- WOLA normalization with the offline frame count, then center trim
    wsq = overlap_add(
        jnp.broadcast_to(jnp.asarray((w * w).astype(np.float32)), (t_out_off, n_fft)), hop
    )
    m = min(int(wsq.shape[-1]), f_out * hop)
    wsum = jnp.zeros((f_out * hop,), jnp.float32).at[:m].set(wsq[:m])
    y = y / jnp.maximum(wsum, 1e-11)
    return y[:, n_fft // 2 : n_fft // 2 + out_len]
