"""Fused Griffin-Lim projection kernel (Pallas/Mosaic, TPU).

The XLA Griffin-Lim (ops/griffinlim.py) runs n_iter full STFT <-> ISTFT
round trips; every iteration materializes the [F, n_fft] frame tensor and
the signal in HBM twice (once per direction) plus the momentum/magnitude-
replacement elementwise passes — measured 46.1 ms for 8 iterations at
batch 64 x 10 s (BENCHMARKS.md). This kernel fuses ONE WHOLE ITERATION
(momentum extrapolation -> magnitude replacement -> inverse DFT -> WOLA
overlap-add -> forward windowed DFT) into a single VMEM-resident pass per
spectrogram tile: the time-domain signal exists only in kernel scratch and
the only HBM traffic per iteration is the [F, n_bins] state planes.

Structure (follows ops/pallas/timestretch.py, the first fused kernel):

* grid = (batch/8, n_tiles + 1), sequential; per step one `tile`-frame
  block of the spectrogram is synthesized and overlap-added into a hop-row
  stream, with the k-1 overflow rows carried in scratch exactly like the
  streaming ISTFT tail.
* re-analysis is DELAYED BY ONE TILE: frame f's analysis window needs
  synthesized rows [f, f+k), which are complete only once tile t+1 has
  emitted its first k-1 rows. Step t therefore analyzes tile t-1 (scratch
  keeps the previous emitted tile), and one extra flush step drains the
  last tile. Output blocks land on the SAME tiling as the inputs, so
  iterations chain with zero re-alignment copies.
* iteration math is librosa's fast Griffin-Lim re-rooted in the rebuilt
  spectra: with r_j = stft(istft(spec_j)) and r_{-1} = r_{-2} := mag *
  exp(i*init_phase), every call computes spec_j = mag * unit(r_{j-1} +
  momentum*(r_{j-1} - r_{j-2})) in its prologue and returns r_j —
  identical to the reference update including the |a| <= 1e-16 guard.

Edge convention (documented difference, like the timestretch tail frame):
the XLA path's stft-of-istft reflect-pads the center-trimmed signal, so
its first/last k/2 frames see reflected samples; this kernel analyzes the
raw overlap-add row stream. Interior frames are exact; reconstruction
quality is gated end-to-end by `griffinlim_tone_err` in `audioflow
validate`. The convergence delta vs the XLA path scales with the edge
fraction: spectral convergence measured on chip (8 iters, 440+880 Hz
tone) 0.188 vs 0.166 at 1 s, 0.168 vs 0.164 at 4 s, 0.1646 vs 0.1631 at
10 s — and slightly BETTER than XLA at the batch-64 x 10 s bench config
(0.2241 vs 0.2278).

Banks are shipped as bfloat16: the shipped griffin_lim precision default
is "default" (one-pass bf16 dots — magnitude replacement renormalizes
every iteration, see ops/griffinlim.py), where the MXU truncates operands
to bf16 anyway, so bf16 storage is bit-identical and halves bank VMEM.

Reference behavior: librosa.griffinlim (Perraudin et al. 2013 momentum
update), same convention as ops/griffinlim.py::griffin_lim.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ...utils import cdiv
from ..stft import _dft_banks, _idft_banks, istft
from ..windows import get_window
from .common import PALLAS_OK as _PALLAS_OK, ROWS as _ROWS, roll as _roll

if _PALLAS_OK:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu


def supported(
    n_fft: int = 1024,
    hop: int = 256,
    win_length: int | None = None,
    precision: str = "default",
) -> bool:
    """True when the fused iteration kernel handles this config.

    Must mirror griffin_lim_pallas's own feasibility checks exactly —
    impl='auto' dispatches on this answer, so a True here for a config the
    kernel then rejects (or mis-slices) turns into a trace-time crash.
    """
    if not _PALLAS_OK:
        return False
    if win_length is not None and win_length != n_fft:
        return False
    if n_fft % hop or n_fft // hop < 2:
        return False
    state_bytes = 2 if precision == "default" else 4
    return _pick_tile(n_fft, hop, state_bytes) is not None


_VMEM_BUDGET = int(30 * 2**20)  # physical VMEM is ~128 MB; like the
# timestretch kernel we raise the scoped limit past the 16 MB default
# (vmem_limit_bytes below) and budget well under the raise


def _vmem_estimate(tile: int, n_fft: int, hop: int, state_bytes: int = 2) -> int:
    """Peak-VMEM model: bf16 banks + double-buffered state blocks + scratch
    + the big live temporaries (frames tensor, spec planes)."""
    def pad(n, m):
        return cdiv(n, m) * m

    n_bins = n_fft // 2 + 1
    lanes = pad(n_bins, 128)
    banks = 2 * n_fft * lanes * 2 + 2 * pad(n_bins, 8) * n_fft * 2  # bf16
    blk = _ROWS * tile * lanes
    io = (5 + 2) * blk * state_bytes * 2  # 5 in + 2 out planes, dbuffered
    inv = tile * hop * 4 * 2
    scratch = 2 * _ROWS * tile * hop * 4  # tail + prev-emit buffer
    temps = 6 * blk * 4 + _ROWS * tile * n_fft * 4  # f32 chains + frames
    return banks + io + inv + scratch + temps


def _pick_tile(n_fft: int, hop: int, state_bytes: int = 2) -> int | None:
    # OLA-carry constraint: the delayed analysis concatenates the previous
    # emitted tile with the first k-1 rows of the current one
    # (_kernel step 4) — a tile shorter than k-1 rows would silently clamp
    # that slice and mis-shape the frame gather. tile >= k - 1 is a hard
    # feasibility bound, not a tuning choice.
    k = n_fft // hop
    for tile in (64, 56, 48, 40, 32, 24, 16, 8):
        if tile < k - 1:
            break
        if _vmem_estimate(tile, n_fft, hop, state_bytes) <= _VMEM_BUDGET:
            return tile
    return None


def _kernel(
    rp_re, rp_im, rp2_re, rp2_im, mag_ref, inv_ref, cos_ref, sin_ref,
    ci_ref, si_ref, o_re, o_im, tl_ref, buf_ref,
    *, tile, k, hop, n_fft, n_bins, n_tiles, momentum, precision, interpret,
):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        tl_ref[...] = jnp.zeros(tl_ref.shape, tl_ref.dtype)
        buf_ref[...] = jnp.zeros(buf_ref.shape, buf_ref.dtype)

    # 1. prologue: momentum extrapolation + magnitude replacement. Blocks
    # may be stored bfloat16 in HBM (state traffic halves; magnitude
    # replacement renormalizes every iteration, so storage rounding does
    # not accumulate — same argument as the bf16 banks); compute is f32.
    # librosa: accel = r + m*(r - prev); spec = mag * accel/max(|accel|,eps)
    f32 = jnp.float32
    m = f32(momentum)
    a_re = (1.0 + m) * rp_re[0].astype(f32) - m * rp2_re[0].astype(f32)
    a_im = (1.0 + m) * rp_im[0].astype(f32) - m * rp2_im[0].astype(f32)
    amag = jnp.sqrt(a_re * a_re + a_im * a_im)
    guard = jnp.maximum(amag, 1e-16)
    s_re = mag_ref[0].astype(f32) * (a_re / guard)
    s_im = mag_ref[0].astype(f32) * (a_im / guard)

    if precision == "default":  # bf16 one-pass; banks stored bf16
        def dot(a, b_ref, rows=None):
            b = b_ref[...] if rows is None else b_ref[rows, :]
            return jax.lax.dot_general(
                a.astype(jnp.bfloat16), b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    else:  # "highest": f32 operands, bf16x6 on MXU (exact in interpret)
        def dot(a, b_ref, rows=None):
            b = b_ref[...] if rows is None else b_ref[rows, :]
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )

    # 2. inverse rDFT (synthesis window folded into the banks) -> frames
    frames = dot(s_re.reshape(_ROWS * tile, n_bins), ci_ref) + dot(
        s_im.reshape(_ROWS * tile, n_bins), si_ref
    )
    of3 = frames.reshape(_ROWS, tile, n_fft)

    # 3. overlap-add into the hop-row stream; k-1 overflow rows carried.
    # The flush step (t == n_tiles) synthesizes a clamped junk tile; mask
    # its contribution so only the carried tail drains.
    live = (t < n_tiles).astype(jnp.float32)
    row_h = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, tile, hop), 1)
    emit = of3[..., 0:hop]
    tail = jnp.zeros((_ROWS, tile, hop), jnp.float32)
    for j in range(1, k):
        rolled = _roll(of3[..., j * hop : (j + 1) * hop], j, 1, interpret)
        emit = emit + jnp.where(row_h >= j, rolled, 0.0)
        tail = tail + jnp.where(row_h < j, rolled, 0.0)
    emit = live * emit + tl_ref[...]
    tl_ref[...] = live * tail
    emit = emit * inv_ref[...][None]  # WOLA row normalization

    # 4. delayed analysis: frames of tile t-1 need rows
    # [(t-1)*tile, t*tile + k - 2] = previous emit + first k-1 current rows
    sig = jnp.concatenate([buf_ref[...], emit[:, : k - 1, :]], axis=1)
    buf_ref[...] = emit

    re = im = None
    for j in range(k):
        seg = sig[:, j : j + tile, :].reshape(_ROWS * tile, hop)
        sl = slice(j * hop, (j + 1) * hop)
        re_j = dot(seg, cos_ref, sl)
        im_j = dot(seg, sin_ref, sl)
        re = re_j if re is None else re + re_j
        im = im_j if im is None else im + im_j
    o_re[0] = re.reshape(_ROWS, tile, n_bins).astype(o_re.dtype)
    o_im[0] = im.reshape(_ROWS, tile, n_bins).astype(o_im.dtype)


@partial(
    jax.jit,
    static_argnames=(
        "n_fft", "hop", "window", "n_iter", "momentum", "length",
        "precision", "interpret", "_debug_rebuilt",
    ),
)
def griffin_lim_pallas(
    mag: jnp.ndarray,
    n_fft: int = 1024,
    hop: int = 256,
    window: str = "hann",
    n_iter: int = 32,
    momentum: float = 0.99,
    length: int | None = None,
    init_phase: jnp.ndarray | None = None,
    precision: str = "default",
    interpret: bool = False,
    _debug_rebuilt: bool = False,
) -> jnp.ndarray:
    """Griffin-Lim via the fused per-iteration kernel.

    Semantics match ``ops.griffin_lim(mag, ..., impl="matmul",
    precision="default", center=True)`` up to the documented edge-frame
    convention (module docstring). ``mag`` is ``[..., F, n_fft//2+1]``.
    """
    if not _PALLAS_OK:
        raise RuntimeError("pallas unavailable in this JAX build")
    if not 0.0 <= momentum < 1.0:
        raise ValueError(f"momentum must be in [0, 1), got {momentum}")
    if n_iter < 1:
        raise ValueError(f"fused griffin_lim needs n_iter >= 1, got {n_iter}")
    if n_fft % hop or n_fft // hop < 2:
        raise ValueError(f"fused griffin_lim needs hop | n_fft, got {n_fft}/{hop}")
    # state planes live in HBM as bf16 in the shipped "default" mode (the
    # kernel computes in f32 either way); "highest" keeps f32 state so the
    # strict structural tests see exact arithmetic end to end
    sdt = jnp.bfloat16 if precision == "default" else jnp.float32
    tile = _pick_tile(n_fft, hop, 2 if sdt == jnp.bfloat16 else 4)
    if tile is None:
        raise ValueError(
            f"no feasible tile for n_fft={n_fft}, hop={hop}, "
            f"precision={precision!r}: the fused kernel needs a tile of at "
            f"least n_fft//hop - 1 = {n_fft // hop - 1} frames (OLA carry) "
            "within the VMEM budget — use impl='matmul' for this config"
        )
    mag = jnp.asarray(mag, jnp.float32)
    if mag.ndim == 1:
        raise ValueError("mag must be [..., F, n_fft//2 + 1]")
    lead = mag.shape[:-2]
    f_frames, n_bins = int(mag.shape[-2]), int(mag.shape[-1])
    if n_bins != n_fft // 2 + 1:
        raise ValueError(f"mag has {n_bins} bins; expected {n_fft // 2 + 1}")
    k = n_fft // hop
    batch = int(np.prod(lead)) if lead else 1
    mag2 = mag.reshape(batch, f_frames, n_bins)

    n_tiles = max(2, cdiv(f_frames, tile))  # >= 2: same scoped-vmem
    # promotion issue as the timestretch kernel on single-tile grids
    f_pad = n_tiles * tile
    b_pad = cdiv(batch, _ROWS) * _ROWS
    magp = jnp.pad(mag2, ((0, b_pad - batch), (0, f_pad - f_frames), (0, 0)))

    # initial state r_{-1} = r_{-2} = mag * exp(i*init_phase): the prologue
    # then yields spec_0 = mag * exp(i*init_phase) exactly (a = spec_0)
    if init_phase is None:
        r_re, r_im = magp, jnp.zeros_like(magp)
    else:
        ph = jnp.asarray(init_phase, jnp.float32).reshape(batch, f_frames, n_bins)
        ph = jnp.pad(ph, ((0, b_pad - batch), (0, f_pad - f_frames), (0, 0)))
        r_re, r_im = magp * jnp.cos(ph), magp * jnp.sin(ph)

    # WOLA row normalizer over the TRUE frame count (rows past the signal
    # keep 1.0 so the junk tail rows stay finite)
    w = get_window(window, n_fft, periodic=True).astype(np.float64)
    wsq = (w * w).reshape(k, hop)
    rows_true = f_frames + k - 1
    wsum = np.zeros(((n_tiles + 1) * tile, hop), np.float64)
    for j in range(k):
        lo, hi = j, min(j + f_frames, rows_true)
        wsum[lo:hi] += wsq[j]
    inv = np.where(wsum > 0, 1.0 / np.maximum(wsum, 1e-11), 1.0).astype(np.float32)

    if precision not in ("default", "highest"):
        raise ValueError(
            f"fused griffin_lim supports precision 'default' or 'highest', got {precision!r}"
        )
    cosb, sinb = _dft_banks(n_fft, window, None)
    ci, si = _idft_banks(n_fft)
    ciw = (np.asarray(ci, np.float64) * w[None, :]).astype(np.float32)
    siw = (np.asarray(si, np.float64) * w[None, :]).astype(np.float32)
    bdt = jnp.bfloat16 if precision == "default" else jnp.float32
    banks = [
        jnp.asarray(cosb, bdt), jnp.asarray(sinb, bdt),
        jnp.asarray(ciw, bdt), jnp.asarray(siw, bdt),
    ]
    inv_d = jnp.asarray(inv)

    last_tile = n_tiles - 1
    blk = lambda r, t: (r, 0, jnp.minimum(t, last_tile), 0)  # noqa: E731
    state_spec = pl.BlockSpec((1, _ROWS, tile, n_bins), blk, memory_space=pltpu.VMEM)
    inv_spec = pl.BlockSpec(
        (tile, hop), lambda r, t: (t, 0), memory_space=pltpu.VMEM
    )
    fwd_spec = pl.BlockSpec(
        (n_fft, n_bins), lambda r, t: (0, 0), memory_space=pltpu.VMEM
    )
    inv_bank_spec = pl.BlockSpec(
        (n_bins, n_fft), lambda r, t: (0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, _ROWS, tile, n_bins),
        lambda r, t: (r, 0, jnp.maximum(t - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )

    kernel = partial(
        _kernel, tile=tile, k=k, hop=hop, n_fft=n_fft, n_bins=n_bins,
        n_tiles=n_tiles, momentum=float(momentum), precision=precision,
        interpret=interpret,
    )
    # state planes are blocked [n_rows_grid, ROWS, f_pad, n_bins]
    shape4 = (b_pad // _ROWS, _ROWS, f_pad, n_bins)
    call = partial(
        pl.pallas_call,
        kernel,
        grid=(b_pad // _ROWS, n_tiles + 1),
        in_specs=[state_spec] * 5 + [inv_spec, fwd_spec, fwd_spec,
                                     inv_bank_spec, inv_bank_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct(shape4, sdt)] * 2,
        scratch_shapes=[
            pltpu.VMEM((_ROWS, tile, hop), jnp.float32),  # OLA tail carry
            pltpu.VMEM((_ROWS, tile, hop), jnp.float32),  # previous emit
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )()

    to4 = lambda a: a.reshape(shape4).astype(sdt)  # noqa: E731
    magb = to4(magp)

    # iteration 0 runs outside the loop: seeding r_{-1} = r_{-2} = mag *
    # exp(i*init_phase) makes the prologue produce spec_0 exactly, but
    # librosa's momentum history starts at prev_0 = 0, so the previous-
    # rebuilt slot is zeroed before the remaining iterations
    o_re, o_im = call(to4(r_re), to4(r_im), to4(r_re), to4(r_im),
                      magb, inv_d, *banks)
    if _debug_rebuilt:  # test hook: the raw projection stft(istft(spec_0))
        flat = lambda a: a.astype(jnp.float32).reshape(  # noqa: E731
            b_pad, f_pad, n_bins
        )[:batch, :f_frames]
        return jax.lax.complex(flat(o_re), flat(o_im)).reshape(
            *lead, f_frames, n_bins
        )
    zeros = jnp.zeros_like(o_re)
    state = (o_re, o_im, zeros, zeros)

    def body(_, st):
        r_re, r_im, r2_re, r2_im = st
        o_re, o_im = call(r_re, r_im, r2_re, r2_im, magb, inv_d, *banks)
        return o_re, o_im, r_re, r_im

    r_re4, r_im4, r2_re4, r2_im4 = jax.lax.fori_loop(0, n_iter - 1, body, state)

    # final spec (one more momentum + magnitude replacement, as librosa's
    # loop epilogue; f32, against the unrounded magnitude) and synthesis
    # through the shared XLA ISTFT
    mm_ = float(momentum)
    f32 = jnp.float32
    a_re = (1.0 + mm_) * r_re4.astype(f32) - mm_ * r2_re4.astype(f32)
    a_im = (1.0 + mm_) * r_im4.astype(f32) - mm_ * r2_im4.astype(f32)
    guard = jnp.maximum(jnp.sqrt(a_re * a_re + a_im * a_im), 1e-16)
    s_re = magp.reshape(shape4) * (a_re / guard)
    s_im = magp.reshape(shape4) * (a_im / guard)
    spec = jax.lax.complex(s_re, s_im).reshape(b_pad, f_pad, n_bins)
    spec = spec[:batch, :f_frames]
    y = istft(
        spec, n_fft, hop, window=window, center=True, length=length,
        impl="matmul", precision=precision,
    )
    return y.reshape(*lead, y.shape[-1])
