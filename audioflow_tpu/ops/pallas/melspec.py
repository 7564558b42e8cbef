"""Fused mel-spectrogram Pallas kernel.

One kernel tile = 128 STFT frames of one batch row. The tile's signal span
is DMA'd HBM->VMEM once; framing is built from static hop-strided slices (no
gather); the windowed real DFT runs as two MXU dots against VMEM-resident
cos/sin banks; power and the mel projection fuse in-register. The
[frames, n_fft] frame tensor and the [frames, n_bins] power spectrogram —
~5x the signal size — never touch HBM, unlike the XLA pipeline
(ops.spectrogram + ops.mel.apply_mel) this kernel is tested against.

Constraints: n_fft % hop == 0 (framing trick), center=False (pad upstream),
n_mels % 8 == 0 and frames padded to tile multiples (handled by the wrapper).

VMEM budget at n_fft=1024, n_mels=128: banks 2*2.1 MB + mel 0.26 MB +
signal tile 0.13 MB + frames 0.5 MB + 2 temps 0.5 MB ~= 6 MB of ~16 MB.

Status: measured SLOWER than the XLA pipeline on v5e at every matched
precision tier (batch 256x10 s: XLA-'high' 11.99 ms / 213.5k x vs kernel
'high' 13.62 ms / 187.9k x, kernel 'highest' 20.33 ms; round-1 numbers
98.8k vs 112k) — XLA's own fusion already keeps this op's intermediates
cache-resident at these shapes, so the kernel is kept as a benchmarked
alternative, not a default. Its niche: compile time — Mosaic compiles in
9-13 s where the XLA pipeline takes 185 s at batch 256 (useful for
interactive/one-shot runs, same trade as stft impl="fourstep"). The
Pallas kernel that IS shipped as a default is the fused time-stretch
(ops/pallas/timestretch.py), where five HBM-bound XLA stages genuinely
collapse into one VMEM-resident pass.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ...utils import cdiv
from ..mel import mel_filterbank
from ..stft import _dft_banks

try:  # pallas import can fail on exotic builds; gate cleanly
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False


def melspec_available() -> bool:
    return _PALLAS_OK


_FRAME_TILE = 64  # frames per row-tile; with 8 rows folded per instance the
# dot M-dim is 512. 128 blew the 16 MB VMEM scoped limit (19.3 MB) at
# n_fft=1024: re/im/p temporaries scale with TILE.


_ROWS_PER_INSTANCE = 8  # Mosaic tiling: block dim -2 must be a multiple of 8


def _kernel(*refs, n_fft, hop, log_floor, precision):
    # refs: x, cos, sin, [cos_lo, sin_lo if precision == "high"], fb;
    # then out. x_ref: [8, span] — 8 flattened (batch, tile) rows,
    # span = TILE*hop + n_fft - hop; out_ref: [8, TILE, n_mels]
    it = iter(refs)
    x_ref, cos_ref, sin_ref = next(it), next(it), next(it)
    cos_lo = sin_lo = None
    if precision == "high":
        cos_lo, sin_lo = next(it), next(it)
    fb_ref, out_ref = next(it), next(it)

    k = n_fft // hop
    n_rows = _FRAME_TILE + k - 1

    def raw_dot(a, b, prec):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32,
        )

    def dot(a, b):
        return raw_dot(
            a, b,
            jax.lax.Precision.DEFAULT if precision == "default" else jax.lax.Precision.HIGHEST,
        )

    # frames[t] = concat_j sig[t+j]; instead of materializing frames (Mosaic
    # rejects concat of sublane-shifted slices), split the DFT contraction by
    # hop segment: frames @ B == sum_j sig[j:j+TILE] @ B[j*hop:(j+1)*hop].
    # All 8 rows fold into the M dimension so every dot is [8*TILE, hop] —
    # big enough to keep the MXU busy.
    sig = x_ref[:, : n_rows * hop].reshape(_ROWS_PER_INSTANCE, n_rows, hop)

    def seg(j):
        return sig[:, j : j + _FRAME_TILE, :].reshape(_ROWS_PER_INSTANCE * _FRAME_TILE, hop)

    re = im = None
    for j in range(k):
        s = seg(j)
        sl = slice(j * hop, (j + 1) * hop)
        if precision == "high":
            # bf16x3: VMEM-resident bank hi/lo (host-presplit; the hi banks
            # ARE bf16-representable — see the wrapper), operand split shared
            # by the cos and sin dots (same scheme as pallas/timestretch)
            a_hi = s.astype(jnp.bfloat16).astype(jnp.float32)
            a_lo = s - a_hi
            d = jax.lax.Precision.DEFAULT
            ch, cl = cos_ref[sl, :], cos_lo[sl, :]
            sh, sn = sin_ref[sl, :], sin_lo[sl, :]
            re_j = raw_dot(a_hi, ch, d) + raw_dot(a_hi, cl, d) + raw_dot(a_lo, ch, d)
            im_j = raw_dot(a_hi, sh, d) + raw_dot(a_hi, sn, d) + raw_dot(a_lo, sh, d)
        else:
            re_j = dot(s, cos_ref[sl, :])
            im_j = dot(s, sin_ref[sl, :])
        re = re_j if re is None else re + re_j
        im = im_j if im is None else im + im_j
    p = re * re + im * im
    # mel projection always at HIGHEST: one small [.., n_bins] @ [n_bins,
    # n_mels] dot — negligible next to the k DFT dots (DESIGN.md §6b keeps
    # mel at 'highest' on the XLA path for the same reason)
    mels = raw_dot(p, fb_ref[:], jax.lax.Precision.HIGHEST)
    if log_floor is not None:
        mels = jnp.log(jnp.maximum(mels, log_floor))
    out_ref[:, :, :] = mels.reshape(_ROWS_PER_INSTANCE, _FRAME_TILE, mels.shape[-1])


@partial(
    jax.jit,
    static_argnames=(
        "n_fft", "hop", "n_mels", "sample_rate", "window", "log_floor",
        "precision", "interpret",
    ),
)
def mel_spectrogram_pallas(
    x: jnp.ndarray,
    n_fft: int = 1024,
    hop: int = 256,
    n_mels: int = 128,
    sample_rate: int = 16000,
    window: str = "hann",
    log_floor: float | None = 1e-10,
    precision: str | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """(log-)mel spectrogram ``[batch, frames, n_mels]`` of ``x [batch, T]``.

    Equivalent to ``log_mel(spectrogram(x, center=False), mel_filterbank(...))``
    (verified in tests); one fused Pallas kernel per 128-frame tile.

    ``precision`` sets the DFT-bank dots only ("default"/"high"/"highest";
    None follows ``ops.stft.DFT_PRECISION_DEFAULT``, the same cap as the XLA
    spectrogram path — the DFT is compute-bound, see DESIGN.md §6b). "high"
    is an in-kernel bf16x3 with host-presplit VMEM-resident bank residuals.
    The mel projection dot always runs at HIGHEST.
    """
    if not _PALLAS_OK:
        raise RuntimeError("pallas unavailable in this JAX build")
    if precision is None:
        from ..stft import DFT_PRECISION_DEFAULT

        precision = DFT_PRECISION_DEFAULT
    if precision not in ("default", "high", "highest"):
        raise ValueError(f"unknown precision {precision!r}")
    if x.ndim == 1:
        return mel_spectrogram_pallas(
            x[None], n_fft, hop, n_mels, sample_rate, window, log_floor,
            precision, interpret,
        )[0]
    if n_fft % hop:
        raise ValueError("pallas melspec requires hop | n_fft")
    batch, t = x.shape
    n_frames = (t - n_fft) // hop + 1
    if n_frames <= 0:
        raise ValueError(f"signal too short: {t} < n_fft {n_fft}")
    n_tiles = cdiv(n_frames, _FRAME_TILE)
    span = _FRAME_TILE * hop + (n_fft - hop)
    # (n_tiles + 1) * stride covers both shifted reshapes below
    need = (n_tiles + 1) * _FRAME_TILE * hop
    if t < need:
        x = jnp.pad(x, ((0, 0), (0, need - t)))

    cosb, sinb = _dft_banks(n_fft, window, None)
    fb = mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate)

    # overlapped tile tensor [batch, n_tiles, span] from two shifted reshapes
    # (BlockSpec blocks cannot overlap; this copy is only ~(span/stride - 1)
    # = 2% extra signal traffic), then flattened to [R, span] rows padded to
    # the kernel's 8-rows-per-instance granularity
    stride = _FRAME_TILE * hop
    head = x[:, : n_tiles * stride].reshape(batch, n_tiles, stride)
    tail = x[:, stride : stride + n_tiles * stride].reshape(batch, n_tiles, stride)
    tiles = jnp.concatenate([head, tail[:, :, : span - stride]], axis=-1)
    r0 = batch * n_tiles
    rows = cdiv(r0, _ROWS_PER_INSTANCE) * _ROWS_PER_INSTANCE
    tiles = tiles.reshape(r0, span)
    if rows != r0:
        tiles = jnp.pad(tiles, ((0, rows - r0), (0, 0)))

    kernel = partial(
        _kernel, n_fft=n_fft, hop=hop, log_floor=log_floor, precision=precision
    )
    n_bins = n_fft // 2 + 1
    bank_spec = pl.BlockSpec((n_fft, n_bins), lambda i: (0, 0), memory_space=pltpu.VMEM)
    inputs = [tiles]
    in_specs = [
        pl.BlockSpec((_ROWS_PER_INSTANCE, span), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    if precision == "high":
        # the bank shipped as the dot's hi operand must itself be
        # bf16-representable (the lo residual is computed against that
        # rounding) — see ops/pallas/timestretch.py for the failure mode
        import ml_dtypes

        def np_hi_lo(b):
            b = np.asarray(b, np.float32)
            hi = b.astype(ml_dtypes.bfloat16).astype(np.float32)
            return hi, b - hi

        (cosb, cos_lo), (sinb, sin_lo) = np_hi_lo(cosb), np_hi_lo(sinb)
        inputs += [jnp.asarray(cosb), jnp.asarray(sinb), jnp.asarray(cos_lo), jnp.asarray(sin_lo)]
        in_specs += [bank_spec] * 4
    else:
        inputs += [jnp.asarray(cosb), jnp.asarray(sinb)]
        in_specs += [bank_spec] * 2
    inputs.append(jnp.asarray(fb))
    in_specs.append(pl.BlockSpec((n_bins, n_mels), lambda i: (0, 0), memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        kernel,
        grid=(rows // _ROWS_PER_INSTANCE,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (_ROWS_PER_INSTANCE, _FRAME_TILE, n_mels), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows, _FRAME_TILE, n_mels), jnp.float32),
        # "high" mode adds ~4.2 MB of resident bank residuals, and on small
        # inputs XLA promotes whole (sub-MB) operand/output arrays into VMEM
        # on top of the kernel's own budget — observed 18.8 MB vs the 16 MB
        # default scoped limit on a 4x1 s batch. Same fix as
        # pallas/timestretch.py: raise the scoped limit (physical VMEM is
        # far larger).
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)
    out = out[:r0].reshape(batch, n_tiles * _FRAME_TILE, n_mels)
    return out[:, :n_frames]
