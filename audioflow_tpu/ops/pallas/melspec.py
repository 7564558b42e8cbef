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

Status: measured SLOWER than the XLA pipeline on v5e (98.8k vs 112k x
realtime, BENCHMARKS.md) — XLA's own fusion already keeps this op's
intermediates cache-resident at these shapes, so the kernel is kept as a
benchmarked experiment, not a default. The Pallas kernel that IS shipped
as a default is the fused time-stretch (ops/pallas/timestretch.py), where
five HBM-bound XLA stages genuinely collapse into one VMEM-resident pass.
"""

from __future__ import annotations

from functools import partial

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


def _kernel(x_ref, cos_ref, sin_ref, fb_ref, out_ref, *, n_fft, hop, log_floor):
    # x_ref: [8, span] — 8 flattened (batch, tile) rows, span = TILE*hop + n_fft - hop
    # out_ref: [8, TILE, n_mels]
    k = n_fft // hop
    n_rows = _FRAME_TILE + k - 1

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32,
        )

    # frames[t] = concat_j sig[t+j]; instead of materializing frames (Mosaic
    # rejects concat of sublane-shifted slices), split the DFT contraction by
    # hop segment: frames @ B == sum_j sig[j:j+TILE] @ B[j*hop:(j+1)*hop].
    # All 8 rows fold into the M dimension so every dot is [8*TILE, hop] —
    # big enough to keep the MXU busy.
    sig = x_ref[:, : n_rows * hop].reshape(_ROWS_PER_INSTANCE, n_rows, hop)

    def seg(j):
        return sig[:, j : j + _FRAME_TILE, :].reshape(_ROWS_PER_INSTANCE * _FRAME_TILE, hop)

    re = dot(seg(0), cos_ref[0:hop, :])
    im = dot(seg(0), sin_ref[0:hop, :])
    for j in range(1, k):
        s = seg(j)
        re = re + dot(s, cos_ref[j * hop : (j + 1) * hop, :])
        im = im + dot(s, sin_ref[j * hop : (j + 1) * hop, :])
    p = re * re + im * im
    mels = dot(p, fb_ref[:])
    if log_floor is not None:
        mels = jnp.log(jnp.maximum(mels, log_floor))
    out_ref[:, :, :] = mels.reshape(_ROWS_PER_INSTANCE, _FRAME_TILE, mels.shape[-1])


@partial(
    jax.jit,
    static_argnames=("n_fft", "hop", "n_mels", "sample_rate", "window", "log_floor", "interpret"),
)
def mel_spectrogram_pallas(
    x: jnp.ndarray,
    n_fft: int = 1024,
    hop: int = 256,
    n_mels: int = 128,
    sample_rate: int = 16000,
    window: str = "hann",
    log_floor: float | None = 1e-10,
    interpret: bool = False,
) -> jnp.ndarray:
    """(log-)mel spectrogram ``[batch, frames, n_mels]`` of ``x [batch, T]``.

    Equivalent to ``log_mel(spectrogram(x, center=False), mel_filterbank(...))``
    (verified in tests); one fused Pallas kernel per 128-frame tile.
    """
    if not _PALLAS_OK:
        raise RuntimeError("pallas unavailable in this JAX build")
    if x.ndim == 1:
        return mel_spectrogram_pallas(
            x[None], n_fft, hop, n_mels, sample_rate, window, log_floor, interpret
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

    kernel = partial(_kernel, n_fft=n_fft, hop=hop, log_floor=log_floor)
    n_bins = n_fft // 2 + 1
    out = pl.pallas_call(
        kernel,
        grid=(rows // _ROWS_PER_INSTANCE,),
        in_specs=[
            pl.BlockSpec((_ROWS_PER_INSTANCE, span), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, n_bins), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, n_bins), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_bins, n_mels), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_ROWS_PER_INSTANCE, _FRAME_TILE, n_mels), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows, _FRAME_TILE, n_mels), jnp.float32),
        interpret=interpret,
    )(tiles, jnp.asarray(cosb), jnp.asarray(sinb), jnp.asarray(fb))
    out = out[:r0].reshape(batch, n_tiles * _FRAME_TILE, n_mels)
    return out[:, :n_frames]
