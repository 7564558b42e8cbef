"""Constant-Q transform (CQT) as MXU matmuls against precomputed kernels.

The reference app has no CQT (its analysis stops at VAD energy); this is
part of the framework's music-analysis family (chroma, tonnetz, rhythm).
The classic CPU algorithm (Brown/Puckette via recursive downsampling +
sparse FFT kernels) is replaced by a TPU-first formulation:

* every CQT bin is a windowed complex sinusoid kernel; a frame of signal
  dotted with the kernel bank IS the transform — the same matmul-DFT
  pattern as ops/stft.py::spectrogram, which shards with zero collectives
  (XLA's FFT op does not partition; these dots do);
* kernels are designed host-side in float64, cached, and shipped as
  cos/sin banks (no complex arithmetic on device);
* ``impl="onedot"`` (default) concatenates every octave's kernels —
  zero-padded to the full frame span — into ONE ``[F0, 2*n_bins]`` bank:
  one framing, one dot. The op is HBM-bound on the framed-signal read, not
  MAC-bound, so the "wasted" zero MACs are free and the single-dot form is
  the fastest measured (6.9 vs 8.7 ms for per-octave dots at batch
  64x10 s) with the fastest compile. ``impl="split"`` (per-octave frame
  lengths, ~12x fewer MACs) and ``impl="direct"`` (per-octave dots at full
  length) are kept for the exact-equality tests — all three are
  bit-identical up to f32 summation of exact zeros;
* every frame length is rounded up to a multiple of ``hop`` so framing
  takes ops/framing.py's static-slice fast path. The first cut used the
  raw odd kernel length (8229 at fmin=C1/16 kHz), which forced the gather
  fallback — a [frames, 8229] index gather materializing ~32x the signal
  through HBM, measured 61 ms at batch 64x10 s where the dots alone are
  <1 ms (BENCHMARKS.md "CQT framing").

Geometry: frame t's kernels are centered at sample ``t * hop`` when
``center=True`` (zero-padded edges — kernels of several thousand samples
make reflect padding meaningless), and at ``t * hop + F0 // 2`` when
``center=False``, where ``F0 = hop * ceil((N_max + 1) / hop)`` is the
lowest octave's frame length. ``n_frames`` is ``T // hop + 1`` centered,
``(T - F0) // hop + 1`` otherwise.

Normalization: each kernel is scaled by ``2 / sum(window)``, so a
unit-amplitude sinusoid at a bin's center frequency reads ~1.0 in that
bin — the natural "amplitude spectrum" convention (documented here
because CQT normalizations differ across libraries).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ._mm import mm
from .framing import frame
from .stft import DFT_PRECISION_DEFAULT
from .windows import get_window

#: C1 in the A440 12-TET tuning — the conventional CQT floor.
FMIN_C1 = 32.70319566257483

from ..utils.cache import BoundedCache

# per-config analysis banks, ~F0*2*n_bins*4 B each (~6 MB at 84 bins/16 kHz)
_KERNEL_CACHE = BoundedCache(maxsize=16)


def cqt_frequencies(
    n_bins: int = 84, fmin: float = FMIN_C1, bins_per_octave: int = 12
) -> np.ndarray:
    """Bin center frequencies [n_bins], geometrically spaced (host, f64)."""
    return fmin * 2.0 ** (np.arange(n_bins, dtype=np.float64) / bins_per_octave)


def cqt_lengths(
    sample_rate: float,
    n_bins: int = 84,
    fmin: float = FMIN_C1,
    bins_per_octave: int = 12,
    filter_scale: float = 1.0,
) -> np.ndarray:
    """Kernel length in samples per bin (odd-forced; host, int).

    ``N_k = ceil(Q * sr / f_k)`` with ``Q = filter_scale / (2^(1/B) - 1)``.
    Odd lengths give every kernel an exact integer center.
    """
    q = filter_scale / (2.0 ** (1.0 / bins_per_octave) - 1.0)
    freqs = cqt_frequencies(n_bins, fmin, bins_per_octave)
    n = np.ceil(q * sample_rate / freqs).astype(np.int64)
    return n + (1 - n % 2)


def _design(
    sample_rate: float,
    hop: int,
    n_bins: int,
    fmin: float,
    bins_per_octave: int,
    window: str,
    filter_scale: float,
):
    """Host-side kernel design. Returns (f0, groups); each group is
    (frame_len, cos_bank [frame_len, nb], sin_bank) for one octave. Frame
    lengths are hop multiples (framing fast path); kernel k is centered at
    row ``frame_len // 2``."""
    key = (sample_rate, hop, n_bins, fmin, bins_per_octave, window, filter_scale)
    if key in _KERNEL_CACHE:
        return _KERNEL_CACHE[key]
    freqs = cqt_frequencies(n_bins, fmin, bins_per_octave)
    if freqs[-1] > sample_rate / 2:
        raise ValueError(
            f"top CQT bin {freqs[-1]:.1f} Hz exceeds Nyquist "
            f"{sample_rate / 2:.1f} Hz; reduce n_bins or raise fmin"
        )
    lengths = cqt_lengths(sample_rate, n_bins, fmin, bins_per_octave, filter_scale)
    groups = []
    for lo in range(0, n_bins, bins_per_octave):
        hi = min(lo + bins_per_octave, n_bins)
        n_max = int(lengths[lo:hi].max())
        flen = hop * -(-(n_max + 1) // hop)  # kernel fits centered at flen//2
        cos_b = np.zeros((flen, hi - lo), np.float64)
        sin_b = np.zeros((flen, hi - lo), np.float64)
        for j, k in enumerate(range(lo, hi)):
            nk = int(lengths[k])
            w = get_window(window, nk, periodic=False).astype(np.float64)
            t = (np.arange(nk, dtype=np.float64) - (nk - 1) / 2.0) / sample_rate
            ang = 2.0 * np.pi * freqs[k] * t
            g = 2.0 / w.sum()
            start = flen // 2 - (nk - 1) // 2
            cos_b[start : start + nk, j] = g * w * np.cos(ang)
            sin_b[start : start + nk, j] = -g * w * np.sin(ang)
        groups.append((flen, cos_b.astype(np.float32), sin_b.astype(np.float32)))
    f0 = groups[0][0]
    # the onedot bank: [F0, 2*n_bins] = [cos octaves... | sin octaves...],
    # each octave zero-padded so its kernels stay centered at F0//2
    cos_full, sin_full = [], []
    for flen, cb, sb in groups:
        pr = f0 // 2 - flen // 2  # both are hop multiples -> exact
        cos_full.append(np.pad(cb, ((pr, f0 - flen - pr), (0, 0))))
        sin_full.append(np.pad(sb, ((pr, f0 - flen - pr), (0, 0))))
    onedot_bank = np.concatenate(cos_full + sin_full, axis=1)
    _KERNEL_CACHE[key] = (f0, groups, onedot_bank)
    return _KERNEL_CACHE[key]


def cqt_window_length(
    sample_rate: float,
    hop: int = 256,
    n_bins: int = 84,
    fmin: float = FMIN_C1,
    bins_per_octave: int = 12,
    filter_scale: float = 1.0,
) -> int:
    """The analysis frame span F0 (lowest octave's frame length, a hop
    multiple) — the streaming carry is ``F0 - hop``."""
    n_max = int(
        cqt_lengths(sample_rate, n_bins, fmin, bins_per_octave, filter_scale)[0]
    )
    return hop * -(-(n_max + 1) // hop)


def cqt(
    x: jnp.ndarray,
    sample_rate: float,
    hop: int = 256,
    n_bins: int = 84,
    fmin: float = FMIN_C1,
    bins_per_octave: int = 12,
    window: str = "hann",
    filter_scale: float = 1.0,
    center: bool = True,
    output: str = "magnitude",
    impl: str = "onedot",
    precision: str | None = None,
) -> jnp.ndarray:
    """Constant-Q spectrogram ``[..., n_frames, n_bins]``.

    See the module docstring for the frame geometry and normalization.

    ``output``: "magnitude" | "power" | "complex".
    ``impl``: "onedot" (one concatenated bank, one dot; default — measured
    fastest, the op is HBM-bound), "split" (per-octave frame lengths) or
    "direct" (per-octave dots at the full frame length) — identical
    results.
    ``precision``: matmul precision (None -> ops/stft.py
    ``DFT_PRECISION_DEFAULT`` = 'high'; measured 1.5e-5 relative vs
    'highest' on chip — gated by the cqt_440_mag_err validate row).
    """
    if output not in ("magnitude", "power", "complex"):
        raise ValueError(
            f"unknown cqt output {output!r}; known: magnitude, power, complex"
        )
    if impl not in ("onedot", "split", "direct"):
        raise ValueError(f"unknown cqt impl {impl!r}; known: onedot, split, direct")
    f0, groups, onedot_bank = _design(
        sample_rate, hop, n_bins, fmin, bins_per_octave, window, filter_scale
    )
    prec = precision or DFT_PRECISION_DEFAULT
    if center:
        half = f0 // 2
        pads = [(0, 0)] * (x.ndim - 1) + [(half, f0 - half)]
        x = jnp.pad(x, pads)
    n_frames = (x.shape[-1] - f0) // hop + 1
    if n_frames < 1:
        raise ValueError(
            f"signal too short for CQT: {x.shape[-1]} samples < frame span {f0}"
        )
    if impl == "onedot":
        fr = frame(x, f0, hop)[..., :n_frames, :]
        y = mm(fr, jnp.asarray(onedot_bank), prec)
        re, im = y[..., :n_bins], y[..., n_bins:]
    else:
        res, ims = [], []
        for flen, cos_b, sin_b in groups:
            if impl == "direct":
                pad_rows = f0 // 2 - flen // 2  # both are hop multiples / even
                cos_b = np.pad(cos_b, ((pad_rows, f0 - flen - pad_rows), (0, 0)))
                sin_b = np.pad(sin_b, ((pad_rows, f0 - flen - pad_rows), (0, 0)))
                off, flen = 0, f0
            else:
                off = f0 // 2 - flen // 2  # same center sample t*hop + f0//2
            fr = frame(x[..., off:], flen, hop)[..., :n_frames, :]
            res.append(mm(fr, jnp.asarray(cos_b), prec))
            ims.append(mm(fr, jnp.asarray(sin_b), prec))
        re = jnp.concatenate(res, axis=-1)
        im = jnp.concatenate(ims, axis=-1)
    if output == "complex":
        return jax.lax.complex(re, im)
    p = re * re + im * im
    return jnp.sqrt(p) if output == "magnitude" else p


# per-config synthesis banks, ~2*n_bins*nd*4 B each (~11 MB at 84 bins/16 kHz)
_DUAL_CACHE = BoundedCache(maxsize=8)


def icqt_max_hop(
    sample_rate: float,
    n_bins: int = 84,
    fmin: float = FMIN_C1,
    bins_per_octave: int = 12,
    filter_scale: float = 1.0,
) -> int:
    """Largest analysis hop at which :func:`icqt` reconstruction holds.

    The hop-sampled CQT is only invertible while every kernel still covers
    the gaps between frames (the "painless" condition): once ``hop``
    exceeds ~1/3 of the SHORTEST kernel, the top bins' content between
    frame centers is simply never measured and no dual bank can bring it
    back (time aliasing — fundamental, not numerical; measured 33.8 dB
    worst-bin tone SNR at exactly N_min/3, collapsing to negative dB by
    N_min). Analysis-only uses (chroma, descriptors) are unaffected and
    keep the usual hop=256.
    """
    n_min = int(
        cqt_lengths(sample_rate, n_bins, fmin, bins_per_octave, filter_scale)[-1]
    )
    return max(1, n_min // 3)


def _dual_design(
    sample_rate: float,
    hop: int,
    n_bins: int,
    fmin: float,
    bins_per_octave: int,
    window: str,
    filter_scale: float,
    nd_mult: int = 2,
    eps: float = 1e-2,
    mask_db: float = 40.0,
):
    """Host-side synthesis (dual) bank design, float64 -> f32.

    The analysis kernels ``psi_k = g w exp(i ang)`` (the onedot bank's
    columns) form a frame at hop ``hop``; the painless-case canonical dual
    is diagonal in frequency: ``d_hat_k = psi_hat_k / W`` with the total
    response ``W(w) = (1/hop) sum_k (|psi_hat_k(w)|^2 + |psi_hat_k(-w)|^2)``.
    Two corrections make it work in practice (both measured, see tests):

    * **band mask**: each dual is zeroed where ``|psi_hat_k|`` is more than
      ``mask_db`` below its peak. Without it, a kernel's far sidelobes get
      amplified by 1/W in the uncovered regions (below fmin / above the top
      bin), and the hop-sampling alias images of any tone excite them —
      measured as a ~20 dB error floor localized at ``f - j*sr/hop``;
    * **regularization**: W is floored at ``eps * max(W)`` so the rolloff
      at the band edges (half-covered first/last bins) cannot blow up.

    The duals are designed on an ``nd = nd_mult * F0`` circular grid
    (``nd_mult=2``): the division by W widens the lowest bin's dual beyond
    its F0 kernel span, and at nd = F0 it wraps — measured as a low-bin SNR
    collapse. Returns ``(nd, bank [2*n_bins, nd] f32)`` where a synthesis
    frame is ``[Re X | Im X] @ bank`` (the 2*Re{X d} expansion).
    """
    key = (
        sample_rate, hop, n_bins, fmin, bins_per_octave, window, filter_scale,
        nd_mult, eps, mask_db,
    )
    if key in _DUAL_CACHE:
        return _DUAL_CACHE[key]
    f0, _groups, onedot = _design(
        sample_rate, hop, n_bins, fmin, bins_per_octave, window, filter_scale
    )
    # forward bank columns: cos_b = g w cos(ang), sin_b = -g w sin(ang), so
    # X = x@cos_b + i x@sin_b = <x, conj(psi)> with psi = g w exp(i ang)
    psi = (
        onedot[:, :n_bins].T.astype(np.float64)
        - 1j * onedot[:, n_bins:].T.astype(np.float64)
    )
    nd = f0 * nd_mult
    psi_p = np.zeros((n_bins, nd), complex)
    off = nd // 2 - f0 // 2  # keep kernels centered on the design grid
    psi_p[:, off : off + f0] = psi
    ph = np.fft.fft(psi_p, axis=1)
    w_pos = (np.abs(ph) ** 2).sum(0)
    w_neg = np.empty_like(w_pos)  # |psi_hat(-w)|^2: index -j mod nd
    w_neg[0] = w_pos[0]
    w_neg[1:] = w_pos[1:][::-1]
    w_tot = (w_pos + w_neg) / hop
    amp = np.abs(ph)
    mask = amp >= amp.max(axis=1, keepdims=True) * 10.0 ** (-mask_db / 20.0)
    d_hat = ph * mask / np.maximum(w_tot, eps * w_tot.max())[None, :]
    d = np.fft.ifft(d_hat, axis=1)  # complex duals, centered at nd//2
    bank = np.concatenate(
        [2.0 * d.real, -2.0 * d.imag], axis=0
    ).astype(np.float32)  # [2*n_bins, nd]
    _DUAL_CACHE[key] = (nd, bank)
    return _DUAL_CACHE[key]


def icqt(
    c: jnp.ndarray,
    sample_rate: float,
    hop: int = 256,
    n_bins: int = 84,
    fmin: float = FMIN_C1,
    bins_per_octave: int = 12,
    window: str = "hann",
    filter_scale: float = 1.0,
    center: bool = True,
    length: int | None = None,
    precision: str | None = None,
) -> jnp.ndarray:
    """Inverse CQT: complex coefficients ``[..., n_frames, n_bins]`` (the
    output of ``cqt(..., output="complex")`` at the SAME parameters) back to
    a waveform ``[..., T]``.

    TPU formulation mirroring the forward: one dot of ``[Re | Im]`` against
    a precomputed dual bank (see :func:`_dual_design`) plus an overlap-add —
    both MXU/fusion friendly, batched, shard-clean on the batch axis.

    Reconstruction holds for content inside the covered band
    [fmin, top bin] when ``hop <= icqt_max_hop(...)`` (measured >= 33 dB
    worst-bin / ~70 dB mid-band tone SNR there, gated by the
    ``icqt_tone_snr_db`` validate row); larger hops degrade the top octaves
    first (time aliasing — see :func:`icqt_max_hop`). The reference app has
    no CQT at all; this completes the framework's analysis families so each
    one has an inversion story (stft->istft, mel/mfcc->audio, cqt->icqt).

    ``length``: output sample count; defaults to ``(n_frames - 1) * hop``
    (the forward's T is only known to hop resolution). ``precision``
    follows the forward's default (ops/stft.py DFT_PRECISION_DEFAULT).
    """
    from .framing import overlap_add

    if hop > icqt_max_hop(sample_rate, n_bins, fmin, bins_per_octave, filter_scale):
        import warnings

        warnings.warn(
            f"icqt at hop={hop} exceeds icqt_max_hop="
            f"{icqt_max_hop(sample_rate, n_bins, fmin, bins_per_octave, filter_scale)}"
            " — top-octave content is not recoverable at this frame spacing "
            "(see icqt_max_hop); expect degraded reconstruction",
            stacklevel=2,
        )
    nd, bank = _dual_design(
        sample_rate, hop, n_bins, fmin, bins_per_octave, window, filter_scale
    )
    f0 = cqt_window_length(
        sample_rate, hop, n_bins, fmin, bins_per_octave, filter_scale
    )
    if c.shape[-1] != n_bins:
        raise ValueError(f"expected [..., frames, {n_bins}] coefficients, got {c.shape}")
    n_frames = c.shape[-2]
    if length is None:
        length = (n_frames - 1) * hop
    prec = precision or DFT_PRECISION_DEFAULT
    ri = jnp.concatenate([jnp.real(c), jnp.imag(c)], axis=-1)  # [..., T_f, 2K]
    frames = mm(ri, jnp.asarray(bank), prec)  # [..., T_f, nd]
    y = overlap_add(frames, hop)  # sample i = sum_t frames[t, i - t*hop]
    # frame t's dual is centered at t*hop (center=True) or t*hop + f0//2
    # (center=False); OLA index i = t*hop + j with kernel center j = nd//2
    start = nd // 2 - (0 if center else f0 // 2)
    if start < 0:
        pads = [(0, 0)] * (y.ndim - 1) + [(-start, 0)]
        y, start = jnp.pad(y, pads), 0
    need = start + length
    if y.shape[-1] < need:
        pads = [(0, 0)] * (y.ndim - 1) + [(0, need - y.shape[-1])]
        y = jnp.pad(y, pads)
    return y[..., start:need]


def chroma_cqt(
    x: jnp.ndarray,
    sample_rate: float,
    hop: int = 256,
    n_octaves: int = 7,
    fmin: float = FMIN_C1,
    bins_per_octave: int = 12,
    norm: bool = True,
    **kwargs,
) -> jnp.ndarray:
    """Pitch-class chromagram folded from the constant-Q transform
    ``[..., n_frames, 12]`` — octave-robust chroma (every octave of a pitch
    class contributes to the same bin, unlike the STFT chroma filterbank
    whose triangular weights blur at low frequencies).

    ``bins_per_octave`` must be a multiple of 12; sub-semitone bins fold
    into their nearest pitch class. ``norm=True`` L-inf-normalizes each
    frame (librosa convention); extra kwargs pass through to :func:`cqt`.
    """
    if bins_per_octave % 12:
        raise ValueError(f"bins_per_octave must be a multiple of 12, got {bins_per_octave}")
    n_bins = n_octaves * bins_per_octave
    c = cqt(x, sample_rate, hop, n_bins, fmin, bins_per_octave, **kwargs)
    # fold octaves: [..., F, n_octaves, bins_per_octave] summed over octaves
    folded = c.reshape(*c.shape[:-1], n_octaves, bins_per_octave).sum(axis=-2)
    if bins_per_octave > 12:
        sub = bins_per_octave // 12
        folded = folded.reshape(*folded.shape[:-1], 12, sub).sum(axis=-1)
    if norm:
        folded = folded / jnp.maximum(
            folded.max(axis=-1, keepdims=True), 1e-10
        )
    return folded
