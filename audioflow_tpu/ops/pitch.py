"""YIN fundamental-frequency estimation (de Cheveigné & Kawahara 2002).

TPU formulation: the difference function d(tau) over all frames at once via
one batched FFT autocorrelation (d(tau) = e0 + e(tau) - 2*acf(tau), the
energies from a cumulative sum), cumulative-mean normalization as a cumsum
along the lag axis, and the trough search as masked argmax/argmin with
static shapes — no per-frame Python, the whole tracker is one jittable
expression. Conventions follow librosa.yin (win = frame//2, lag range from
fmin/fmax, trough threshold 0.1, parabolic interpolation) so results are
oracle-checkable; the serial float64 oracle lives in the tests.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .framing import frame


def cmnd_frames(
    frames: jnp.ndarray, win: int | None = None, max_lag: int | None = None
) -> jnp.ndarray:
    """Cumulative-mean-normalized difference d'(tau) for frames [..., F, L].

    Lags 0..T inclusive (T = ``max_lag`` or W = win or L//2); d'(0) = 1 by
    definition. The difference function d(tau) = sum_{j<W} (x_j - x_{j+tau})^2
    expands to e0 + e(tau) - 2*acf(tau); acf rides one zero-padded FFT
    correlation. Truncating to ``max_lag`` (the pitch search never looks past
    sr/fmin) shrinks the frames the FFT sees to W + max_lag samples —
    measured 2x end-to-end at the yin() defaults (BENCHMARKS.md).
    """
    l = frames.shape[-1]
    w = win or l // 2
    t_max = w if max_lag is None else min(int(max_lag), w)
    if w + t_max > l:
        raise ValueError(
            f"win {w} + max_lag {t_max} needs frame_length >= {w + t_max}, got {l}"
        )
    frames = frames[..., : w + t_max]  # samples beyond W + max_lag never used
    n = 1 << (w + 2 * t_max).bit_length()  # linear correlation for lags <= t_max
    # acf(tau) = sum_{j < w} x_j x_{j+tau}: cross-correlate the W-sample
    # window against the (truncated) frame (irfft(X * conj(Xw))[tau] = that sum)
    spec_full = jnp.fft.rfft(frames, n=n, axis=-1)
    spec_win = jnp.fft.rfft(frames[..., :w], n=n, axis=-1)
    acf = jnp.fft.irfft(spec_full * jnp.conj(spec_win), n=n, axis=-1)[..., : t_max + 1]
    sq = frames * frames
    cs = jnp.cumsum(sq, axis=-1)
    zero = jnp.zeros_like(cs[..., :1])
    cs = jnp.concatenate([zero, cs], axis=-1)  # cs[k] = sum of first k squares
    e0 = cs[..., w : w + 1]
    # e(tau) = sum_{j=tau}^{tau+w-1} x_j^2, tau = 0..t_max
    e_tau = cs[..., w : w + t_max + 1] - cs[..., 0 : t_max + 1]
    # acf(0) over the full window == e0 by construction; d(0) == 0 exactly
    d = jnp.maximum(e0 + e_tau - 2.0 * acf, 0.0)
    # cumulative mean normalization: d'(tau) = d(tau) * tau / sum_{1..tau} d
    csd = jnp.cumsum(d[..., 1:], axis=-1)
    tau = jnp.arange(1, t_max + 1, dtype=frames.dtype)
    dn = jnp.where(csd > 0, d[..., 1:] * tau / jnp.maximum(csd, 1e-30), 1.0)
    return jnp.concatenate([jnp.ones_like(d[..., :1]), dn], axis=-1)


def yin_frames(
    frames: jnp.ndarray,
    sample_rate: float,
    fmin: float = 65.0,
    fmax: float = 2093.0,
    threshold: float = 0.1,
    win: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-frame (f0_hz, aperiodicity) from frames ``[..., F, L]``.

    Picks the first CMND trough below ``threshold`` within the lag range
    [sr/fmax, sr/fmin] (else the range's global minimum), refines the lag by
    parabolic interpolation, and reports the CMND value there as the
    aperiodicity (0 = perfectly periodic; > ~0.3 is effectively unvoiced —
    thresholding is left to the caller, librosa-style).
    """
    l = frames.shape[-1]
    w = win or l // 2
    tau_lo = max(int(np.floor(sample_rate / fmax)), 2)
    tau_hi = min(int(np.ceil(sample_rate / fmin)), w - 1)
    if tau_lo >= tau_hi:
        raise ValueError(
            f"empty lag range for fmin={fmin}, fmax={fmax} at sr={sample_rate} "
            f"(win={w}); need sr/fmax < sr/fmin within [2, win-1]"
        )
    # one lag past tau_hi so the trough test and parabolic refinement at the
    # range edge see a real neighbor
    dn = cmnd_frames(frames, w, min(tau_hi + 1, w))  # [..., F, T+1]
    lags = jnp.arange(dn.shape[-1])
    in_range = (lags >= tau_lo) & (lags <= tau_hi)
    prev = jnp.concatenate([dn[..., :1], dn[..., :-1]], axis=-1)
    nxt = jnp.concatenate([dn[..., 1:], dn[..., -1:]], axis=-1)
    trough = (dn < prev) & (dn <= nxt) & (dn < threshold) & in_range
    has_trough = trough.any(axis=-1)
    first_trough = jnp.argmax(trough, axis=-1)
    big = jnp.asarray(jnp.finfo(dn.dtype).max, dn.dtype)
    global_min = jnp.argmin(jnp.where(in_range, dn, big), axis=-1)
    tau_star = jnp.where(has_trough, first_trough, global_min)

    # parabolic interpolation around tau_star (guarded at flat/edge cases)
    def at(idx):
        return jnp.take_along_axis(dn, idx[..., None], axis=-1)[..., 0]

    d0 = at(tau_star)
    dm = at(jnp.maximum(tau_star - 1, 0))
    dp = at(jnp.minimum(tau_star + 1, dn.shape[-1] - 1))
    denom = dm - 2.0 * d0 + dp
    delta = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (dm - dp) / jnp.where(denom == 0, 1.0, denom), 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    tau_ref = tau_star.astype(dn.dtype) + delta
    f0 = sample_rate / jnp.maximum(tau_ref, 1.0)
    # aperiodicity: the (uninterpolated) CMND depth at the chosen lag
    return f0, d0


def yin(
    x: jnp.ndarray,
    sample_rate: float,
    fmin: float = 65.0,
    fmax: float = 2093.0,
    frame_length: int = 2048,
    hop: int = 256,
    threshold: float = 0.1,
    center: bool = True,
) -> jnp.ndarray:
    """Frame-wise f0 (Hz) of a signal ``[..., T]`` -> ``[..., F]``.

    ``center=True`` reflect-pads by frame_length//2 so frame i is centered
    on sample i*hop (librosa convention).
    """
    f0, _ = yin_voicing(x, sample_rate, fmin, fmax, frame_length, hop, threshold, center)
    return f0


def yin_voicing(
    x: jnp.ndarray,
    sample_rate: float,
    fmin: float = 65.0,
    fmax: float = 2093.0,
    frame_length: int = 2048,
    hop: int = 256,
    threshold: float = 0.1,
    center: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Like :func:`yin` but also returns the per-frame aperiodicity."""
    if center:
        pads = [(0, 0)] * (x.ndim - 1) + [(frame_length // 2, frame_length // 2)]
        x = jnp.pad(x, pads, mode="reflect")
    fr = frame(x, frame_length, hop)
    return yin_frames(fr, sample_rate, fmin, fmax, threshold)
