"""STFT / ISTFT on TPU via XLA's rFFT.

Design: frame (static slices) -> window multiply (VPU, fused) -> ``jnp.fft.rfft``
(XLA TPU FFT). Magnitude/power stay fused into the consumer. ISTFT is irfft ->
synthesis window -> overlap-add -> COLA window-square normalization.

This is the TPU-native replacement for what the reference never had on-device:
its DSP stops at resample+VAD; the STFT/mel stages come from the north star
(BASELINE.json config 1). Framing semantics follow the widely used
center/reflect convention so results are oracle-checkable against
scipy.signal.stft-style references.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .framing import frame, overlap_add
from .windows import get_window


def stft(
    x: jnp.ndarray,
    n_fft: int = 1024,
    hop: int = 256,
    win_length: int | None = None,
    window: str = "hann",
    center: bool = True,
    pad_mode: str = "reflect",
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Short-time Fourier transform.

    Args:
      x: real signal ``[..., T]``.
    Returns:
      complex64 spectrogram ``[..., n_frames, n_fft // 2 + 1]``
      (time-major: frame axis before frequency axis, the natural layout for
      downstream [frames, freqs] @ [freqs, mels] MXU matmuls).
    """
    win_length = win_length or n_fft
    if win_length > n_fft:
        raise ValueError("win_length must be <= n_fft")
    w = get_window(window, win_length, periodic=True)
    if win_length < n_fft:  # center-pad window to n_fft
        pad = n_fft - win_length
        w = np.pad(w, (pad // 2, pad - pad // 2))
    w = jnp.asarray(w, dtype=dtype)

    if center:
        widths = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        x = jnp.pad(x, widths, mode=pad_mode)
    frames = frame(x.astype(dtype), n_fft, hop)
    return jnp.fft.rfft(frames * w, n=n_fft, axis=-1)


def magnitude(spec: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(spec)


def power(spec: jnp.ndarray) -> jnp.ndarray:
    return jnp.real(spec) ** 2 + jnp.imag(spec) ** 2


def istft(
    spec: jnp.ndarray,
    n_fft: int = 1024,
    hop: int = 256,
    win_length: int | None = None,
    window: str = "hann",
    center: bool = True,
    length: int | None = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Inverse STFT with synthesis-window (WOLA) normalization.

    ``length`` trims/defines the output sample count; defaults to
    ``n_frames * hop`` for center=True.
    """
    win_length = win_length or n_fft
    w = get_window(window, win_length, periodic=True)
    if win_length < n_fft:
        pad = n_fft - win_length
        w = np.pad(w, (pad // 2, pad - pad // 2))
    w = jnp.asarray(w, dtype=dtype)
    n = spec.shape[-2]
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1).astype(dtype)
    y = overlap_add(frames * w, hop)
    wsq = overlap_add(jnp.broadcast_to(w * w, frames.shape), hop)
    y = y / jnp.maximum(wsq, 1e-11)
    if not center:
        return y if length is None else y[..., :length]
    if length is None:
        length = n * hop
    return y[..., n_fft // 2 : n_fft // 2 + length]
