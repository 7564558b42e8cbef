"""Small shared utilities: rational-rate math, padding, pytree helpers."""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np


def rational_rate(input_rate: int, output_rate: int) -> tuple[int, int]:
    """Reduce a sample-rate conversion to coprime (up=L, down=M).

    48000->16000 -> (1, 3); 44100->16000 -> (160, 441).
    """
    if input_rate <= 0 or output_rate <= 0:
        raise ValueError("sample rates must be positive")
    g = math.gcd(input_rate, output_rate)
    return output_rate // g, input_rate // g


def round_up(x: int, multiple: int) -> int:
    """Round ``x`` up to the nearest multiple (TPU lane/sublane alignment)."""
    return -(-x // multiple) * multiple


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def pad_to(x: np.ndarray, length: int, axis: int = -1, value: float = 0.0) -> np.ndarray:
    """Pad ``x`` along ``axis`` to ``length`` with ``value`` (no-op if long enough)."""
    axis = axis % x.ndim
    cur = x.shape[axis]
    if cur >= length:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, length - cur)
    return np.pad(x, widths, constant_values=value)


def stack_padded(arrays: Sequence[np.ndarray], multiple: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """Stack variable-length 1-D arrays into [batch, T] plus a lengths vector.

    T is the max length rounded up to ``multiple`` (static shapes for jit).
    """
    if not arrays:
        raise ValueError("empty batch")
    lengths = np.array([a.shape[-1] for a in arrays], dtype=np.int32)
    target = round_up(int(lengths.max()), multiple)
    out = np.stack([pad_to(np.asarray(a), target) for a in arrays])
    return out, lengths
