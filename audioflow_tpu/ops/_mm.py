"""Precision-controlled matmul for fidelity-critical kernels.

On TPU the default matmul precision truncates f32 operands to bf16 before
the MXU — fine for neural nets, fatal for the <1e-4 numerical-fidelity budget
(BASELINE.md). Kernels whose math must match the f64-designed coefficients
(biquad Toeplitz, resample banks, mel projection) route through :func:`mm`,
which defaults to ``Precision.HIGHEST`` (full f32 via multi-pass). The
global default can be lowered for throughput experiments.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}

_default: str = "highest"


def set_default_matmul_precision(name: str) -> None:
    """Set the framework-wide precision for fidelity-critical matmuls."""
    global _default
    if name not in _PRECISIONS:
        raise ValueError(f"unknown precision {name!r}; known: {sorted(_PRECISIONS)}")
    _default = name


def get_default_matmul_precision() -> str:
    return _default


def mm(a: jnp.ndarray, b: jnp.ndarray, precision: str | None = None) -> jnp.ndarray:
    """matmul with f32 accumulation and the configured MXU precision."""
    p = _PRECISIONS[precision or _default]
    return jnp.matmul(a, b, precision=p, preferred_element_type=jnp.float32)


def em(subscripts: str, *operands, precision: str | None = None) -> jnp.ndarray:
    """einsum with f32 accumulation and the configured MXU precision (for
    contractions over a non-trailing axis, e.g. the factored DFT stages)."""
    p = _PRECISIONS[precision or _default]
    return jnp.einsum(subscripts, *operands, precision=p, preferred_element_type=jnp.float32)
