"""Shared Pallas/Mosaic building blocks for the fused audio kernels.

Factored out of ops/pallas/timestretch.py (the first fused kernel) so the
Griffin-Lim kernel and future kernels share one implementation of:

* the roll primitive (``pltpu.roll`` with a ``jnp.roll`` interpreter path),
* the precision ladder for in-kernel dots — Mosaic natively lowers DEFAULT
  (bf16 one-pass) and HIGHEST (bf16x6); "high" is implemented manually as
  the classic bf16x3 hi/lo split with f32 accumulation, the same arithmetic
  XLA's Precision.HIGH lowers to at half the HIGHEST cost,
* the exact f32 = bf16-hi + residual-lo decompositions (device and host).

The bf16x3 rule (docs/DESIGN.md §6b): a bank shipped as the hi operand of a
"high" dot MUST itself be bf16-representable — the lo residual is computed
against that rounding, and shipping a full-f32 bank as "hi" double-counts
the residual wherever the dot doesn't truncate (CPU interpret mode; and
Mosaic may keep f32 operands too).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

try:  # pallas import can fail on exotic builds; gate cleanly
    from jax.experimental import pallas as pl  # noqa: F401
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_OK = True
except Exception:  # pragma: no cover
    PALLAS_OK = False

ROWS = 8  # batch rows folded per kernel instance (Mosaic sublane granularity)
PRECISIONS = ("default", "high", "highest")


def roll(x, shift, axis, interpret=False):
    if interpret:  # pltpu.roll has no interpreter lowering; jnp.roll matches
        return jnp.roll(x, shift, axis)
    return pltpu.roll(x, shift % x.shape[axis], axis)


def raw_dot(a, b, prec):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32,
    )


def split_hi_lo(a):
    """Exact f32 = bf16-representable hi + residual lo decomposition."""
    hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, a - hi


def np_hi_lo(b):
    """Host-side :func:`split_hi_lo` for precomputed banks."""
    import ml_dtypes

    b = np.asarray(b, np.float32)
    hi = b.astype(ml_dtypes.bfloat16).astype(np.float32)
    return hi, b - hi


def make_dot(precision):
    """dot(a, (b_hi, b_lo)) at the given precision tier.

    "high": bf16x3 split (a_hi*b_hi + a_hi*b_lo + a_lo*b_hi, f32
    accumulation) with the bank's lo residual precomputed on host and
    VMEM-resident (b_lo); other tiers ignore b_lo and use Mosaic's native
    lowering.
    """
    if precision == "high":
        def dot(a, b_pair):
            b_hi, b_lo = b_pair
            a_hi, a_lo = split_hi_lo(a)
            d = jax.lax.Precision.DEFAULT
            return (
                raw_dot(a_hi, b_hi, d) + raw_dot(a_hi, b_lo, d) + raw_dot(a_lo, b_hi, d)
            )
    else:
        _prec = (
            jax.lax.Precision.DEFAULT if precision == "default" else jax.lax.Precision.HIGHEST
        )

        def dot(a, b_pair):
            return raw_dot(a, b_pair[0], _prec)

    return dot
