"""Fused Pallas time-stretch kernel vs the XLA reference path (interpret
mode on CPU; the real Mosaic compile + parity gate runs on-chip via
`audioflow validate` and bench config 4)."""

import numpy as np
import pytest

import jax.numpy as jnp

from audioflow_tpu.ops import time_stretch
from audioflow_tpu.ops.pallas.timestretch import (
    _make_plan,
    _rationalize,
    supported,
    time_stretch_pallas,
)


def _signal(batch=2, seconds=2.0, sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    rows = [0.5 * np.sin(2 * np.pi * 523.0 * t) + 0.1 * rng.standard_normal(t.size)]
    for b in range(1, batch):
        rows.append(0.3 * np.sin(2 * np.pi * (180.0 + 60 * b) * t))
    return np.stack(rows).astype(np.float32)


#  2/3 and 0.5 regress the tile > ft_pad slow-down case: the masked-roll
# _select used to clamp its output to ft_pad frames (shape error at trace)
@pytest.mark.parametrize("rate", [1.25, 2.0, 1.5, 0.8, 2.0 / 3.0, 0.5])
def test_matches_xla_path(rate):
    xb = _signal()
    ref = np.asarray(time_stretch(jnp.asarray(xb), rate, 1024, 256, impl="matmul"))
    got = np.asarray(time_stretch_pallas(jnp.asarray(xb), rate, interpret=True))
    assert ref.shape == got.shape
    # skip the final-frame tail: the kernel interpolates toward the zero pad
    # where the XLA path clamps hi to the last frame (documented convention)
    n = ref.shape[-1] - 1024
    rel = np.max(np.abs(ref[:, :n] - got[:, :n])) / (np.abs(ref).max() + 1e-12)
    # the kernel's renormalized unit-phasor cumprod and the XLA path's angle
    # accumulation drift apart linearly in output frames (measured: error
    # grows monotonically along the output, 2.2e-4 -> 2.5e-3 at rate 0.5);
    # scale the budget with output length relative to the 0.8 anchor
    assert rel < 2e-3 * max(1.0, 0.8 / rate), rel


@pytest.mark.parametrize(
    "p,ip", [("high", None), ("high", "default"), ("default", "high")]
)
def test_precision_tiers_track_highest(p, ip):
    # Regression for the bank hi/lo decomposition: in "high" (bf16x3) mode
    # the bank shipped as the dot's hi operand must itself be
    # bf16-representable — passing the full-f32 bank double-counts the
    # residual wherever the dot doesn't truncate (exactly what CPU interpret
    # exposes: the bug measured 5.6e-2 rel; the correct split ~4e-5).
    xb = _signal()
    hi = np.asarray(
        time_stretch_pallas(jnp.asarray(xb), 1.25, precision="highest", interpret=True)
    )
    got = np.asarray(
        time_stretch_pallas(
            jnp.asarray(xb), 1.25, precision=p, inv_precision=ip, interpret=True
        )
    )
    # skip the final-frame region (same convention as test_matches_xla_path):
    # near-zero magnitudes there make increment phasors ill-conditioned, so
    # precision tiers legitimately diverge (5e-3 observed on a pure tone)
    n = hi.shape[-1] - 1024
    rel = np.max(np.abs(hi[:, :n] - got[:, :n])) / (np.abs(hi).max() + 1e-12)
    assert rel < 2e-4, (p, ip, rel)


def test_1d_input_and_length():
    x = _signal(batch=1)[0]
    y = np.asarray(time_stretch_pallas(jnp.asarray(x), 1.25, interpret=True))
    assert y.ndim == 1 and y.shape[-1] == int(round(len(x) / 1.25))


def test_supported_predicate_and_plans():
    assert supported(1.25) and supported(2.0) and supported(0.8)
    assert not supported(3.14159)  # irrational
    assert not supported(1.25, n_fft=1000, hop=256)  # hop does not divide
    p, q = _rationalize(1.25)
    plan = _make_plan(p, q, 1024, 256)
    # tile respects q-groups and the 8-sublane granularity
    assert plan.tile % q == 0 and plan.tile % 8 == 0
    assert plan.ft_pad % 8 == 0 and plan.a == plan.tile * p // q


def test_unsupported_rate_raises():
    with pytest.raises(ValueError):
        time_stretch_pallas(jnp.zeros((2, 8192)), 3.14159, interpret=True)


def test_auto_dispatch_stays_on_xla_for_cpu():
    # on the CPU backend time_stretch(impl="auto") must not route to pallas
    x = jnp.asarray(_signal(batch=1))
    y_auto = np.asarray(time_stretch(x, 1.25))
    y_mm = np.asarray(time_stretch(x, 1.25, impl="matmul"))
    np.testing.assert_array_equal(y_auto, y_mm)
