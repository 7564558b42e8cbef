"""LPC: Levinson-Durbin vs a serial float64 oracle, AR-model recovery."""

import numpy as np
import pytest

import jax.numpy as jnp

from audioflow_tpu import ops


def _levinson_oracle(r, order):
    a = np.zeros(order + 1)
    a[0] = 1.0
    e = r[0]
    for i in range(1, order + 1):
        s = sum(a[j] * r[i - j] for j in range(i))
        k = -s / e if e > 0 else 0.0
        a_new = a.copy()
        for j in range(1, i + 1):
            a_new[j] = a[j] + k * a[i - j]
        a, e = a_new, e * (1.0 - k * k)
    return a, e


@pytest.mark.parametrize("order", [2, 8, 16])
def test_lpc_from_autocorr_matches_oracle(order, rng):
    r = np.zeros(order + 1)
    x = rng.standard_normal(4000)
    for lag in range(order + 1):
        r[lag] = (x[: 4000 - lag] * x[lag:]).sum()
    a, e = ops.lpc_from_autocorr(jnp.asarray(r.astype(np.float32)[None]), order)
    wa, we = _levinson_oracle(r, order)
    np.testing.assert_allclose(np.asarray(a)[0], wa, rtol=1e-3, atol=1e-4)
    assert abs(float(e[0]) - we) / we < 1e-3


def test_lpc_recovers_ar_model(rng):
    # AR(2): x[n] = 1.3 x[n-1] - 0.6 x[n-2] + w[n]  ->  a = [1, -1.3, 0.6]
    n = 30000
    w = rng.standard_normal(n)
    x = np.zeros(n)
    for i in range(2, n):
        x[i] = 1.3 * x[i - 1] - 0.6 * x[i - 2] + w[i]
    a = np.asarray(ops.lpc(jnp.asarray(x[2000:].astype(np.float32)), 2))
    np.testing.assert_allclose(a, [1.0, -1.3, 0.6], atol=0.02)


def test_lpc_batched_and_residual(rng):
    x = rng.standard_normal((3, 5, 1024)).astype(np.float32)
    a = ops.lpc(jnp.asarray(x), 8)
    assert a.shape == (3, 5, 9)
    assert np.allclose(np.asarray(a)[..., 0], 1.0)
    e = np.asarray(ops.lpc_residual_energy(jnp.asarray(x), 8))
    assert e.shape == (3, 5) and (e > 0).all()
    # whitening: residual energy below the raw energy (lag-0 autocorr)
    r0 = (x.astype(np.float64) ** 2).sum(-1)
    assert (e < r0 + 1e-6).all()


def test_lpc_zero_input_and_errors():
    a, e = ops.lpc_from_autocorr(jnp.zeros((2, 9)), 8)
    assert np.allclose(np.asarray(a), np.eye(9)[0]) and np.allclose(np.asarray(e), 0.0)
    with pytest.raises(ValueError):
        ops.lpc_from_autocorr(jnp.zeros((2, 9)), 0)
    with pytest.raises(ValueError):
        ops.lpc_from_autocorr(jnp.zeros((2, 4)), 8)
