"""Sequence decoding: Viterbi vs brute force, banded max-plus vs dense,
DTW vs a serial float64 oracle."""

import itertools

import numpy as np
import pytest

import jax.numpy as jnp

from audioflow_tpu import ops
from audioflow_tpu.ops.sequence import (
    dtw,
    max_plus_band,
    max_plus_band_argmax,
    transition_local,
    viterbi,
)


def _brute_viterbi(log_obs, log_trans, log_init):
    t, s = log_obs.shape
    best, bp = None, -np.inf
    for path in itertools.product(range(s), repeat=t):
        p = log_init[path[0]] + log_obs[0, path[0]]
        for i in range(1, t):
            p += log_trans[path[i - 1], path[i]] + log_obs[i, path[i]]
        if p > bp:
            bp, best = p, path
    return np.asarray(best), bp


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_viterbi_matches_brute_force(seed):
    rng = np.random.default_rng(seed)
    t, s = 6, 4
    lo = rng.standard_normal((t, s)).astype(np.float32)
    a = rng.random((s, s))
    a /= a.sum(1, keepdims=True)
    la = np.log(a).astype(np.float32)
    li = np.log(np.full(s, 1.0 / s)).astype(np.float32)
    states, lp = viterbi(jnp.asarray(lo), jnp.asarray(la), jnp.asarray(li))
    want, wlp = _brute_viterbi(lo.astype(np.float64), la, li)
    assert np.array_equal(np.asarray(states), want)
    assert abs(float(lp) - wlp) < 1e-4


def test_viterbi_batched_and_t1():
    rng = np.random.default_rng(3)
    lo = rng.standard_normal((2, 3, 5, 4)).astype(np.float32)  # [B1, B2, T, S]
    a = rng.random((4, 4))
    a /= a.sum(1, keepdims=True)
    la = np.log(a).astype(np.float32)
    states, lp = viterbi(jnp.asarray(lo), jnp.asarray(la))
    assert states.shape == (2, 3, 5) and lp.shape == (2, 3)
    # each batch element independently matches the unbatched call
    s0, _ = viterbi(jnp.asarray(lo[1, 2]), jnp.asarray(la))
    assert np.array_equal(np.asarray(states)[1, 2], np.asarray(s0))
    # T == 1: decode is just argmax of init + obs
    s1, _ = viterbi(jnp.asarray(lo[:, :, :1, :]), jnp.asarray(la))
    assert np.array_equal(np.asarray(s1)[..., 0], np.argmax(lo[:, :, 0, :], -1))


def test_max_plus_band_equals_dense():
    rng = np.random.default_rng(4)
    s, half = 11, 3
    delta = rng.standard_normal((2, s)).astype(np.float32)
    lk = rng.standard_normal(2 * half + 1).astype(np.float32)
    got = np.asarray(max_plus_band(jnp.asarray(delta), jnp.asarray(lk)))
    got_v, got_a = max_plus_band_argmax(jnp.asarray(delta), jnp.asarray(lk))
    want = np.full_like(delta, -np.inf)
    want_a = np.zeros(delta.shape, np.int64)
    for j in range(s):
        for k in range(2 * half + 1):
            i = j + k - half
            if 0 <= i < s:
                cand = delta[:, i] + lk[k]
                take = cand > want[:, j]
                want_a[take, j] = k
                want[take, j] = cand[take]
    assert np.allclose(got, want, atol=1e-6)
    assert np.allclose(np.asarray(got_v), want, atol=1e-6)
    assert np.array_equal(np.asarray(got_a), want_a)


def test_transition_local_rows_stochastic():
    a = transition_local(9, 5)
    assert a.shape == (9, 9)
    assert np.allclose(a.sum(1), 1.0)
    # movement capped at width // 2
    assert a[0, 3] == 0.0 and a[4, 1] == 0.0 and a[4, 2] > 0.0
    with pytest.raises(ValueError):
        transition_local(0, 3)
    with pytest.raises(ValueError):
        transition_local(3, 0)


def _dtw_oracle(cost):
    n, m = cost.shape
    d = np.full((n, m), np.inf)
    for i in range(n):
        for j in range(m):
            if i == 0 and j == 0:
                prev = 0.0
            else:
                prev = min(
                    d[i - 1, j - 1] if i > 0 and j > 0 else np.inf,
                    d[i - 1, j] if i > 0 else np.inf,
                    d[i, j - 1] if j > 0 else np.inf,
                )
            d[i, j] = cost[i, j] + prev
    return d


@pytest.mark.parametrize("shape", [(7, 9), (9, 7), (1, 5), (5, 1), (1, 1), (12, 12)])
def test_dtw_accumulated_cost_matches_oracle(shape):
    rng = np.random.default_rng(sum(shape))
    c = rng.random(shape).astype(np.float32)
    acc, path = dtw(cost=c)
    want = _dtw_oracle(c.astype(np.float64))
    assert np.allclose(np.asarray(acc), want, atol=1e-5)
    # path validity: monotone unit steps from (0,0) to (N-1, M-1)
    assert tuple(path[0]) == (0, 0) and tuple(path[-1]) == (shape[0] - 1, shape[1] - 1)
    d = np.diff(path, axis=0)
    assert ((d >= 0) & (d <= 1)).all() and (d.sum(1) >= 1).all()
    # path optimality: its cost equals the accumulated optimum
    assert abs(sum(c[i, j] for i, j in path) - want[-1, -1]) < 1e-4


def test_dtw_self_alignment_is_diagonal():
    rng = np.random.default_rng(11)
    a = rng.standard_normal((8, 3)).astype(np.float32)
    acc, path = dtw(a, a)
    # the Gram-formulated euclidean distance has ~1e-3 cancellation noise on
    # the diagonal (sqrt of a ~1e-6 residual), so "zero" is loose here
    assert float(np.asarray(acc)[-1, -1]) < 0.05
    assert (path[:, 0] == path[:, 1]).all()


def test_dtw_metrics_and_errors():
    rng = np.random.default_rng(12)
    x = rng.standard_normal((5, 4)).astype(np.float32)
    y = rng.standard_normal((6, 4)).astype(np.float32)
    acc_e, _ = dtw(x, y, metric="euclidean")
    acc_c, _ = dtw(x, y, metric="cosine")
    assert np.asarray(acc_e).shape == (5, 6) and np.asarray(acc_c).shape == (5, 6)
    with pytest.raises(ValueError):
        dtw(x, y, metric="manhattan")
    with pytest.raises(ValueError):
        dtw(x)
    with pytest.raises(ValueError):
        dtw(cost=np.zeros((2, 2, 2)))


def test_exports_on_ops():
    for name in ("viterbi", "dtw", "max_plus_band", "transition_local"):
        assert hasattr(ops, name)
