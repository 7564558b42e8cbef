"""Structure analysis: self-similarity oracle, SAT novelty vs the direct
sliding checkerboard, boundary detection on synthetic sections."""

import numpy as np
import pytest

import jax.numpy as jnp

from audioflow_tpu import ops


def test_self_similarity_matches_numpy(rng):
    x = rng.standard_normal((20, 6)).astype(np.float32)
    got = np.asarray(ops.self_similarity(jnp.asarray(x)))
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    np.testing.assert_allclose(got, xn @ xn.T, atol=1e-5)
    got_d = np.asarray(ops.self_similarity(jnp.asarray(x), metric="dot"))
    np.testing.assert_allclose(got_d, x @ x.T, atol=1e-4)
    with pytest.raises(ValueError):
        ops.self_similarity(jnp.asarray(x), metric="euclid")


def test_cross_similarity_shape_and_values(rng):
    a = rng.standard_normal((5, 4)).astype(np.float32)
    b = rng.standard_normal((7, 4)).astype(np.float32)
    got = np.asarray(ops.cross_similarity(jnp.asarray(a), jnp.asarray(b)))
    assert got.shape == (5, 7)
    an = a / np.linalg.norm(a, axis=1, keepdims=True)
    bn = b / np.linalg.norm(b, axis=1, keepdims=True)
    np.testing.assert_allclose(got, an @ bn.T, atol=1e-5)


def test_recurrence_matrix_knn_properties(rng):
    x = rng.standard_normal((30, 5)).astype(np.float32)
    r = np.asarray(ops.recurrence_matrix(jnp.asarray(x), k=4, width=2))
    assert r.shape == (30, 30) and set(np.unique(r)) <= {0.0, 1.0}
    # band excluded
    for d in (-1, 0, 1):
        assert np.diagonal(r, d).sum() == 0
    # ties aside, each row links ~k frames (>= k guaranteed by >= kth value)
    assert (r.sum(1) >= 4).all() and (r.sum(1) <= 8).all()
    rs = np.asarray(ops.recurrence_matrix(jnp.asarray(x), k=4, width=2, sym=True))
    assert np.array_equal(rs, rs.T)
    with pytest.raises(ValueError):
        ops.recurrence_matrix(jnp.asarray(x), width=0)


def _novelty_direct(s, l):
    t = s.shape[0]
    nov = np.zeros(t)
    for i in range(t):
        lo, hi = max(i - l, 0), min(i + l, t)
        past = s[lo:i, lo:i].sum()
        future = s[i:hi, i:hi].sum()
        cross = s[lo:i, i:hi].sum()
        area = (i - lo) * (hi - i)
        if area > 0:
            nov[i] = max((past + future - 2 * cross) / area, 0.0)
    return nov


@pytest.mark.parametrize("t,l", [(40, 4), (25, 8), (10, 16)])
def test_novelty_sat_matches_direct(rng, t, l):
    s = rng.random((t, t)).astype(np.float32)
    s = (s + s.T) / 2
    got = np.asarray(ops.novelty_curve(jnp.asarray(s), kernel_width=2 * l))
    want = _novelty_direct(s.astype(np.float64), l)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_segment_boundaries_on_synthetic_sections(rng):
    # three homogeneous sections of distinct feature distributions
    c = np.eye(3, 8, dtype=np.float32) * 4
    feats = np.concatenate([
        np.tile(c[0], (40, 1)), np.tile(c[1], (40, 1)), np.tile(c[2], (40, 1))
    ]) + 0.1 * rng.standard_normal((120, 8)).astype(np.float32)
    mask, nov = ops.segment_boundaries(jnp.asarray(feats), kernel_width=16)
    mask = np.asarray(mask)
    hits = np.where(mask)[0]
    # a boundary within +-3 frames of each true change, no spurious interior peaks
    for b in (40, 80):
        assert (np.abs(hits - b) <= 3).any(), (b, hits)
    assert len(hits) <= 4, hits
    assert np.asarray(nov).shape == (120,)
