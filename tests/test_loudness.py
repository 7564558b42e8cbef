"""BS.1770-4 loudness: K-weighting design, gated LUFS, LRA, true peak.

Oracle strategy (SURVEY §4 golden-vector style): an independent float64
serial implementation (scipy.signal.lfilter + explicit block gating, written
from the spec in this file) and the spec's own calibration anchors (the 48 kHz
coefficient tables; the 997 Hz sine -> -3.01 LKFS identity).
"""

import numpy as np
import pytest
import scipy.signal as sig

import jax.numpy as jnp

from audioflow_tpu import ops


def _kw_sos(fs: float):
    shelf, hp = ops.k_weighting(fs)
    return [shelf.as_ba(), hp.as_ba()]


def _oracle_integrated(x64: np.ndarray, fs: int) -> float:
    """Float64 serial BS.1770-4 integrated loudness (mono, G=1)."""
    z = x64.astype(np.float64)
    for b, a in _kw_sos(fs):
        z = sig.lfilter(b, a, z)
    win, hop = int(0.4 * fs), int(0.1 * fs)
    n = 1 + (len(z) - win) // hop
    p = np.array([np.mean(z[i * hop : i * hop + win] ** 2) for i in range(n)])
    l = -0.691 + 10 * np.log10(np.maximum(p, 1e-12))
    keep = l > -70.0
    if not keep.any():
        return -np.inf
    rel = -0.691 + 10 * np.log10(p[keep].mean()) - 10.0
    keep &= l > rel
    if not keep.any():
        return -np.inf
    return -0.691 + 10 * np.log10(p[keep].mean())


def test_k_weighting_matches_itu_tables_at_48k():
    """The parameterized design must reproduce the BS.1770-4 Table 1/2
    coefficients (published rounded to ~1e-5) at 48 kHz."""
    shelf, hp = ops.k_weighting(48000.0)
    np.testing.assert_allclose(
        [shelf.b0, shelf.b1, shelf.b2, shelf.a1, shelf.a2],
        [1.53512485958697, -2.69169618940638, 1.19839281085285,
         -1.69065929318241, 0.73248077421585],
        atol=1e-10,
    )
    np.testing.assert_allclose(
        [hp.b0, hp.b1, hp.b2, hp.a1, hp.a2],
        [1.0, -2.0, 1.0, -1.99004745483398, 0.99007225036621],
        atol=1e-6,  # the spec's high-pass table is rounded more coarsely
    )


def test_997hz_fullscale_sine_reads_minus_3_01_lkfs():
    """The spec's calibration identity: a 0 dBFS 997 Hz sine measures
    -3.01 LKFS (the -0.691 offset cancels the shelf gain at 997 Hz)."""
    fs = 48000
    t = np.arange(5 * fs) / fs
    x = np.sin(2 * np.pi * 997.0 * t).astype(np.float32)
    li = float(ops.integrated_loudness(jnp.asarray(x), fs))
    assert abs(li - (-3.01)) < 0.05, li


def test_gain_linearity():
    fs = 16000
    rng = np.random.default_rng(0)
    x = (0.1 * rng.standard_normal(fs * 3)).astype(np.float32)
    l0 = float(ops.integrated_loudness(jnp.asarray(x), fs))
    l1 = float(ops.integrated_loudness(jnp.asarray(0.25 * x), fs))
    assert abs((l0 - l1) - 20 * np.log10(4.0)) < 0.02


def test_integrated_matches_float64_oracle_batched():
    fs = 16000
    rng = np.random.default_rng(1)
    # mixed program: tone bursts + noise + near-silence, 4 lanes
    t = np.arange(4 * fs) / fs
    lanes = []
    for k in range(4):
        x = 0.2 * np.sin(2 * np.pi * (200 + 137 * k) * t)
        x[: fs // 2] *= 0.001  # quiet head exercises the absolute gate
        x += 0.01 * rng.standard_normal(x.size)
        lanes.append(x)
    xb = np.stack(lanes).astype(np.float32)
    got = np.asarray(ops.integrated_loudness(jnp.asarray(xb), fs))
    want = np.array([_oracle_integrated(l, fs) for l in lanes])
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_gating_ignores_silence():
    """A loud half followed by digital silence must measure (close to) the
    loud half's loudness, not the ungated mean (which would be ~3 dB low)."""
    fs = 16000
    t = np.arange(2 * fs) / fs
    loud = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    x = np.concatenate([loud, np.zeros(2 * fs)]).astype(np.float32)
    li = float(ops.integrated_loudness(jnp.asarray(x), fs))
    l_loud = float(ops.integrated_loudness(jnp.asarray(loud.astype(np.float32)), fs))
    assert abs(li - l_loud) < 0.5
    ungated = -0.691 + 10 * np.log10(
        np.mean(np.asarray(ops.k_weight(jnp.asarray(x), fs)) ** 2)
    )
    assert li > ungated + 2.0


def test_momentary_shortterm_shapes_and_steadiness():
    fs = 16000
    t = np.arange(5 * fs) / fs
    x = jnp.asarray((0.3 * np.sin(2 * np.pi * 500.0 * t)).astype(np.float32))
    m = np.asarray(ops.momentary_loudness(x, fs))
    s = np.asarray(ops.shortterm_loudness(x, fs))
    assert m.shape == (1 + (5 * fs - int(0.4 * fs)) // int(0.1 * fs),)
    assert s.shape == (1 + (5 * fs - 3 * fs) // int(0.1 * fs),)
    # steady tone: every block reads the same level
    assert m.std() < 0.01 and s.std() < 0.01
    assert abs(m.mean() - s.mean()) < 0.02


def test_loudness_range_steady_vs_two_level():
    fs = 16000
    t = np.arange(10 * fs) / fs
    steady = (0.3 * np.sin(2 * np.pi * 300.0 * t)).astype(np.float32)
    assert float(ops.loudness_range(jnp.asarray(steady), fs)) < 0.1
    two = steady.copy()
    two[5 * fs :] *= 10 ** (-10 / 20)  # second half 10 LU quieter
    lra = float(ops.loudness_range(jnp.asarray(two), fs))
    assert 7.0 < lra < 11.0, lra  # p95-p10 of a 10 LU step


def test_true_peak_catches_intersample_overs():
    """fs/4 sine at 45 degrees: samples hit +-0.7071 (-3.01 dBFS) but the
    continuous waveform peaks at 1.0 (0 dBTP)."""
    fs = 48000
    n = np.arange(fs)
    x = np.sin(2 * np.pi * 0.25 * n + np.pi / 4).astype(np.float32)
    sample_peak = 20 * np.log10(np.abs(x).max())
    tp = float(ops.true_peak(jnp.asarray(x), fs))
    assert abs(sample_peak - (-3.01)) < 0.01
    assert tp > -0.35, tp  # recovers (nearly) the full inter-sample peak
    assert float(ops.true_peak(jnp.asarray(x), fs, oversample=1)) == pytest.approx(
        sample_peak, abs=1e-3
    )


def test_normalize_loudness_hits_target_and_respects_ceiling():
    fs = 16000
    t = np.arange(4 * fs) / fs
    x = jnp.asarray((0.05 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32))
    y = ops.normalize_loudness(x, fs, target_lufs=-23.0, max_true_peak_db=None)
    assert abs(float(ops.integrated_loudness(y, fs)) - (-23.0)) < 0.05
    # a target hotter than the ceiling allows: gain must stop at -1 dBTP
    y2 = ops.normalize_loudness(x, fs, target_lufs=-1.0, max_true_peak_db=-1.0)
    assert float(ops.true_peak(y2, fs)) <= -0.9
    # silence passes through unscaled (gain would be +inf otherwise)
    z = jnp.zeros(4 * fs, jnp.float32)
    np.testing.assert_array_equal(np.asarray(ops.normalize_loudness(z, fs)), 0.0)


def test_too_short_signal_raises():
    with pytest.raises(ValueError):
        ops.integrated_loudness(jnp.zeros(1000, jnp.float32), 16000)
