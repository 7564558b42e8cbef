"""Randomized property sweep over the ops layer (ROADMAP item 9).

hypothesis is not installed in this image, so this is a hand-rolled
property-based pass: each test draws many random parameterizations from a
seeded generator and asserts an *invariant* (linearity, bounds, round-trips,
scaling laws) rather than a golden value. Mirrors the reference's pure-logic
unit-test style (SURVEY §4) at sweep granularity.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audioflow_tpu import ops


def _sig(rng, n, amp=0.5):
    return (amp * rng.standard_normal(n)).astype(np.float32)


def test_resample_identity_any_rate(rng):
    for _ in range(8):
        sr = int(rng.integers(4000, 96000))
        x = _sig(rng, int(rng.integers(512, 4096)))
        y = np.asarray(ops.resample(jnp.asarray(x), sr, sr))
        np.testing.assert_array_equal(y, x)


def test_resample_is_linear(rng):
    # polyphase filtering is LTI: resample(a*x + b*y) == a*R(x) + b*R(y)
    for sr_in, sr_out in ((44100, 16000), (16000, 48000), (22050, 16000)):
        x = _sig(rng, 2048)
        y = _sig(rng, 2048)
        a, b = float(rng.uniform(-2, 2)), float(rng.uniform(-2, 2))
        lhs = np.asarray(ops.resample(jnp.asarray(a * x + b * y), sr_in, sr_out))
        rx = np.asarray(ops.resample(jnp.asarray(x), sr_in, sr_out))
        ry = np.asarray(ops.resample(jnp.asarray(y), sr_in, sr_out))
        np.testing.assert_allclose(lhs, a * rx + b * ry, atol=2e-5)


def test_limiter_bound_holds_for_any_input(rng):
    for _ in range(6):
        thresh_db = float(rng.uniform(-20, -0.5))
        amp = float(rng.uniform(0.1, 4.0))
        x = _sig(rng, 4096, amp=amp)
        y = np.asarray(ops.limiter(jnp.asarray(x), thresh_db, sample_rate=16000))
        lin = 10 ** (thresh_db / 20)
        assert np.abs(y).max() <= lin * (1 + 1e-4), (thresh_db, amp)


def test_quantize_dequantize_round_trip(rng):
    x = _sig(rng, 8192, amp=1.5)  # includes out-of-range values -> clamp
    q = np.asarray(ops.quantize_i16(jnp.asarray(x)))
    d = np.asarray(ops.dequantize_i16(jnp.asarray(q)))
    clamped = np.clip(x, -1, 1)
    assert q.dtype == np.int16
    # quantize scales by 32767 (reference parity) but dequantize divides by
    # 32768 (symmetric convention): round-trip error < 2 LSB, toward zero
    assert np.abs(d - clamped).max() < 2.0 / 32768.0
    assert np.all(np.abs(d) <= np.abs(clamped) + 1e-7)


def test_to_mono_matches_channel_mean(rng):
    for ch in (1, 2, 4, 7):
        x = rng.standard_normal((ch, 1024)).astype(np.float32)
        inter = x.T.reshape(-1)  # interleaved, reference layout (capture.rs:30-42)
        y = np.asarray(ops.to_mono(jnp.asarray(inter), ch))
        np.testing.assert_allclose(y, x.mean(0), rtol=0, atol=1e-6)


@pytest.mark.parametrize("n_fft,hop", [(512, 128), (1024, 256), (256, 64)])
def test_stft_istft_round_trip(rng, n_fft, hop):
    x = _sig(rng, 8192)
    spec = ops.stft(jnp.asarray(x), n_fft, hop)
    y = np.asarray(ops.istft(spec, n_fft, hop))
    m = n_fft  # edges lack full overlap
    n = min(len(y), len(x))
    np.testing.assert_allclose(y[m : n - m], x[m : n - m], atol=2e-4)


def test_vad_energy_scaling_law(rng):
    # mean-square energy (no sqrt, vad.rs:157-168): E(g*x) = g^2 E(x),
    # so dBFS moves by exactly 40*log10(g)
    x = _sig(rng, 1600, amp=0.3)
    g = 2.0
    e1 = float(ops.mean_square_energy(jnp.asarray(x)))
    e2 = float(ops.mean_square_energy(jnp.asarray(g * x)))
    np.testing.assert_allclose(e2, g * g * e1, rtol=1e-5)
    d1 = float(ops.energy_to_dbfs(jnp.asarray(e1)))
    d2 = float(ops.energy_to_dbfs(jnp.asarray(e2)))
    np.testing.assert_allclose(d2 - d1, 40 * np.log10(g), atol=1e-3)


def test_vad_level_thresholds_are_ordered():
    # aggressive detects speech on quieter audio (lowest threshold);
    # relaxed needs the loudest signal before tripping (vad.rs:8-17)
    th = {k: v.threshold_db for k, v in ops.VAD_LEVELS.items()}
    assert th["aggressive"] < th["balanced"] < th["relaxed"]


def test_gain_db_scales_amplitude(rng):
    x = _sig(rng, 1024)
    np.testing.assert_allclose(np.asarray(ops.gain_db(jnp.asarray(x), 0.0)), x, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(ops.gain_db(jnp.asarray(x), 20.0)), 10 * x, rtol=1e-5
    )


def test_biquad_chain_is_linear(rng):
    secs = (ops.highpass(100.0, 16000), ops.peaking(1000.0, 16000, 5.0, 1.0))
    x = _sig(rng, 2048)
    y = _sig(rng, 2048)
    a, b = 1.7, -0.4
    lhs, _ = ops.biquad_chain(jnp.asarray(a * x + b * y), secs)
    rx, _ = ops.biquad_chain(jnp.asarray(x), secs)
    ry, _ = ops.biquad_chain(jnp.asarray(y), secs)
    np.testing.assert_allclose(
        np.asarray(lhs), a * np.asarray(rx) + b * np.asarray(ry), atol=3e-5
    )


def test_mel_power_is_monotone_in_gain(rng):
    # log-mel of a louder signal is >= elementwise (filterbank is nonnegative)
    x = _sig(rng, 16000, amp=0.2)
    fb = ops.mel_filterbank(513, 64, 16000)
    lm1 = np.asarray(ops.log_mel(ops.power(ops.stft(jnp.asarray(x), 1024, 256)), fb))
    lm2 = np.asarray(ops.log_mel(ops.power(ops.stft(jnp.asarray(4 * x), 1024, 256)), fb))
    assert np.all(lm2 >= lm1 - 1e-5)


def test_time_stretch_output_length_law(rng):
    for rate in (0.7, 1.3, 1.9):
        n = int(rng.integers(8192, 16384))
        x = _sig(rng, n)
        y = np.asarray(ops.time_stretch(jnp.asarray(x), rate=rate))
        assert abs(len(y) - int(round(n / rate))) <= 1


def test_fir_is_linear_and_time_invariant(rng):
    h = ops.fir_design(33, 2500.0, 16000.0)
    x = _sig(rng, 2048)
    y = _sig(rng, 2048)
    lhs, _ = ops.fir_apply(jnp.asarray(2.0 * x - 0.5 * y), h)
    rx, _ = ops.fir_apply(jnp.asarray(x), h)
    ry, _ = ops.fir_apply(jnp.asarray(y), h)
    np.testing.assert_allclose(np.asarray(lhs), 2.0 * np.asarray(rx) - 0.5 * np.asarray(ry), atol=1e-5)
    # time invariance: shifting the (zero-padded) input shifts the output
    xs = np.concatenate([np.zeros(64, np.float32), x[:-64]])
    ys, _ = ops.fir_apply(jnp.asarray(xs), h)
    np.testing.assert_allclose(np.asarray(ys)[64:], np.asarray(rx)[:-64], atol=1e-5)


def test_loudness_gain_law_any_signal(rng):
    # +g dB of gain moves integrated loudness by exactly +g LU
    for _ in range(3):
        x = _sig(rng, int(rng.integers(16000, 3 * 16000)), amp=float(rng.uniform(0.05, 0.4)))
        g = float(rng.uniform(-18, 12))
        l0 = float(ops.integrated_loudness(jnp.asarray(x), 16000))
        l1 = float(ops.integrated_loudness(jnp.asarray(x * 10 ** (g / 20)), 16000))
        assert abs((l1 - l0) - g) < 0.15, (g, l1 - l0)


def test_yin_is_amplitude_invariant(rng):
    t = np.arange(16000) / 16000
    f = float(rng.uniform(100, 800))
    x = np.sin(2 * np.pi * f * t).astype(np.float32)
    a = np.asarray(ops.yin(jnp.asarray(0.9 * x), 16000, fmin=80, fmax=1200))
    b = np.asarray(ops.yin(jnp.asarray(0.01 * x), 16000, fmin=80, fmax=1200))
    np.testing.assert_allclose(a[4:-4], b[4:-4], rtol=1e-3)


def test_compressor_never_amplifies_and_is_monotone(rng):
    x = _sig(rng, 8192, amp=0.8)
    y = np.asarray(ops.compressor(jnp.asarray(x), -20.0, 4.0, 80.0, 16000))
    assert (np.abs(y) <= np.abs(x) + 1e-6).all()  # downward only
    # stronger ratio compresses at least as much everywhere
    y8 = np.asarray(ops.compressor(jnp.asarray(x), -20.0, 8.0, 80.0, 16000))
    assert (np.abs(y8) <= np.abs(y) + 1e-6).all()


def test_hpss_components_reconstruct_at_margin_one(rng):
    """margin=1 Wiener masks sum to ~1, so harmonic + percussive ~= the
    ISTFT round-trip of the input (not the raw input: COLA edges differ)."""
    x = _sig(rng, 16000, amp=0.3)
    y_h, y_p = ops.hpss(jnp.asarray(x), 1024, 256)
    rt = ops.istft(ops.stft(jnp.asarray(x), 1024, 256), 1024, 256, length=16000)
    np.testing.assert_allclose(
        np.asarray(y_h) + np.asarray(y_p), np.asarray(rt), atol=2e-3
    )


def test_griffin_lim_magnitude_projection_is_idempotent_on_consistent_input(rng):
    """A spectrogram that came FROM a real signal is already consistent:
    one GL iteration seeded with the true phase must return (nearly) the
    same signal."""
    x = _sig(rng, 8000, amp=0.3)
    spec = ops.stft(jnp.asarray(x), 512, 128)
    y = ops.griffin_lim(
        jnp.abs(spec), 512, 128, n_iter=1, momentum=0.0,
        init_phase=jnp.angle(spec), length=8000,
    )
    np.testing.assert_allclose(np.asarray(y)[256:-768], x[256:-768], atol=1e-3)
