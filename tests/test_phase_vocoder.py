import numpy as np
import pytest

import jax.numpy as jnp

from audioflow_tpu.ops import phase_vocoder, pitch_shift, stft, time_stretch


def _dominant_freq(y, sr):
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    return np.argmax(spec) * sr / len(y)


def test_identity_rate_round_trip():
    sr = 16000
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    y = np.asarray(time_stretch(jnp.asarray(x), rate=1.0))
    assert y.shape == x.shape
    m = 2048
    np.testing.assert_allclose(y[m:-m], x[m:-m], atol=5e-3)


@pytest.mark.parametrize("rate", [0.5, 2.0])
def test_stretch_length_and_pitch_preserved(rate):
    sr, f0 = 16000, 523.0
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)
    y = np.asarray(time_stretch(jnp.asarray(x), rate=rate))
    assert abs(len(y) - int(round(len(x) / rate))) <= 1
    assert abs(_dominant_freq(y[2048:-2048], sr) - f0) < 8.0


def test_pitch_shift_moves_frequency():
    sr, f0 = 16000, 440.0
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)
    up = np.asarray(pitch_shift(jnp.asarray(x), 12.0, sample_rate=sr))
    assert up.shape == x.shape
    got = _dominant_freq(up[2048:-2048], sr)
    assert abs(got - 2 * f0) < 15.0


def test_pitch_shift_irrational_factor_small_bank():
    # 2^(7/12) is irrational: the resample ratio must come from a small
    # rational approximation (denominator <= 64), not int(sr * factor) vs sr
    # (coprime with 16000 -> a 16000-phase polyphase bank and a multi-minute
    # host-side plan build). Accuracy bar: < 1 cent pitch error end to end.
    sr, f0 = 16000, 440.0
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)
    up = np.asarray(pitch_shift(jnp.asarray(x), 7.0, sample_rate=sr))
    assert up.shape == x.shape
    got = _dominant_freq(up[2048:-2048], sr)
    want = f0 * 2 ** (7 / 12)
    assert abs(got - want) < 15.0


def test_phase_vocoder_spec_shape(rng):
    x = jnp.asarray(rng.standard_normal(8192).astype(np.float32))
    spec = stft(x, n_fft=1024, hop=256)
    out = phase_vocoder(spec, rate=2.0, hop=256, n_fft=1024)
    assert out.shape[-1] == spec.shape[-1]
    assert out.shape[-2] == int(np.ceil(spec.shape[-2] / 2.0))


def test_invalid_rate_raises():
    with pytest.raises(ValueError):
        time_stretch(jnp.zeros(4096), rate=0.0)
