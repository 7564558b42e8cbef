"""Spectral/time-domain descriptors vs float64 numpy oracles (librosa
conventions, implemented independently here from the definitions)."""

import numpy as np
import pytest

import jax.numpy as jnp

from audioflow_tpu import ops

FS, NFFT, HOP = 16000, 1024, 256


@pytest.fixture
def mag(rng):
    x = rng.standard_normal((2, FS)).astype(np.float32)
    x[1] = 0.5 * np.sin(2 * np.pi * 1000.0 * np.arange(FS) / FS)
    m = ops.spectrogram(jnp.asarray(x), NFFT, HOP, power=False, impl="fft")
    return np.asarray(m)


def _freqs():
    return np.arange(NFFT // 2 + 1, dtype=np.float64) * FS / NFFT


def test_centroid_oracle_and_pure_tone(mag):
    got = np.asarray(ops.spectral_centroid(jnp.asarray(mag), FS, NFFT))
    m64 = mag.astype(np.float64)
    want = (m64 * _freqs()).sum(-1) / np.maximum(m64.sum(-1), 1e-10)
    np.testing.assert_allclose(got, want, rtol=1e-4)
    # lane 1 is a 1 kHz tone: centroid sits at the tone (interior frames;
    # the center-pad reflection distorts the first/last couple of frames)
    assert np.abs(got[1][3:-3] - 1000.0).max() < 25.0


def test_bandwidth_oracle_tone_vs_noise(mag):
    got = np.asarray(ops.spectral_bandwidth(jnp.asarray(mag), FS, NFFT))
    m64 = mag.astype(np.float64)
    c = (m64 * _freqs()).sum(-1) / np.maximum(m64.sum(-1), 1e-10)
    dev = np.abs(_freqs()[None, None, :] - c[..., None]) ** 2
    want = np.sqrt((m64 * dev).sum(-1) / np.maximum(m64.sum(-1), 1e-10))
    np.testing.assert_allclose(got, want, rtol=1e-3)
    # a pure tone is far narrower than white noise
    assert got[1].mean() < 0.2 * got[0].mean()


def test_rolloff_oracle_and_bounds(mag):
    got = np.asarray(ops.spectral_rolloff(jnp.asarray(mag), FS, NFFT, 0.85))
    m64 = mag.astype(np.float64)
    cum = np.cumsum(m64, axis=-1)
    want = _freqs()[np.argmax(cum >= 0.85 * cum[..., -1:], axis=-1)]
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert (got >= 0).all() and (got <= FS / 2).all()
    # tone lane rolls off at/just above the tone (interior frames)
    assert np.abs(got[1][3:-3] - 1000.0).max() < 40.0


def test_flatness_noise_vs_tone(mag):
    got = np.asarray(ops.spectral_flatness(jnp.asarray(mag)))
    m64 = np.maximum(mag.astype(np.float64), 1e-10) ** 2
    want = np.exp(np.mean(np.log(m64), -1)) / np.mean(m64, -1)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-6)
    assert got[0].mean() > 0.2  # white noise: flat-ish
    assert got[1].mean() < 0.01  # pure tone: peaky


def test_flux_constant_spectrum_is_zero(mag):
    tone = np.asarray(ops.spectral_flux(jnp.asarray(mag)))
    assert tone.shape == mag.shape[:-1]
    assert tone[..., 0].max() == 0.0  # frame 0 fluxes against itself
    # steady tone: near-zero flux on interior frames (the center-pad
    # reflection makes the first/last frames differ); noise: large flux
    assert tone[1, 3:-3].mean() < 1e-3 * tone[0, 3:-3].mean()
    rect = np.asarray(ops.spectral_flux(jnp.asarray(mag), rectify=True))
    assert (rect <= tone + 1e-7).all()


def test_zcr_sine_rate():
    f0 = 500.0
    t = np.arange(FS) / FS
    x = jnp.asarray(np.sin(2 * np.pi * f0 * t).astype(np.float32))
    z = np.asarray(ops.zero_crossing_rate(x, 2048, 512))
    # a sine crosses zero 2*f0 times/sec -> rate 2*f0/FS per sample
    np.testing.assert_allclose(z, 2 * f0 / FS, rtol=0.02)


def test_frame_rms_constant_tone():
    t = np.arange(FS) / FS
    x = jnp.asarray((0.4 * np.sin(2 * np.pi * 997.0 * t)).astype(np.float32))
    r = np.asarray(ops.frame_rms(x, 2048, 512))
    np.testing.assert_allclose(r, 0.4 / np.sqrt(2), rtol=0.01)


def test_spectral_features_stack_order(mag):
    feats = ("flatness", "centroid")
    got = np.asarray(ops.spectral_features(jnp.asarray(mag), FS, NFFT, feats))
    assert got.shape == (*mag.shape[:-1], 2)
    np.testing.assert_allclose(got[..., 0], np.asarray(ops.spectral_flatness(jnp.asarray(mag))), rtol=1e-6)
    np.testing.assert_allclose(
        got[..., 1], np.asarray(ops.spectral_centroid(jnp.asarray(mag), FS, NFFT)), rtol=1e-6
    )
    with pytest.raises(ValueError):
        ops.spectral_features(jnp.asarray(mag), FS, NFFT, ("nope",))


def test_chroma_pitch_classes_and_node(rng):
    """A440 and C tones land in the right pitch classes across octaves;
    the Chroma node streams exactly (stateless per frame)."""
    from audioflow_tpu.graph import Chroma, Spectrogram, chain

    fs = 22050
    t = np.arange(fs) / fs
    for f, idx in ((440.0, 9), (880.0, 9), (261.63, 0)):
        x = jnp.asarray((0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32))
        p = ops.spectrogram(x, 2048, 512, center=False)
        c = np.asarray(ops.chroma(p, fs, 2048))
        assert c.shape[-1] == 12
        assert c[4:-4].mean(axis=0).argmax() == idx, f
        assert c.max() <= 1.0 + 1e-6  # per-frame max-norm
    g = chain(Spectrogram(2048, 512, center=False), Chroma(), input_rate=fs)
    x = (0.3 * rng.standard_normal(8 * 4096)).astype(np.float32)
    off = np.asarray(g.chain(jnp.asarray(x)))
    chunk = g.chunk_granularity() * 8
    st = np.asarray(g.scan_stream(jnp.asarray(x), chunk))
    lat = g.stream_latency(chunk)
    n = min(st.shape[0] - lat, off.shape[0])
    np.testing.assert_allclose(st[lat : lat + n], off[:n], atol=1e-5)


def test_stack_memory_lags_and_errors(rng):
    f = rng.standard_normal((2, 6, 3)).astype(np.float32)
    out = np.asarray(ops.stack_memory(jnp.asarray(f), n_steps=3, delay=1))
    assert out.shape == (2, 6, 9)
    np.testing.assert_array_equal(out[..., :3], f)
    np.testing.assert_array_equal(out[:, 1:, 3:6], f[:, :-1])  # lag 1
    np.testing.assert_array_equal(out[:, :1, 3:6], 0)          # zero edge
    np.testing.assert_array_equal(out[:, 2:, 6:9], f[:, :-2])  # lag 2
    # lookahead
    la = np.asarray(ops.stack_memory(jnp.asarray(f), n_steps=2, delay=-1))
    np.testing.assert_array_equal(la[:, :-1, 3:6], f[:, 1:])
    np.testing.assert_array_equal(la[:, -1:, 3:6], 0)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        ops.stack_memory(jnp.zeros((4, 2)), n_steps=0)
    with _pytest.raises(ValueError):
        ops.stack_memory(jnp.zeros((4, 2)), delay=0)


def test_stack_memory_lag_exceeding_clip(rng):
    """Lags past the clip length are pure edge fill, not a shape crash."""
    f = rng.standard_normal((5, 3)).astype(np.float32)
    out = np.asarray(ops.stack_memory(jnp.asarray(f), n_steps=4, delay=2))
    assert out.shape == (5, 12)
    np.testing.assert_array_equal(out[:, 9:], 0)          # lag 6 > T=5
    np.testing.assert_array_equal(out[4:, 6:9], f[:1])    # lag 4 still real
    la = np.asarray(ops.stack_memory(jnp.asarray(f), n_steps=4, delay=-2))
    assert la.shape == (5, 12)
    np.testing.assert_array_equal(la[:, 9:], 0)
