"""Pallas kernel tests (interpret mode — compiled-path equality is exercised
on real TPU hardware by the bench/verify drives)."""

import numpy as np
import pytest

import jax.numpy as jnp

from audioflow_tpu import ops
from audioflow_tpu.ops.pallas import mel_spectrogram_pallas, melspec_available

pytestmark = pytest.mark.skipif(not melspec_available(), reason="pallas unavailable")


def _reference(x, n_fft, hop, n_mels, sr, log_floor=1e-10):
    fb = ops.mel_filterbank(n_fft // 2 + 1, n_mels, sr)
    spec = ops.spectrogram(x, n_fft, hop, center=False)
    return np.asarray(ops.log_mel(spec, fb, floor=log_floor))


@pytest.mark.parametrize("n_fft,hop,n_mels", [(1024, 256, 128), (512, 128, 64)])
def test_melspec_matches_reference(rng, n_fft, hop, n_mels):
    x = jnp.asarray(rng.standard_normal((2, 40960)).astype(np.float32))
    got = np.asarray(
        mel_spectrogram_pallas(
            x, n_fft, hop, n_mels, 16000, precision="highest", interpret=True
        )
    )
    want = _reference(x, n_fft, hop, n_mels, 16000)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_melspec_high_precision_within_budget(rng):
    # the default tier ("high" via DFT_PRECISION_DEFAULT): in-kernel bf16x3
    # with host-presplit bank residuals; interpret mode does the real bf16
    # rounding, so this is a genuine fidelity check (measured 6.6e-5 in
    # log-mel space vs the f32 XLA reference — inside the 1e-4 budget)
    x = jnp.asarray(rng.standard_normal((2, 40960)).astype(np.float32))
    want = _reference(x, 1024, 256, 128, 16000)
    got = np.asarray(
        mel_spectrogram_pallas(x, 1024, 256, 128, 16000, precision="high", interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=5e-4)
    with pytest.raises(ValueError):
        mel_spectrogram_pallas(x, precision="bogus", interpret=True)


def test_melspec_non_tile_multiple_frames(rng):
    """Frame counts that don't divide the 128-frame tile are padded+trimmed."""
    x = jnp.asarray(rng.standard_normal((1, 10000)).astype(np.float32))
    got = np.asarray(mel_spectrogram_pallas(x, 512, 128, 32, 16000, interpret=True))
    want = _reference(x, 512, 128, 32, 16000)
    assert got.shape == want.shape  # 75 frames, not a tile multiple
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_melspec_1d_input(rng):
    x = jnp.asarray(rng.standard_normal(20480).astype(np.float32))
    got = mel_spectrogram_pallas(x, 512, 128, 32, 16000, interpret=True)
    assert got.ndim == 2


def test_melspec_linear_mode(rng):
    x = jnp.asarray(rng.standard_normal((1, 20480)).astype(np.float32))
    got = np.asarray(
        mel_spectrogram_pallas(x, 512, 128, 32, 16000, log_floor=None, interpret=True)
    )
    fb = ops.mel_filterbank(257, 32, 16000)
    want = np.asarray(ops.apply_mel(ops.spectrogram(x, 512, 128, center=False), fb))
    np.testing.assert_allclose(got, want, atol=1e-4 * want.max())


def test_melspec_errors():
    with pytest.raises(ValueError):
        mel_spectrogram_pallas(jnp.zeros((1, 8192)), n_fft=1000, hop=300, interpret=True)
    with pytest.raises(ValueError):
        mel_spectrogram_pallas(jnp.zeros((1, 100)), n_fft=512, hop=128, interpret=True)
