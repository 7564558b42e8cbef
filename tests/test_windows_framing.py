import numpy as np
import pytest
import scipy.signal

import jax.numpy as jnp

from audioflow_tpu.ops import frame, get_window, num_frames, overlap_add


@pytest.mark.parametrize("name,scipy_name", [("hann", "hann"), ("hamming", "hamming"), ("blackman", "blackman")])
@pytest.mark.parametrize("n", [256, 1024])
def test_windows_match_scipy_periodic(name, scipy_name, n):
    ours = get_window(name, n, periodic=True)
    ref = scipy.signal.get_window(scipy_name, n, fftbins=True)
    np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_window_symmetric():
    ours = get_window("hann", 64, periodic=False)
    ref = scipy.signal.get_window("hann", 64, fftbins=False)
    np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_unknown_window_raises():
    with pytest.raises(ValueError):
        get_window("nope", 64)


@pytest.mark.parametrize("t,fl,hop", [(1000, 256, 64), (1000, 256, 100), (512, 512, 128), (300, 128, 32)])
def test_frame_matches_direct_slicing(rng, t, fl, hop):
    x = rng.standard_normal(t).astype(np.float32)
    got = np.asarray(frame(jnp.asarray(x), fl, hop))
    n = num_frames(t, fl, hop)
    assert got.shape == (n, fl)
    for i in range(n):
        np.testing.assert_array_equal(got[i], x[i * hop : i * hop + fl])


def test_frame_batched(rng):
    x = rng.standard_normal((3, 2, 500)).astype(np.float32)
    got = np.asarray(frame(jnp.asarray(x), 128, 64))
    assert got.shape[:2] == (3, 2)
    np.testing.assert_array_equal(got[1, 0], np.asarray(frame(jnp.asarray(x[1, 0]), 128, 64)))


@pytest.mark.parametrize("fl,hop", [(256, 64), (128, 32), (100, 40)])
def test_overlap_add_oracle(rng, fl, hop):
    frames = rng.standard_normal((7, fl)).astype(np.float32)
    got = np.asarray(overlap_add(jnp.asarray(frames), hop))
    want = np.zeros(6 * hop + fl, dtype=np.float32)
    for i in range(7):
        want[i * hop : i * hop + fl] += frames[i]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_frame_short_signal_raises():
    with pytest.raises(ValueError):
        frame(jnp.zeros(10), 128, 32)
