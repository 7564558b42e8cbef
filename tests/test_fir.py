"""FIR design (scipy.firwin oracle), causal application, streaming node."""

import numpy as np
import pytest
import scipy.signal as sig

import jax.numpy as jnp

from audioflow_tpu import ops

FS = 16000


@pytest.mark.parametrize(
    "kind,taps,cutoff",
    [
        ("lowpass", 101, 3000.0),
        ("lowpass", 64, 2000.0),
        ("highpass", 101, 1000.0),
        ("bandpass", 129, (500.0, 3000.0)),
        ("bandstop", 121, (1000.0, 2000.0)),
    ],
)
def test_fir_design_matches_scipy_firwin(kind, taps, cutoff):
    got = ops.fir_design(taps, cutoff, FS, kind, window="hamming")
    pass_zero = {"lowpass": True, "highpass": False, "bandpass": False, "bandstop": True}[kind]
    want = sig.firwin(taps, cutoff, window="hamming", pass_zero=pass_zero, fs=FS)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_fir_design_validation():
    with pytest.raises(ValueError):
        ops.fir_design(100, 1000.0, FS, "highpass")  # even taps
    with pytest.raises(ValueError):
        ops.fir_design(101, 9000.0, FS)  # beyond Nyquist
    with pytest.raises(ValueError):
        ops.fir_design(101, 1000.0, FS, "sideways")


def test_fir_apply_matches_lfilter(rng):
    h = ops.fir_design(65, 2000.0, FS)
    x = rng.standard_normal((3, 4000)).astype(np.float32)
    y, zf = ops.fir_apply(jnp.asarray(x), h)
    want = sig.lfilter(h, [1.0], x.astype(np.float64), axis=-1)
    np.testing.assert_allclose(np.asarray(y), want, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(zf), x[:, -64:])


def test_fir_fft_impl_matches_direct(rng):
    h = rng.standard_normal(300).astype(np.float32) * 0.1  # > 192: auto=fft
    x = rng.standard_normal(2048).astype(np.float32)
    yd, _ = ops.fir_apply(jnp.asarray(x), h, impl="direct")
    yf, _ = ops.fir_apply(jnp.asarray(x), h, impl="fft")
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yd), atol=5e-4)
    with pytest.raises(ValueError):
        ops.fir_apply(jnp.asarray(x), h, impl="nope")


def test_fir_chunked_equals_whole(rng):
    """Feeding zf back as zi makes chunked == whole-signal exactly."""
    h = ops.fir_design(33, 1500.0, FS)
    x = rng.standard_normal(4096).astype(np.float32)
    whole, _ = ops.fir_apply(jnp.asarray(x), h)
    zi = None
    parts = []
    for i in range(0, 4096, 512):
        y, zi = ops.fir_apply(jnp.asarray(x[i : i + 512]), h, zi=zi)
        parts.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(parts), np.asarray(whole), atol=1e-6)


def test_convolve_full_and_same(rng):
    x = rng.standard_normal(500).astype(np.float32)
    ir = rng.standard_normal(50).astype(np.float32) * np.exp(-np.arange(50) / 10).astype(np.float32)
    full = np.asarray(ops.convolve(jnp.asarray(x), ir, mode="full"))
    want = np.convolve(x.astype(np.float64), ir.astype(np.float64))
    assert full.shape == (549,)
    np.testing.assert_allclose(full, want, atol=1e-4)
    same = np.asarray(ops.convolve(jnp.asarray(x), ir, mode="same"))
    np.testing.assert_allclose(same, want[:500], atol=1e-4)


def test_fir_node_streaming_and_response(rng):
    from audioflow_tpu.config import graph_from_spec, graph_to_spec
    from audioflow_tpu.graph import Fir, chain

    g = chain(Fir("lowpass", 65, (2000.0,)), input_rate=FS)
    x = (0.3 * rng.standard_normal(8 * 1024)).astype(np.float32)
    offline = np.asarray(g.chain(jnp.asarray(x)))
    streamed = np.asarray(g.scan_stream(jnp.asarray(x), 1024))
    np.testing.assert_allclose(streamed, offline, atol=1e-6)
    # frequency response behaves: 500 Hz passes, 6 kHz is crushed
    t = np.arange(FS) / FS
    lo = np.asarray(g.chain(jnp.asarray(np.sin(2 * np.pi * 500 * t).astype(np.float32))))
    hi = np.asarray(g.chain(jnp.asarray(np.sin(2 * np.pi * 6000 * t).astype(np.float32))))
    assert np.abs(lo[200:]).max() > 0.95 and np.abs(hi[200:]).max() < 0.01
    # explicit taps + spec round-trip
    g2 = chain(Fir(taps=tuple(float(v) for v in ops.fir_design(21, 3000.0, FS))), input_rate=FS)
    g3 = graph_from_spec(graph_to_spec(g2))
    np.testing.assert_allclose(
        np.asarray(g3.chain(jnp.asarray(x[:2048]))),
        np.asarray(g2.chain(jnp.asarray(x[:2048]))),
        atol=0,
    )
