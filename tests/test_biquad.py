import numpy as np
import pytest
import scipy.signal

import jax.numpy as jnp

from audioflow_tpu.ops import (
    Biquad,
    biquad_chain,
    high_shelf,
    highpass,
    iir_apply,
    low_shelf,
    lowpass,
    make_iir_plan,
    notch,
    peaking,
)


def _sos(biquads):
    return np.array([[b.b0, b.b1, b.b2, 1.0, b.a1, b.a2] for b in biquads])


def test_highpass_matches_scipy_design():
    bq = highpass(100.0, 16000.0)
    b, a = bq.as_ba()
    # scipy butterworth order-2 == RBJ highpass at Q=1/sqrt(2)
    b2, a2 = scipy.signal.butter(2, 100.0, "highpass", fs=16000.0)
    np.testing.assert_allclose(b, b2, atol=1e-9)
    np.testing.assert_allclose(a, a2, atol=1e-9)


def test_lowpass_dc_gain_unity():
    bq = lowpass(2000.0, 16000.0)
    b, a = bq.as_ba()
    np.testing.assert_allclose(b.sum() / a.sum(), 1.0, atol=1e-12)


def test_peaking_gain_at_center():
    fc, g = 1000.0, 6.0
    bq = peaking(fc, 16000.0, gain_db=g, q=1.0)
    b, a = bq.as_ba()
    w, h = scipy.signal.freqz(b, a, worN=[2 * np.pi * fc / 16000.0])
    np.testing.assert_allclose(20 * np.log10(np.abs(h[0])), g, atol=1e-6)


def test_shelves_asymptotic_gains():
    g = 4.5
    for mk, lo_gain, hi_gain in [(low_shelf, g, 0.0), (high_shelf, 0.0, g)]:
        bq = mk(1000.0, 16000.0, gain_db=g)
        b, a = bq.as_ba()
        w, h = scipy.signal.freqz(b, a, worN=[1e-4, np.pi * 0.9999])
        np.testing.assert_allclose(20 * np.log10(np.abs(h[0])), lo_gain, atol=1e-2)
        np.testing.assert_allclose(20 * np.log10(np.abs(h[1])), hi_gain, atol=1e-2)


@pytest.mark.parametrize("block", [64, 128, 256])
def test_single_biquad_matches_lfilter(rng, block):
    bq = lowpass(1500.0, 16000.0)
    x = rng.standard_normal(5000).astype(np.float32)
    y, _ = biquad_chain(jnp.asarray(x), (bq,), block=block)
    b, a = bq.as_ba()
    want = scipy.signal.lfilter(b, a, x.astype(np.float64))
    np.testing.assert_allclose(np.asarray(y), want, atol=1e-4)


def test_eq_chain_matches_sosfilt(rng):
    """North-star config 3: high-pass + 5-band parametric EQ."""
    chain = (
        highpass(80.0, 16000.0),
        peaking(200.0, 16000.0, 3.0, 1.0),
        peaking(500.0, 16000.0, -4.0, 1.2),
        peaking(1000.0, 16000.0, 2.0, 0.9),
        peaking(2500.0, 16000.0, -2.5, 1.5),
        peaking(6000.0, 16000.0, 1.5, 1.0),
    )
    x = (rng.standard_normal(16000) * 0.3).astype(np.float32)
    y, _ = biquad_chain(jnp.asarray(x), chain, block=128)
    want = scipy.signal.sosfilt(_sos(chain), x.astype(np.float64))
    np.testing.assert_allclose(np.asarray(y), want, atol=1e-4)


def test_streaming_state_equivalence(rng):
    """Filtering two halves with carried state == filtering the whole signal."""
    chain = (highpass(100.0, 16000.0), peaking(1000.0, 16000.0, 5.0))
    plan = make_iir_plan(chain, block=128)
    x = rng.standard_normal(2048).astype(np.float32)
    y_full, s_full = iir_apply(jnp.asarray(x), plan)
    y1, s1 = iir_apply(jnp.asarray(x[:1024]), plan)
    y2, s2 = iir_apply(jnp.asarray(x[1024:]), plan, zi=s1)
    np.testing.assert_allclose(np.concatenate([y1, y2]), np.asarray(y_full), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s_full), atol=1e-5)


def test_batched_matches_single(rng):
    chain = (lowpass(3000.0, 16000.0),)
    x = rng.standard_normal((5, 1000)).astype(np.float32)
    y, s = biquad_chain(jnp.asarray(x), chain)
    assert y.shape == (5, 1000) and s.shape == (5, 2)
    y0, _ = biquad_chain(jnp.asarray(x[2]), chain)
    np.testing.assert_allclose(y[2], y0, atol=1e-6)


def test_non_multiple_block_length(rng):
    x = rng.standard_normal(333).astype(np.float32)
    bq = lowpass(2000.0, 16000.0)
    y, _ = biquad_chain(jnp.asarray(x), (bq,), block=128)
    b, a = bq.as_ba()
    want = scipy.signal.lfilter(b, a, x.astype(np.float64))
    assert y.shape == (333,)
    np.testing.assert_allclose(np.asarray(y), want, atol=1e-4)


def test_custom_biquad_identity(rng):
    ident = Biquad(1.0, 0.0, 0.0, 0.0, 0.0)
    x = rng.standard_normal(500).astype(np.float32)
    y, _ = biquad_chain(jnp.asarray(x), (ident,))
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-6)


def test_partial_block_state_exact(rng):
    """State after a non-block-multiple length must be the state at T, not
    advanced through padding zeros (regression: streaming corruption)."""
    plan = make_iir_plan((lowpass(1500.0, 16000.0),), block=128)
    x = rng.standard_normal(300).astype(np.float32)  # 2 blocks + 44 tail
    y, s = iir_apply(jnp.asarray(x), plan)
    # continuing from s with more samples == filtering the concatenation
    x2 = rng.standard_normal(100).astype(np.float32)
    y2, _ = iir_apply(jnp.asarray(x2), plan, zi=s)
    y_all, _ = iir_apply(jnp.asarray(np.concatenate([x, x2])), plan)
    np.testing.assert_allclose(np.concatenate([y, y2]), np.asarray(y_all), atol=1e-5)


def test_stream_non_multiple_chunks_match_offline(rng):
    """scan_stream with chunks not a multiple of the IIR block (regression)."""
    from audioflow_tpu.graph import BiquadChain, chain

    g = chain(BiquadChain((lowpass(2000.0, 16000.0),)), input_rate=16000)
    x = rng.standard_normal(1000).astype(np.float32)
    streamed = np.asarray(g.scan_stream(jnp.asarray(x), 100))  # 100 % 128 != 0
    offline = np.asarray(g.chain(jnp.asarray(x)))
    np.testing.assert_allclose(streamed, offline, atol=1e-5)
