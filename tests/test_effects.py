"""Time-based effects: serial float64 oracles, streaming == offline."""

import numpy as np
import pytest

import jax.numpy as jnp

from audioflow_tpu import ops

FS = 16000


def _delay_oracle(x, d, g, mix):
    x = x.astype(np.float64)
    t = len(x)
    w = np.zeros(t)
    for n in range(t):
        xd = x[n - d] if n >= d else 0.0
        wd = w[n - d] if n >= d else 0.0
        w[n] = xd + g * wd
    return x + mix * w


@pytest.mark.parametrize("d,t", [(100, 1000), (128, 1024), (333, 1000), (999, 500)])
def test_feedback_delay_matches_oracle(rng, d, t):
    x = rng.standard_normal(t).astype(np.float32)
    y, _ = ops.feedback_delay(jnp.asarray(x), d, 0.5, 0.7)
    want = _delay_oracle(x, d, 0.5, 0.7)
    np.testing.assert_allclose(np.asarray(y), want, atol=1e-5)


def test_feedback_delay_streaming_any_chunks(rng):
    x = rng.standard_normal(3000).astype(np.float32)
    y_off, _ = ops.feedback_delay(jnp.asarray(x), 250, 0.6, 0.5)
    carry = None
    outs = []
    for lo, hi in [(0, 700), (700, 1100), (1100, 2350), (2350, 3000)]:
        y, carry = ops.feedback_delay(jnp.asarray(x[lo:hi]), 250, 0.6, 0.5, carry)
        outs.append(np.asarray(y))
    np.testing.assert_allclose(
        np.concatenate(outs), np.asarray(y_off), atol=1e-5
    )


def test_feedback_delay_validation():
    with pytest.raises(ValueError):
        ops.feedback_delay(jnp.zeros(10), 0, 0.5)
    with pytest.raises(ValueError):
        ops.feedback_delay(jnp.zeros(10), 4, 1.0)


def test_tremolo_formula_and_continuation(rng):
    x = rng.standard_normal(2048).astype(np.float32)
    y = np.asarray(ops.tremolo(jnp.asarray(x), FS, 6.0, 0.8, 0.3))
    n = np.arange(2048)
    gain = 1.0 - 0.4 * (1.0 + np.sin(2 * np.pi * 6.0 * n / FS + 0.3))
    np.testing.assert_allclose(y, x * gain, atol=1e-5)
    # chunked with t0 == offline
    y2 = np.concatenate([
        np.asarray(ops.tremolo(jnp.asarray(x[:1000]), FS, 6.0, 0.8, 0.3, t0=0)),
        np.asarray(ops.tremolo(jnp.asarray(x[1000:]), FS, 6.0, 0.8, 0.3, t0=1000)),
    ])
    np.testing.assert_allclose(y2, y, atol=1e-6)
    with pytest.raises(ValueError):
        ops.tremolo(jnp.zeros(8), FS, depth=1.5)


def _vibrato_oracle(x, sr, rate, depth_s, phase):
    x = x.astype(np.float64)
    t = len(x)
    y = np.zeros(t)
    for n in range(t):
        d = depth_s * sr * 0.5 * (1 + np.sin(2 * np.pi * rate * n / sr + phase))
        idx = n - d
        lo = int(np.floor(idx))
        frac = idx - lo
        xl = x[lo] if lo >= 0 else 0.0
        xh = x[lo + 1] if 0 <= lo + 1 < t else (0.0 if lo + 1 < 0 else x[t - 1])
        y[n] = xl * (1 - frac) + xh * frac
    return y


def test_vibrato_matches_oracle(rng):
    x = rng.standard_normal(2000).astype(np.float32)
    y = np.asarray(ops.vibrato(jnp.asarray(x), FS, 7.0, 0.0015, 0.5))
    want = _vibrato_oracle(x, FS, 7.0, 0.0015, 0.5)
    # f32 LFO phase + interpolation weights vs the f64 oracle: ~2e-4
    np.testing.assert_allclose(y, want, atol=1e-3)


def test_flanger_static_delay_case(rng):
    # rate 0, phase 0 -> constant d = base + depth/2: a fixed fractional tap
    x = rng.standard_normal(1500).astype(np.float32)
    base, depth, mix = 0.002, 0.001, 0.5
    y = np.asarray(ops.flanger(jnp.asarray(x), FS, 0.0, depth, base, mix))
    d = (base + depth / 2) * FS
    lo = int(np.floor(d))
    frac = d - lo
    tap = np.zeros(1500)
    tap[lo:] = x[: 1500 - lo] * (1 - frac)
    tap[lo + 1:] += x[: 1500 - lo - 1] * frac
    np.testing.assert_allclose(y, 0.5 * x + 0.5 * tap, atol=1e-4)


def test_chorus_shapes_and_mix(rng):
    x = rng.standard_normal((2, 3, 1600)).astype(np.float32)
    y = np.asarray(ops.chorus(jnp.asarray(x), FS))
    assert y.shape == x.shape and np.isfinite(y).all()
    # mix 0 -> dry passthrough
    y0 = np.asarray(ops.chorus(jnp.asarray(x), FS, mix=0.0))
    np.testing.assert_allclose(y0, x, atol=1e-6)
    with pytest.raises(ValueError):
        ops.chorus(jnp.zeros(16), FS, voices=0)


@pytest.mark.parametrize("node_kw", [
    # (name, kwargs, atol): Delay/Tremolo reproduce offline bit-for-bit in
    # f32; the modulated taps recompute interpolation weights from a
    # different index origin per chunk, so they agree to f32 rounding
    ("Delay", dict(delay_s=0.02, feedback=0.5, mix=0.6), 1e-5),
    ("Tremolo", dict(rate_hz=4.0, depth=0.7), 1e-5),
    ("Vibrato", dict(rate_hz=6.0, depth_s=0.002), 2e-3),
    ("Chorus", dict(rate_hz=1.0, depth_s=0.002, base_delay_s=0.01, voices=2), 2e-3),
    ("Flanger", dict(rate_hz=0.5, depth_s=0.001, base_delay_s=0.001), 2e-3),
])
def test_effect_nodes_streaming_exact(rng, node_kw):
    import audioflow_tpu.graph as G
    from audioflow_tpu.config import graph_from_spec, graph_to_spec
    from audioflow_tpu.graph import chain

    name, kw, atol = node_kw
    node = getattr(G, name)(**kw)
    g = chain(node, input_rate=FS)
    x = (0.3 * rng.standard_normal(FS)).astype(np.float32)
    off = np.asarray(g.chain(jnp.asarray(x)))
    chunk = g.chunk_granularity() * 1000
    xs = x[: len(x) // chunk * chunk]
    streamed = np.asarray(g.scan_stream(jnp.asarray(xs), chunk))
    lat = g.stream_latency(chunk)
    n = min(streamed.shape[0] - lat, off.shape[0], len(xs))
    np.testing.assert_allclose(streamed[lat : lat + n], off[:n], rtol=1e-4, atol=atol)
    g2 = graph_from_spec(graph_to_spec(g))
    assert type(g2.nodes[0]).__name__ == name
