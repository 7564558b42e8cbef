"""Round-2 node additions: Compressor, NoiseGate, LoudnessNormalize,
SpectralFeatures, GriffinLim — behavior, exact streaming, serialization."""

import numpy as np
import pytest

import jax.numpy as jnp

from audioflow_tpu import ops
from audioflow_tpu.config import graph_from_spec, graph_to_spec
from audioflow_tpu.errors import AudioError
from audioflow_tpu.graph import (
    Compressor,
    GriffinLim,
    LoudnessNormalize,
    NoiseGate,
    SpectralFeatures,
    Spectrogram,
    chain,
)

FS = 16000


def test_compressor_ratio_behavior(rng):
    """A steady tone ``over`` dB above threshold comes out reduced by
    over * (1 - 1/ratio) dB once the envelope settles."""
    t = np.arange(FS) / FS
    x = jnp.asarray((0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32))
    g = chain(Compressor(threshold_db=-20.0, ratio=4.0), input_rate=FS)
    y = np.asarray(g.chain(x))
    in_db = 20 * np.log10(0.5)  # -6.02 dB peak
    over = in_db - (-20.0)
    want_db = -20.0 + over / 4.0
    out_db = 20 * np.log10(np.abs(y[FS // 2 :]).max())
    assert abs(out_db - want_db) < 0.1, (out_db, want_db)
    # below threshold: unity gain
    q = jnp.asarray((0.001 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(g.chain(q)), np.asarray(q), atol=1e-7)


@pytest.mark.parametrize("node", [Compressor(-18.0, 3.0, 80.0, knee_db=6.0), NoiseGate(-40.0, 60.0)])
def test_dynamics_nodes_stream_exactly(rng, node):
    g = chain(node, input_rate=FS)
    x = (0.3 * rng.standard_normal(8 * 1024)).astype(np.float32)
    x[2048:4096] *= 0.001  # quiet stretch exercises gate/knee regions
    offline = np.asarray(g.chain(jnp.asarray(x)))
    streamed = np.asarray(g.scan_stream(jnp.asarray(x), 1024))
    np.testing.assert_allclose(streamed, offline, atol=1e-6)


def test_noise_gate_opens_and_closes():
    t = np.arange(FS) / FS
    loud = 0.5 * np.sin(2 * np.pi * 300.0 * t[: FS // 2])
    quiet = 0.001 * np.sin(2 * np.pi * 300.0 * t[: FS // 2])
    x = jnp.asarray(np.concatenate([loud, quiet]).astype(np.float32))
    g = chain(NoiseGate(threshold_db=-40.0, release_ms=20.0, floor_db=-80.0), input_rate=FS)
    y = np.asarray(g.chain(x))
    np.testing.assert_allclose(y[: FS // 2], loud, atol=1e-7)  # open: unity
    tail = y[FS // 2 + 4000 :]  # after release decays
    assert np.abs(tail).max() < 0.001 * 10 ** (-80 / 20) * 1.5  # closed: floored


def test_loudness_normalize_node(rng):
    t = np.arange(4 * FS) / FS
    x = jnp.asarray((0.03 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32))
    g = chain(LoudnessNormalize(target_lufs=-20.0, max_true_peak_db=None), input_rate=FS)
    y = g.chain(x)
    got = float(ops.integrated_loudness(y, FS))
    assert abs(got - (-20.0)) < 0.05
    assert g.streamable is False or not g.streamable  # offline-only node


def test_spectral_features_node_offline_and_streaming(rng):
    x = (0.3 * rng.standard_normal(16 * 2048)).astype(np.float32)
    g = chain(
        Spectrogram(512, 128, center=False, power=False),
        SpectralFeatures(("centroid", "flatness")),
        input_rate=FS,
    )
    out = np.asarray(g.chain(jnp.asarray(x)))
    assert out.shape[-1] == 2
    mag = ops.spectrogram(jnp.asarray(x), 512, 128, center=False, power=False)
    np.testing.assert_allclose(
        out[..., 0], np.asarray(ops.spectral_centroid(mag, FS, 512)), rtol=1e-6
    )
    # exact streaming (no flux)
    chunk = g.chunk_granularity() * 8
    streamed = np.asarray(g.scan_stream(jnp.asarray(x), chunk))
    lat = g.stream_latency(chunk)
    n = min(streamed.shape[0] - lat, out.shape[0])
    # rtol: centroid values are O(4 kHz); f32 reassociation between the
    # chunked and whole-array programs is ~1e-6 relative
    np.testing.assert_allclose(streamed[lat : lat + n], out[:n], rtol=1e-4, atol=1e-5)


def test_spectral_features_flux_not_streamable():
    node = SpectralFeatures(("centroid", "flux"), sample_rate=FS)
    assert not node.streamable
    g = chain(
        Spectrogram(512, 128, center=False, power=False),
        SpectralFeatures(("flux",)),
        input_rate=FS,
    )
    with pytest.raises(AudioError):
        g.init_state(1024)


def test_spectral_features_spec_roundtrip():
    g = chain(
        Spectrogram(512, 128, center=False, power=False),
        SpectralFeatures(("rolloff", "bandwidth")),
        input_rate=FS,
    )
    g2 = graph_from_spec(graph_to_spec(g))
    assert g2.nodes[-1].features == ("rolloff", "bandwidth")
    assert isinstance(g2.nodes[-1].features, tuple)  # hashable -> jit-static


def test_griffin_lim_node_roundtrip(rng):
    t = np.arange(FS // 2) / FS
    x = jnp.asarray((0.4 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32))
    g = chain(
        Spectrogram(512, 128, center=True, power=False),
        GriffinLim(512, 128, n_iter=32, center=True),
        input_rate=FS,
    )
    assert not g.streamable
    y = np.asarray(g.chain(x))
    assert y.ndim == 1 and np.isfinite(y).all()
    # reconstruction recovers the tone's magnitude spectrum
    m_in = np.asarray(ops.spectrogram(x, 512, 128, power=False))
    m_out = np.asarray(ops.spectrogram(jnp.asarray(y[: x.shape[-1]]), 512, 128, power=False))
    n = min(m_in.shape[0], m_out.shape[0])
    # rms-relative: GL converges in aggregate; isolated edge frames can
    # keep O(1) deviations without meaning failure
    err = np.sqrt(((m_out[:n] - m_in[:n]) ** 2).mean()) / np.sqrt((m_in**2).mean())
    assert err < 0.15, err


def test_preemphasis_after_latency_keeps_kaldi_edge_convention(rng):
    """Regression: Preemphasis' y[0] = x[0] - k*x[0] edge convention is
    position-dependent (not a zero-input fixpoint), so downstream of a
    latency-bearing resample the warmup zeroing alone made the first real
    sample read prev=0 (streamed x[0] vs offline (1-k)*x[0], an 8x error).
    The graph now passes first_index so the edge lands correctly."""
    from audioflow_tpu.graph import Preemphasis, Resample

    g = chain(Resample(44100, 16000, "kaiser"), Preemphasis(0.95), input_rate=44100)
    chunk = g.chunk_granularity() * 4
    x = (0.3 * rng.standard_normal(chunk * 8)).astype(np.float32)
    offline = np.asarray(g.chain(jnp.asarray(x)))
    streamed = np.asarray(g.scan_stream(jnp.asarray(x), chunk))
    lat = g.stream_latency(chunk)
    n = min(len(streamed) - lat, len(offline))
    np.testing.assert_allclose(streamed[lat : lat + n], offline[:n], atol=5e-6)


def test_agc_levels_and_streams_exactly(rng):
    """AGC pulls a quiet tone up toward target, ducks a loud one down, holds
    on silence, and the gain-dB carry makes streaming exact."""
    from audioflow_tpu.graph import Agc, chain

    half = 8192  # block-aligned halves (8 x 1024)
    t = np.arange(half) / FS
    tone = np.sin(2 * np.pi * 300.0 * t)
    x = np.concatenate([
        0.02 * tone,            # quiet: gain ramps up
        0.8 * tone,             # loud: fast duck
    ]).astype(np.float32)
    n = 2 * half
    g = chain(Agc(target_db=-16.0, up_db_per_s=24.0, down_db_per_s=96.0), input_rate=FS)
    y = np.asarray(g.chain(jnp.asarray(x)))
    def blk_db(sig, a, b):
        return 10 * np.log10(np.mean(sig[a:b] ** 2) + 1e-12)
    # end of quiet half: gained up vs input
    assert blk_db(y, half - 4096, half) > blk_db(x, half - 4096, half) + 6
    # end of loud half: ducked close to target
    assert abs(blk_db(y, n - 4096, n) - (-16.0)) < 3.0
    # silence holds gain (no pump): feed silence after loud, gain unchanged
    xs = np.concatenate([x, np.zeros(half, np.float32)])
    _, g_after_loud = ops.agc(jnp.asarray(x), -16.0, 1024, sample_rate=FS,
                              up_db_per_s=24.0, down_db_per_s=96.0)
    _, g_after_sil = ops.agc(jnp.asarray(xs), -16.0, 1024, sample_rate=FS,
                             up_db_per_s=24.0, down_db_per_s=96.0)
    np.testing.assert_allclose(float(g_after_sil), float(g_after_loud), atol=1e-5)
    # streaming == offline exactly
    streamed = np.asarray(g.scan_stream(jnp.asarray(x), 4096))
    np.testing.assert_allclose(streamed, y, atol=1e-6)
    # max gain cap respected
    yq, gq = ops.agc(jnp.asarray((1e-4 * tone).astype(np.float32)), -10.0, 1024,
                     max_gain_db=12.0, up_db_per_s=1000.0, sample_rate=FS, floor_db=-90.0)
    assert float(gq) <= 12.0 + 1e-5
