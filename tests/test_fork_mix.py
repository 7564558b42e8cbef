"""Multi-branch graphs: Mix (in-chain elementwise fork) and Fork (multi-
output DAG), both compiled as ONE program with exact streaming equality
(SURVEY §3.3 pipeline fork)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audioflow_tpu.errors import AudioError, ConfigError
from audioflow_tpu.graph import (
    BiquadChain,
    Fork,
    Gain,
    MelProject,
    Mix,
    QuantizeI16,
    Resample,
    Spectrogram,
    Vad,
    VadGate,
    chain,
    fork,
)
from audioflow_tpu.ops.biquad import highpass, lowpass


def _sig(seconds=2.0, sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    x = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.standard_normal(t.size)
    return x.astype(np.float32)


# ---------------------------------------------------------------- Mix node

def test_mix_two_band_sum_offline_equals_manual():
    sr = 16000
    x = jnp.asarray(_sig())
    lo = (BiquadChain((lowpass(1000.0, sr),)),)
    hi = (BiquadChain((highpass(1000.0, sr),)),)
    g = chain(Mix(branches=(lo, hi), combine="sum"), input_rate=sr)
    got = np.asarray(g.compile()(x))
    want = np.asarray(
        chain(*lo, input_rate=sr).compile()(x) + chain(*hi, input_rate=sr).compile()(x)
    )
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_mix_weights_dry_wet():
    sr = 16000
    x = jnp.asarray(_sig())
    dry = (Gain(0.0),)
    wet = (BiquadChain((lowpass(800.0, sr),)),)
    g = chain(Mix(branches=(dry, wet), combine="sum", weights=(0.25, 0.75)), input_rate=sr)
    got = np.asarray(g.compile()(x))
    want = 0.25 * np.asarray(x) + 0.75 * np.asarray(
        chain(*wet, input_rate=sr).compile()(x)
    )
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_mix_streaming_equals_offline_exactly():
    """Branches with different latencies (resample lookahead vs none): the
    streamed mix must equal the offline mix at a whole-unit shift."""
    sr = 48000
    x = _sig(seconds=2.0, sr=sr)
    b_a = (Resample(sr, 16000, "kaiser"), Gain(3.0))
    b_b = (Resample(sr, 16000, "cubic"),)
    g = chain(Mix(branches=(b_a, b_b), combine="sum"), input_rate=sr)
    assert g.streamable
    chunk = g.chunk_granularity()
    n = (len(x) // chunk) * chunk
    x = x[:n]
    offline = np.asarray(g.compile()(jnp.asarray(x)))
    streamed = np.asarray(g.scan_stream(jnp.asarray(x), chunk))
    lat = g.stream_latency(chunk)
    m = min(len(streamed) - lat, len(offline))
    np.testing.assert_allclose(streamed[lat : lat + m], offline[:m], atol=2e-6)


def test_mix_validation_errors():
    sr = 16000
    with pytest.raises(AudioError):
        Mix(branches=((Gain(0.0),),))  # one branch
    with pytest.raises(AudioError):
        Mix(branches=((Gain(0.0),), (Gain(1.0),)), combine="xor")
    with pytest.raises(AudioError):
        Mix(branches=((Gain(0.0),), (Gain(1.0),)), weights=(1.0,))
    with pytest.raises(AudioError):  # different output rates
        chain(
            Mix(branches=((Resample(sr, 8000),), (Gain(0.0),))),
            input_rate=sr,
        )
    with pytest.raises(AudioError):  # different domains
        chain(
            Mix(branches=((Spectrogram(512, 128),), (Gain(0.0),))),
            input_rate=sr,
        )


def test_mix_graphspec_roundtrip():
    from audioflow_tpu.config import graph_from_spec, graph_to_spec

    sr = 16000
    g = chain(
        Mix(
            branches=((BiquadChain((lowpass(900.0, sr),)),), (Gain(-6.0),)),
            combine="mean",
        ),
        input_rate=sr,
    )
    import json

    spec = graph_to_spec(g)
    wire = json.dumps({"nodes": spec.nodes, "input_rate": spec.input_rate, "name": spec.name})
    g2 = graph_from_spec(json.loads(wire))
    x = jnp.asarray(_sig())
    np.testing.assert_array_equal(
        np.asarray(g.compile()(x)), np.asarray(g2.compile()(x))
    )


# ---------------------------------------------------------------- Fork DAG

def _fork_graph(sr=48000):
    trunk = chain(Resample(sr, 16000, "kaiser"), input_rate=sr, name="trunk")
    wire = chain(VadGate(frame_len=320), QuantizeI16(), input_rate=16000, name="wire")
    feats = chain(Spectrogram(512, 128, center=False), MelProject(n_mels=64), input_rate=16000)
    return fork(trunk, wire=wire, features=feats)


def test_fork_single_program_multi_output():
    sr = 48000
    f = _fork_graph(sr)
    x = jnp.asarray(_sig(sr=sr))
    out = f.compile()(x)
    assert set(out) == {"wire", "features"}
    assert out["wire"].dtype == jnp.int16
    assert out["features"].ndim == 2 and out["features"].shape[-1] == 64
    # trunk computed once: the jitted program contains a single resample
    # matmul chain; verify against running branches separately. chunked=False
    # pins the oracle to the same whole-array arithmetic Fork.chain uses —
    # the auto-chunked path differs by f32 reassociation noise, which i16
    # quantization would surface as off-by-one counts.
    y = chain(Resample(sr, 16000, "kaiser"), input_rate=sr).compile(chunked=False)(x)
    want_wire = chain(VadGate(frame_len=320), QuantizeI16(), input_rate=16000).compile(
        chunked=False
    )(y)
    np.testing.assert_array_equal(np.asarray(out["wire"]), np.asarray(want_wire))


def test_fork_streaming_per_branch_latency_exact():
    sr = 48000
    f = _fork_graph(sr)
    assert f.streamable
    chunk = f.chunk_granularity() * 2
    x = _sig(seconds=2.0, sr=sr)
    n = (len(x) // chunk) * chunk
    x = x[:n]
    offline = jax.tree_util.tree_map(np.asarray, f.compile()(jnp.asarray(x)))
    streamed = jax.tree_util.tree_map(np.asarray, f.scan_stream(jnp.asarray(x), chunk))
    lats = f.stream_latency(chunk)
    # wire is int16: the streamed trunk computes shifted blocks, so a value
    # landing exactly on a truncation boundary may flip by 1 LSB; features
    # are power-scale floats -> relative comparison
    tols = {"wire": dict(atol=1.0), "features": dict(rtol=1e-4, atol=1e-4)}
    for k in ("wire", "features"):
        off, st, lat = offline[k], streamed[k], lats[k]
        m = min(len(st) - lat, len(off))
        assert m > 0
        np.testing.assert_allclose(
            st[lat : lat + m].astype(np.float64),
            off[:m].astype(np.float64),
            err_msg=k,
            **tols[k],
        )


def test_fork_validation():
    sr = 16000
    trunk = chain(Spectrogram(512, 128), input_rate=sr)
    samples_branch = chain(Gain(0.0), input_rate=None)
    with pytest.raises(ConfigError):  # frames trunk -> samples branch
        Fork(trunk, (("a", samples_branch),))
    with pytest.raises(ConfigError):  # duplicate names
        t = chain(Gain(0.0), input_rate=sr)
        Fork(t, (("a", chain(Gain(1.0))), ("a", chain(Gain(2.0)))))
    with pytest.raises(ConfigError):  # rate mismatch
        t = chain(Resample(sr, 8000), input_rate=sr)
        Fork(t, (("a", chain(Gain(1.0), input_rate=16000)),))


def test_fork_vad_states_and_features_shared_trunk():
    """The motivating SURVEY §3.3 shape: one trunk, VAD states out one side,
    log-mel features out the other, one program."""
    sr = 16000
    trunk = chain(Gain(0.0), input_rate=sr)
    f = fork(
        trunk,
        vad=chain(Vad(frame_len=320), input_rate=sr),
        mel=chain(Spectrogram(512, 128, center=False), MelProject(n_mels=40), input_rate=sr),
    )
    x = jnp.asarray(np.concatenate([np.zeros(8000, np.float32), _sig(0.5)[:8000]]))
    out = f.compile()(x)
    states = np.asarray(out["vad"])
    assert states.shape == (50,) and (states == 1).any()
    assert out["mel"].shape[-1] == 40


def test_fork_spec_roundtrip():
    """Fork serializes through the config layer like Graphs do."""
    import json

    from audioflow_tpu.config import fork_from_spec, fork_to_spec

    f = _fork_graph(48000)
    spec = json.loads(json.dumps(fork_to_spec(f)))  # JSON-clean
    f2 = fork_from_spec(spec)
    assert f2.name == f.name
    assert [k for k, _ in f2.branches] == [k for k, _ in f.branches]
    x = jnp.asarray(_sig(sr=48000))
    a = f.compile()(x)
    b = f2.compile()(x)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
    from audioflow_tpu.errors import ConfigError
    import pytest as _pytest

    with _pytest.raises(ConfigError):
        fork_from_spec({"trunk": spec["trunk"]})  # missing branches


def test_stream_session_over_fork(tmp_path):
    """StreamSession drives a Fork directly: per-chunk Results carry the
    {branch: array} dict (lazy tree-materialized), and snapshot/restore
    round-trips the (trunk, branches, pending) state pytree."""
    from audioflow_tpu.session import StreamSession

    f = _fork_graph(48000)
    chunk = f.chunk_granularity()
    x = _sig(seconds=1.0, sr=48000)
    n = (len(x) // (chunk * 4)) * chunk * 4
    x = x[:n]

    s = StreamSession(f, chunk_in=chunk).open()
    s.push(x[: n // 2])
    s.snapshot(str(tmp_path / "mid"))
    s.push(x[n // 2 :])
    want = s.poll_all()
    s.close()
    assert want and set(want[0].data) == {"wire", "features"}

    s2 = StreamSession(f, chunk_in=chunk).restore(str(tmp_path / "mid"))
    s2.poll_all()
    s2.push(x[n // 2 :])
    got = s2.poll_all()
    s2.close()
    tail = [r for r in want if r.index >= got[0].index]
    assert len(got) == len(tail)
    for a, b in zip(got, tail):
        for k in a.data:
            np.testing.assert_array_equal(a.data[k], b.data[k])
