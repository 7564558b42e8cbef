import base64
import json

import numpy as np
import pytest

import jax.numpy as jnp

from audioflow_tpu import ops
from audioflow_tpu.errors import SessionError, SinkError
from audioflow_tpu.graph import BiquadChain, Resample, chain
from audioflow_tpu.obs import StatsFile
from audioflow_tpu.session import Result, SessionState, StreamSession
from audioflow_tpu.sinks import (
    ArraySink,
    EventDispatcher,
    EventKind,
    WavSink,
    auto_sink,
    configure_message,
    decode_audio_chunk,
    encode_audio_chunk,
    strip_markers,
)


# ------------------------------------------------------------------ wire

def test_wire_audio_chunk_parity():
    """Byte-level parity with websocket.rs:244-263."""
    samples = np.array([0.0, 0.5, -1.5, 1.0], np.float32)
    msg = json.loads(encode_audio_chunk(samples))
    assert msg["message_type"] == "input_audio_chunk"
    raw = base64.standard_b64decode(msg["audio_base_64"])
    want = np.array([0, 16383, -32767, 32767], "<i2").tobytes()  # trunc + clamp, LE
    assert raw == want


def test_wire_round_trip(rng):
    x = rng.uniform(-0.99, 0.99, 256).astype(np.float32)
    y = decode_audio_chunk(encode_audio_chunk(x))
    np.testing.assert_allclose(y, x, atol=2.0 / 32767)


def test_configure_message_shape():
    msg = json.loads(configure_message("scribe_v1", "en"))
    assert msg == {
        "model_id": "scribe_v1",
        "language_code": "en",
        "encoding": "pcm_16000",
        "message_type": "configure",
    }


def test_strip_markers():
    """commands.rs:286-292 parity."""
    assert strip_markers("【SPEECH_CHANGE】hello 【SILENCE】world【SILENCE】 ") == "hello world"
    assert strip_markers("  【SILENCE】 ") == ""


# ------------------------------------------------------------------ sinks

def test_auto_sink_selection(tmp_path):
    assert isinstance(auto_sink(None), ArraySink)
    assert isinstance(auto_sink(tmp_path / "x.wav", 16000), WavSink)
    with pytest.raises(SinkError):
        auto_sink(tmp_path / "x.wav")  # wav needs a rate
    with pytest.raises(SinkError):
        auto_sink(tmp_path / "x.weird")


def test_wav_sink_round_trip(tmp_path, rng):
    from audioflow_tpu.io import read_wav

    p = tmp_path / "out.wav"
    with WavSink(p, 16000) as s:
        s.write(rng.uniform(-0.5, 0.5, 100).astype(np.float32))
        s.write(rng.uniform(-0.5, 0.5, 60).astype(np.float32))
    y, rate = read_wav(p)
    assert rate == 16000 and y.shape == (160,)


def test_event_dispatcher():
    d = EventDispatcher()
    seen = []
    unsub = d.subscribe(seen.append)
    d.emit_audio_level(0.1, 0.5, True)
    d.enabled = False
    d.emit_audio_level(0.9, 0.9, False)
    d.enabled = True
    unsub()
    d.emit_audio_level(0.2, 0.2, False)
    assert len(seen) == 1 and seen[0].kind is EventKind.AUDIO_LEVEL
    assert seen[0].payload["peak"] == 0.5


# ---------------------------------------------------------------- session

def _graph():
    return chain(
        Resample(48000, 16000, "kaiser"),
        BiquadChain((ops.highpass(80.0, 16000.0),)),
        input_rate=48000,
    )


def test_session_push_poll_flush(rng):
    g = _graph()
    sess = StreamSession(g, chunk_in=g.chunk_granularity() * 4)
    x = rng.standard_normal(sess.chunk_in * 3 + 100).astype(np.float32)
    with sess:
        # odd-sized pushes accumulate like BatchResampler::process
        n = sess.push(x[:500])
        assert n == 0 and sess.poll() is None
        sess.push(x[500:])
        partials = sess.poll_all()
        assert len(partials) == 3
        assert all(not r.final for r in partials)
        sess.flush()
        final = sess.poll()
        assert final is not None and final.final
    assert sess.state is SessionState.CLOSED


def test_session_matches_offline(rng):
    g = _graph()
    chunk = g.chunk_granularity() * 4
    x = rng.standard_normal(chunk * 5).astype(np.float32)
    sess = StreamSession(g, chunk_in=chunk)
    with sess:
        sess.push(x)
        results = sess.poll_all()
    streamed = np.concatenate([r.data for r in results])
    lat = g.stream_latency(chunk)
    offline = np.asarray(g.chain(jnp.asarray(x)))
    n = len(streamed) - lat
    # the IIR reacts to the resampler's preroll; its transient decays, so the
    # head is close and the body exact
    np.testing.assert_allclose(streamed[lat:], offline[:n], atol=2e-3)
    np.testing.assert_allclose(streamed[lat + 200 :], offline[200:n], atol=1e-5)


def test_session_snapshot_restore(tmp_path, rng):
    g = _graph()
    chunk = g.chunk_granularity() * 2
    x = rng.standard_normal(chunk * 4 + 37).astype(np.float32)
    s1 = StreamSession(g, chunk_in=chunk).open()
    s1.push(x[: chunk * 2 + 10])
    s1.snapshot(tmp_path / "snap.npz")
    a = [r.data for r in s1.poll_all()]
    s1.push(x[chunk * 2 + 10 :])
    rest1 = [r.data for r in s1.poll_all()]

    s2 = StreamSession(g, chunk_in=chunk).restore(tmp_path / "snap.npz")
    s2.push(x[chunk * 2 + 10 :])
    rest2 = [r.data for r in s2.poll_all()]
    assert len(rest1) == len(rest2)
    for r1, r2 in zip(rest1, rest2):
        np.testing.assert_allclose(r1, r2, atol=1e-7)


def test_session_sink_and_events(rng, tmp_path):
    g = _graph()
    chunk = g.chunk_granularity()
    sink = ArraySink()
    events = EventDispatcher()
    kinds = []
    events.subscribe(lambda e: kinds.append(e.kind))
    sess = StreamSession(g, chunk_in=chunk, sinks=[sink], events=events)
    with sess:
        sess.push(rng.standard_normal(chunk * 2).astype(np.float32))
    # 2 full chunks; flush is a no-op on an empty buffer
    assert sink.result().shape[0] == 2 * (chunk // 3)
    assert EventKind.AUDIO_LEVEL in kinds and EventKind.SESSION_STATE in kinds


def test_session_errors(rng):
    g = _graph()
    sess = StreamSession(g, chunk_in=g.chunk_granularity())
    with pytest.raises(SessionError):
        sess.push(np.zeros(10, np.float32))  # not open
    sess.open()
    with pytest.raises(SessionError):
        sess.push(np.zeros((2, 10), np.float32))  # wrong lead shape
    sess.close()
    with pytest.raises(SessionError):
        sess.push(np.zeros(10, np.float32))  # closed
    with pytest.raises(SessionError):
        StreamSession(g, chunk_in=7)  # bad granularity


def test_session_stats(tmp_path, rng):
    g = _graph()
    stats = StatsFile(tmp_path / "stats.json")
    sess = StreamSession(g, chunk_in=g.chunk_granularity(), stats=stats)
    with sess:
        sess.push(rng.standard_normal(48000).astype(np.float32))
    assert stats.data["run_count"] == 1
    assert stats.data["total_audio_seconds"] == pytest.approx(1.0)
    s2 = StatsFile(tmp_path / "stats.json")
    assert s2.data["run_count"] == 1


def test_snapshot_path_without_npz_suffix(tmp_path, rng):
    """Regression: np.savez appends .npz; restore must find the file."""
    g = _graph()
    chunk = g.chunk_granularity()
    s1 = StreamSession(g, chunk_in=chunk).open()
    s1.push(rng.standard_normal(chunk * 2).astype(np.float32))
    s1.snapshot(tmp_path / "session.ckpt")  # no .npz suffix
    s2 = StreamSession(g, chunk_in=chunk).restore(tmp_path / "session.ckpt")
    assert s2._chunk_index == s1._chunk_index


def test_flush_returns_final_result(rng):
    g = _graph()
    sess = StreamSession(g, chunk_in=g.chunk_granularity()).open()
    sess.push(rng.standard_normal(100).astype(np.float32))
    res = sess.flush()
    assert res is not None and res.final


def test_session_batched_lead_shape(rng):
    """Sessions drive a whole file batch per stream (lead_shape)."""
    g = _graph()
    chunk = g.chunk_granularity() * 2
    x = rng.standard_normal((3, chunk * 2)).astype(np.float32)
    sess = StreamSession(g, chunk_in=chunk, lead_shape=(3,))
    with sess:
        sess.push(x)
        results = sess.poll_all()
    assert all(r.data.shape[0] == 3 for r in results)
    streamed = np.concatenate([r.data for r in results], axis=-1)
    single = StreamSession(g, chunk_in=chunk)
    with single:
        single.push(x[1])
        one = np.concatenate([r.data for r in single.poll_all()], axis=-1)
    np.testing.assert_allclose(streamed[1][: len(one)], one, atol=1e-6)


def test_callback_and_jsonl_sinks(tmp_path):
    from audioflow_tpu.sinks import CallbackSink, JsonlSink

    seen = []
    cb = CallbackSink(seen.append)
    cb.write(np.arange(4.0))
    assert len(seen) == 1 and seen[0].shape == (4,)
    p = tmp_path / "states.jsonl"
    with JsonlSink(p) as js:
        js.write(np.array([0, 1, 2]))
        js.write(np.array([1, 1]))
    lines = p.read_text().strip().splitlines()
    assert json.loads(lines[0]) == [0, 1, 2] and json.loads(lines[1]) == [1, 1]


def test_compile_stream_donate(rng):
    """Donated carries compile and step correctly (HBM-recycling path)."""
    g = _graph()
    chunk = g.chunk_granularity()
    step = g.compile_stream(donate=True)
    state = g.init_state(chunk)
    x = rng.standard_normal(chunk * 2).astype(np.float32)
    state, y1 = step(state, jnp.asarray(x[:chunk]))
    state, y2 = step(state, jnp.asarray(x[chunk:]))
    offline = np.asarray(g.chain(jnp.asarray(x)))
    got = np.concatenate([np.asarray(y1), np.asarray(y2)])
    lat = g.stream_latency(chunk)
    np.testing.assert_allclose(got[lat + 200 :], offline[200 : len(got) - lat], atol=1e-5)
