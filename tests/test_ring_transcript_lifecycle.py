import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audioflow_tpu.ops.ring import (
    ring_available,
    ring_clear,
    ring_free,
    ring_init,
    ring_read,
    ring_write,
)
from audioflow_tpu.session.transcript import (
    ScribeEventKind,
    TranscriptAccumulator,
    parse_scribe_message,
)


# ------------------------------------------------------------------- ring
# mirrors the reference's ring tests (capture.rs:433-514)

def test_ring_basic_write_read():
    r = ring_init(8)
    r, n = ring_write(r, jnp.asarray([1.0, 2.0, 3.0]))
    assert int(n) == 3 and int(ring_available(r)) == 3
    r, vals, n_read = ring_read(r, 3)
    assert int(n_read) == 3
    np.testing.assert_array_equal(np.asarray(vals), [1, 2, 3])
    assert int(ring_available(r)) == 0


def test_ring_capacity_minus_one():
    """Usable capacity = capacity-1 (capture.rs:108-111)."""
    r = ring_init(8)
    r, n = ring_write(r, jnp.arange(10, dtype=jnp.float32))
    assert int(n) == 7  # one slot reserved
    assert int(ring_free(r)) == 0


def test_ring_partial_write_on_overflow():
    r = ring_init(6)
    r, n1 = ring_write(r, jnp.asarray([1.0, 2.0, 3.0]))
    r, n2 = ring_write(r, jnp.asarray([4.0, 5.0, 6.0, 7.0]))
    assert int(n1) == 3 and int(n2) == 2  # only 2 slots left (cap-1=5)
    r, vals, n = ring_read(r, 5)
    np.testing.assert_array_equal(np.asarray(vals), [1, 2, 3, 4, 5])


def test_ring_wrap_around():
    r = ring_init(5)
    r, _ = ring_write(r, jnp.asarray([1.0, 2.0, 3.0]))
    r, _, _ = ring_read(r, 2)
    r, n = ring_write(r, jnp.asarray([4.0, 5.0, 6.0]))  # wraps
    assert int(n) == 3
    r, vals, n_read = ring_read(r, 4)
    assert int(n_read) == 4
    np.testing.assert_array_equal(np.asarray(vals), [3, 4, 5, 6])


def test_ring_read_empty_returns_zero():
    r = ring_init(4)
    r, vals, n = ring_read(r, 2)
    assert int(n) == 0
    np.testing.assert_array_equal(np.asarray(vals), [0, 0])


def test_ring_clear():
    r = ring_init(4)
    r, _ = ring_write(r, jnp.asarray([1.0, 2.0]))
    r = ring_clear(r)
    assert int(ring_available(r)) == 0


def test_ring_under_jit():
    @jax.jit
    def produce_consume(r, data):
        r, _ = ring_write(r, data)
        r, vals, n = ring_read(r, 4)
        return r, vals, n

    r = ring_init(16)
    r, vals, n = produce_consume(r, jnp.asarray([9.0, 8.0, 7.0]))
    assert int(n) == 3
    np.testing.assert_array_equal(np.asarray(vals), [9, 8, 7, 0])


# -------------------------------------------------------------- transcript
# mirrors scribe_client.rs parse tests (hand-written payloads as fake server
# responses, scribe_client.rs:459-471)

def test_parse_message_types():
    ev = parse_scribe_message(json.dumps({"message_type": "session_started", "session_id": "s1"}))
    assert ev.kind is ScribeEventKind.SESSION_STARTED and ev.session_id == "s1"
    ev = parse_scribe_message(json.dumps({"message_type": "partial_transcript", "text": "hel"}))
    assert ev.kind is ScribeEventKind.PARTIAL_TRANSCRIPT and ev.text == "hel"
    ev = parse_scribe_message(
        json.dumps({"message_type": "committed_transcript", "text": "hello", "confidence": 0.93})
    )
    assert ev.kind is ScribeEventKind.COMMITTED_TRANSCRIPT and ev.confidence == 0.93
    ev = parse_scribe_message(json.dumps({"message_type": "error", "message": "boom"}))
    assert ev.kind is ScribeEventKind.ERROR and ev.message == "boom"
    assert parse_scribe_message("{not json").kind is ScribeEventKind.ERROR
    assert parse_scribe_message(json.dumps({"message_type": "???"})).kind is ScribeEventKind.UNKNOWN


def test_accumulator_partial_then_commit():
    """Partial buffer accumulates, commit clears it (scribe_client.rs:286-308)."""
    acc = TranscriptAccumulator()
    acc.feed(parse_scribe_message(json.dumps({"message_type": "session_started", "session_id": "x"})))
    assert acc.session_id == "x"
    r1 = acc.feed(parse_scribe_message(json.dumps({"message_type": "partial_transcript", "text": "hel"})))
    assert r1["is_final"] is False and acc.partial_buffer == "hel"
    r2 = acc.feed(
        parse_scribe_message(
            json.dumps(
                {
                    "message_type": "committed_transcript",
                    "text": "【SPEECH_CHANGE】hello world【SILENCE】",
                    "confidence": 0.9,
                }
            )
        )
    )
    assert r2["is_final"] is True and r2["text"] == "hello world"
    assert acc.partial_buffer == ""


# ---------------------------------------------------------- lifecycle/registry

def test_lifecycle_dirs_and_cleanup(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_CONFIG_HOME", str(tmp_path / "cfg"))
    monkeypatch.setenv("XDG_DATA_HOME", str(tmp_path / "data"))
    from audioflow_tpu.obs import AppPhase, LifecycleManager

    order = []
    phases = []
    lm = LifecycleManager()
    lm.on_phase_change(phases.append)
    with lm:
        assert lm.dirs.logs.is_dir()
        lm.register_cleanup("a", lambda: order.append("a"))
        lm.register_cleanup("b", lambda: order.append("b"))
        lm.register_cleanup("boom", lambda: 1 / 0)  # must not abort shutdown
    assert order == ["b", "a"]  # LIFO
    assert phases[-1] is AppPhase.EXITED
    assert lm.stats.data["launch_count"] == 1
    # second launch bumps the persisted counter
    lm2 = LifecycleManager().start()
    assert lm2.stats.data["launch_count"] == 2
    lm2.exit()


def test_session_registry(rng):
    from audioflow_tpu.graph import Resample, chain
    from audioflow_tpu.session import StreamSession
    from audioflow_tpu.session.registry import REGISTRY

    g = chain(Resample(48000, 16000), input_rate=48000)
    assert not REGISTRY.is_running
    s = StreamSession(g, chunk_in=g.chunk_granularity()).open()
    assert REGISTRY.is_running and s in REGISTRY.live_sessions()
    s.close()
    assert not REGISTRY.is_running
