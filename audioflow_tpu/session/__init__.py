"""Streaming session driver: open -> push -> poll -> flush/close.

The TPU re-design of the reference's session layer
(network/scribe_client.rs:98-405): `ScribeClient` opens a socket, pushes
PCM chunks, and polls typed transcript events with partial/committed
semantics. Here the "service" is the jitted streaming graph on the chip:

* ``push(samples)`` accumulates host-side and processes every full chunk —
  the accumulate-and-chunk semantics of BatchResampler::process
  (resampler.rs:132-147);
* each processed chunk yields a **partial** :class:`Result` (the
  PartialTranscript analog); ``flush()`` zero-pads the tail
  (resampler.rs:150-166) and yields the **committed** final result;
* ``poll()``/``poll_all()`` drain the result queue (try_receive analog,
  scribe_client.rs:235-245);
* ``snapshot()``/``restore()`` persist the carry pytree — the resumable
  session state the reference only kept in memory (SURVEY §5.4).

Lifecycle states mirror ConnectionState (websocket.rs:19-53).
"""

from __future__ import annotations

import enum
import queue
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..errors import ErrorCode, SessionError
from ..graph import Graph
from ..obs import StatsFile, get_logger
from ..sinks import EventDispatcher, Sink

_log = get_logger("session")


class SessionState(enum.Enum):
    IDLE = "idle"
    OPEN = "open"
    CLOSED = "closed"
    FAILED = "failed"


@dataclass(frozen=True)
class Result:
    """Per-chunk output (partial) or end-of-stream output (final)."""

    data: np.ndarray
    final: bool
    index: int
    timestamp: float = field(default_factory=time.time)


class StreamSession:
    """Single-stream (or fixed-lead-shape batch) streaming driver."""

    def __init__(
        self,
        graph: Graph,
        chunk_in: int | None = None,
        lead_shape: tuple = (),
        dtype=jnp.float32,
        sinks: Sequence[Sink] = (),
        events: EventDispatcher | None = None,
        emit_partials: bool = True,
        stats: StatsFile | None = None,
    ):
        self.graph = graph
        gran = graph.chunk_granularity()
        if chunk_in is None:
            chunk_in = gran * max(1, 4096 // gran)
        if chunk_in % gran:
            raise SessionError(
                f"chunk_in {chunk_in} not a multiple of graph granularity {gran}",
                code=ErrorCode.SESSION_STATE_INVALID,
            )
        self.chunk_in = chunk_in
        self.lead_shape = tuple(lead_shape)
        self.dtype = dtype
        self.sinks = list(sinks)
        self.events = events or EventDispatcher(enabled=False)
        self.emit_partials = emit_partials
        self.stats = stats

        self.state = SessionState.IDLE
        self._step = None
        self._carry: Any = None
        self._buffer = np.zeros((*self.lead_shape, 0), np.float32)
        self._results: queue.Queue[Result] = queue.Queue()
        self._chunk_index = 0
        self._samples_in = 0

    # ------------------------------------------------------------- lifecycle
    def open(self) -> "StreamSession":
        if self.state is SessionState.OPEN:
            return self  # idempotent, like connect-on-connected
        if self.state is SessionState.CLOSED:
            raise SessionError("session closed", code=ErrorCode.SESSION_CLOSED)
        self._step = self.graph.compile_stream(donate=False)
        self._carry = self.graph.init_state(self.chunk_in, self.lead_shape, self.dtype)
        self.state = SessionState.OPEN
        from .registry import REGISTRY

        REGISTRY.register(self)
        self.events.emit_session_state("open", chunk_in=self.chunk_in)
        return self

    def __enter__(self):
        return self.open()

    def __exit__(self, exc_type, *exc):
        if exc_type is None:
            self.close()
        else:
            self.state = SessionState.FAILED
            self.events.emit_session_state("failed")
        return False

    # ------------------------------------------------------------------ push
    def push(self, samples) -> int:
        """Feed PCM; processes every complete chunk. Returns chunks processed."""
        if self.state is not SessionState.OPEN:
            raise SessionError(
                f"push on {self.state.value} session", code=ErrorCode.SESSION_STATE_INVALID
            )
        arr = np.asarray(samples, np.float32)
        if arr.shape[:-1] != self.lead_shape:
            raise SessionError(
                f"lead shape {arr.shape[:-1]} != session lead {self.lead_shape}",
                code=ErrorCode.SHAPE_MISMATCH,
            )
        self._buffer = np.concatenate([self._buffer, arr], axis=-1)
        self._samples_in += arr.shape[-1]
        done = 0
        while self._buffer.shape[-1] >= self.chunk_in:
            chunk = self._buffer[..., : self.chunk_in]
            self._buffer = self._buffer[..., self.chunk_in :]
            self._process(chunk, final=False)
            done += 1
        return done

    def _process(self, chunk: np.ndarray, final: bool) -> Result:
        self._carry, out = self._step(self._carry, jnp.asarray(chunk))
        host = np.asarray(out)
        res = Result(host, final, self._chunk_index)
        self._chunk_index += 1
        if self.emit_partials or final:
            self._results.put(res)
        for sink in self.sinks:
            sink.write(host)
        if self.events.enabled:
            rms = float(np.sqrt(np.mean(chunk**2)))
            peak = float(np.max(np.abs(chunk))) if chunk.size else 0.0
            self.events.emit_audio_level(rms=rms, peak=peak)
            self.events.emit_result(host, final=final, index=res.index)
        return res

    # ------------------------------------------------------------------ poll
    def poll(self, timeout: float | None = 0.0) -> Result | None:
        """Next result or None (try_receive parity: non-blocking by default)."""
        try:
            return self._results.get(timeout=timeout) if timeout else self._results.get_nowait()
        except queue.Empty:
            return None

    def poll_all(self) -> list[Result]:
        out = []
        while True:
            r = self.poll()
            if r is None:
                return out
            out.append(r)

    # ----------------------------------------------------------------- flush
    def flush(self) -> Result | None:
        """Zero-pad and process the tail (flush parity), emitting the final
        committed result. No-op (returns None) if nothing is pending and at
        least one chunk was emitted."""
        if self.state is not SessionState.OPEN:
            raise SessionError(
                f"flush on {self.state.value} session", code=ErrorCode.SESSION_STATE_INVALID
            )
        tail = self._buffer.shape[-1]
        if tail == 0 and self._chunk_index > 0:
            return None
        pad = self.chunk_in - tail
        widths = [(0, 0)] * (self._buffer.ndim - 1) + [(0, pad)]
        chunk = np.pad(self._buffer, widths)
        self._buffer = self._buffer[..., :0]
        return self._process(chunk, final=True)

    def close(self) -> dict:
        """Flush, close sinks, record stats. Returns a summary dict."""
        if self.state is SessionState.CLOSED:
            return {}
        if self.state is SessionState.OPEN and (
            self._buffer.shape[-1] > 0 or self._chunk_index == 0
        ):
            self.flush()
        for sink in self.sinks:
            sink.close()
        rate = self.graph.input_rate or 0
        audio_s = self._samples_in / rate if rate else 0.0
        if self.stats is not None:
            self.stats.record_run(audio_s)
            self.stats.save()
        self.state = SessionState.CLOSED
        from .registry import REGISTRY

        REGISTRY.unregister(self)
        self.events.emit_session_state("closed")
        _log.info("session closed: %d chunks, %.2f audio-s", self._chunk_index, audio_s)
        return {"chunks": self._chunk_index, "audio_seconds": audio_s}

    # ------------------------------------------------------------ checkpoint
    @staticmethod
    def _snapshot_path(path) -> Path:
        # np.savez appends .npz to other suffixes; normalize so snapshot and
        # restore always agree on the on-disk name
        p = Path(path)
        return p if p.suffix == ".npz" else p.with_name(p.name + ".npz")

    def snapshot(self, path: str) -> None:
        """Persist carry + pending buffer + counters (resumable, SURVEY §5.4)."""
        leaves, treedef = jax.tree_util.tree_flatten(self._carry)
        arrays = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
        path = self._snapshot_path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        np.savez(
            path,
            __buffer=self._buffer,
            __chunk_index=self._chunk_index,
            __samples_in=self._samples_in,
            **arrays,
        )

    def restore(self, path: str) -> "StreamSession":
        """Restore a snapshot into an OPEN session with identical graph/chunk."""
        self.open()
        data = np.load(self._snapshot_path(path), allow_pickle=False)
        leaves, treedef = jax.tree_util.tree_flatten(self._carry)
        restored = [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(leaves))]
        self._carry = jax.tree_util.tree_unflatten(treedef, restored)
        self._buffer = data["__buffer"]
        self._chunk_index = int(data["__chunk_index"])
        self._samples_in = int(data["__samples_in"])
        return self
