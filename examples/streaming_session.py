"""Example: dictation-style streaming with VAD gating and wire egress.

Feeds microphone-sized PCM pushes through a session, writes reference-parity
wire messages (base64 i16 chunks) to JSONL, snapshots mid-stream, and resumes.

    python examples/streaming_session.py input.wav out.jsonl
"""

import sys

import numpy as np

from audioflow_tpu.graph import QuantizeI16, Resample, VadGate, chain
from audioflow_tpu.io import read_wav
from audioflow_tpu.session import StreamSession
from audioflow_tpu.sinks import EventDispatcher, WireJsonlSink


def main(wav_path: str, out_jsonl: str = "wire.jsonl") -> None:
    pcm, rate = read_wav(wav_path)
    if pcm.ndim == 2:
        pcm = pcm.mean(axis=1).astype(np.float32)
    graph = chain(
        VadGate(frame_len=rate * 20 // 1000),  # 20 ms VAD frames
        Resample(rate, 16000, "cubic"),  # reference rubato-parity mode
        QuantizeI16(),
        input_rate=rate,
    )
    events = EventDispatcher()
    events.subscribe(
        lambda e: e.kind.value == "audio_level"
        and print(f"  level rms={e.payload['rms']:.3f} peak={e.payload['peak']:.3f}")
    )
    session = StreamSession(graph, sinks=[WireJsonlSink(out_jsonl)], events=events)
    with session:
        # push in irregular mic-callback-sized bites; the session accumulates
        step = rate // 50
        starts = list(range(0, len(pcm), step))
        half = len(starts) // 2
        for i in starts[:half]:
            session.push(pcm[i : i + step])
        session.snapshot("/tmp/session.ckpt")  # resumable mid-stream
        for i in starts[half:]:
            session.push(pcm[i : i + step])
        final = session.flush()
        print("final chunk index:", final.index if final else "(none)")
    print(f"wire messages -> {out_jsonl}")


if __name__ == "__main__":
    main(*sys.argv[1:])
