"""Example: extract log-mel features from a directory of WAVs, pipelined.

    python examples/batch_features.py /path/to/wavs '*.wav' out_features.npy
"""

import sys
from pathlib import Path

from audioflow_tpu.io import BatchLoader
from audioflow_tpu.models import log_mel_frontend
from audioflow_tpu.runner import run_batches
from audioflow_tpu.sinks import NpySink


def main(wav_dir: str, pattern: str = "*.wav", out: str = "features.npy") -> None:
    files = sorted(Path(wav_dir).glob(pattern))
    if not files:
        raise SystemExit(f"no files matching {pattern} under {wav_dir}")
    graph = log_mel_frontend(input_rate=44100, target_rate=16000, n_mels=128)
    sink = NpySink(out)
    metrics = run_batches(
        graph,
        BatchLoader(files, batch_size=64),
        sinks=[sink],
        expect_rate=44100,
    )
    sink.close()
    print(
        f"{metrics.files} files ({metrics.failed_files} failed lanes), "
        f"{metrics.audio_seconds:.1f} audio-s at {metrics.realtime_factor:.0f}x realtime -> {out}"
    )


if __name__ == "__main__":
    main(*sys.argv[1:])
