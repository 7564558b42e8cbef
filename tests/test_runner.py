import numpy as np
import pytest

import jax.numpy as jnp

from audioflow_tpu.graph import MelProject, Resample, Spectrogram, chain
from audioflow_tpu.io import BatchLoader, write_wav
from audioflow_tpu.parallel import make_mesh
from audioflow_tpu.runner import run_batches
from audioflow_tpu.sinks import ArraySink


def _graph():
    return chain(
        Resample(44100, 16000, "kaiser"),
        Spectrogram(512, 128, center=False),
        MelProject(n_mels=32),
        input_rate=44100,
    )


def _make_files(tmp_path, n=7, rate=44100, seconds=0.5):
    t = np.arange(int(rate * seconds)) / rate
    paths = []
    for i in range(n):
        p = tmp_path / f"f{i}.wav"
        write_wav(p, (0.3 * np.sin(2 * np.pi * (200 + 50 * i) * t)).astype(np.float32), rate)
        paths.append(p)
    return paths


def test_run_batches_end_to_end(tmp_path):
    paths = _make_files(tmp_path)
    g = _graph()
    sink = ArraySink()
    loader = BatchLoader(paths, batch_size=3, stride=44100 // 2)
    m = run_batches(g, loader, sinks=[sink])
    assert m.files == 7 and m.failed_files == 0 and m.batches == 3
    out = sink.result()
    assert out.shape[0] == 7 and out.shape[2] == 32
    assert m.audio_seconds == pytest.approx(3.5, abs=1e-3)
    # values match a direct single-batch run
    from audioflow_tpu.io import decode_batch

    direct = np.asarray(g.compile()(jnp.asarray(decode_batch(paths, stride=44100 // 2).samples)))
    np.testing.assert_allclose(out, direct, atol=1e-5)


def test_run_batches_masks_bad_files(tmp_path):
    paths = _make_files(tmp_path, n=3)
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"not a wav")
    g = _graph()
    sink = ArraySink()
    loader = BatchLoader([paths[0], bad, paths[1], paths[2]], batch_size=2, stride=44100 // 2)
    m = run_batches(g, loader, sinks=[sink])
    assert m.failed_files == 1
    assert sink.result().shape[0] == 3  # only valid lanes written


def test_run_batches_masks_wrong_rate(tmp_path):
    paths = _make_files(tmp_path, n=2)
    other = tmp_path / "other.wav"
    write_wav(other, np.zeros(8000, np.float32), 16000)  # wrong rate
    g = _graph()
    loader = BatchLoader([*paths, other], batch_size=3, stride=44100 // 2)
    m = run_batches(g, loader, expect_rate=44100)
    assert m.failed_files == 1


def test_run_batches_sharded(tmp_path):
    paths = _make_files(tmp_path, n=8)
    g = _graph()
    sink = ArraySink()
    loader = BatchLoader(paths, batch_size=8, stride=44100 // 2)
    m = run_batches(g, loader, sinks=[sink], mesh=make_mesh())
    assert m.n_devices == 8 and m.files == 8
    assert sink.result().shape[0] == 8


def test_run_batches_empty_raises(tmp_path):
    from audioflow_tpu.errors import AudioError

    with pytest.raises(AudioError):
        run_batches(_graph(), BatchLoader([], batch_size=2))
