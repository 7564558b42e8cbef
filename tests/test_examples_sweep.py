"""Examples are runnable; randomized streaming==offline sweep."""

import json
import subprocess
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from audioflow_tpu import ops
from audioflow_tpu.config import graph_from_spec
from audioflow_tpu.graph import (
    BiquadChain,
    Gain,
    Compressor,
    Limiter,
    MelProject,
    Preemphasis,
    Resample,
    Spectrogram,
    chain,
)
from audioflow_tpu.io import write_wav


def test_example_specs_load_and_run(rng):
    for spec_file in ("examples/logmel_spec.json", "examples/eq_master_spec.json",
                      "examples/mfcc_spec.json", "examples/asr_frontend_spec.json",
                      "examples/kws_pcen_spec.json", "examples/denoise_master_spec.json",
                      "examples/echo_ensemble_spec.json"):
        with open(spec_file) as f:
            g = graph_from_spec(json.load(f))
        x = jnp.asarray(rng.standard_normal(g.input_rate).astype(np.float32) * 0.3)
        out = g.compile()(x)
        assert np.isfinite(np.asarray(out)).all()


def test_example_scripts_run(tmp_path):
    t = np.arange(44100) / 44100
    for i in range(3):
        write_wav(tmp_path / f"x{i}.wav", (0.3 * np.sin(2 * np.pi * (220 + i * 110) * t)).astype(np.float32), 44100)
    from pathlib import Path

    repo = str(Path(__file__).resolve().parents[1])
    env = {"PYTHONPATH": repo, "JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin", "HOME": "/root"}
    r1 = subprocess.run(
        [sys.executable, "examples/batch_features.py", str(tmp_path), "*.wav", str(tmp_path / "f.npy")],
        capture_output=True, text=True, env=env, cwd=repo, timeout=300,
    )
    assert r1.returncode == 0, r1.stderr[-500:]
    assert np.load(tmp_path / "f.npy").shape[0] == 3
    r2 = subprocess.run(
        [sys.executable, "examples/streaming_session.py", str(tmp_path / "x0.wav"), str(tmp_path / "w.jsonl")],
        capture_output=True, text=True, env=env, cwd=repo, timeout=300,
    )
    assert r2.returncode == 0, r2.stderr[-500:]
    assert (tmp_path / "w.jsonl").read_text().count("input_audio_chunk") > 0
    r3 = subprocess.run(
        [sys.executable, "examples/train_kws.py", "40", str(tmp_path / "kws.json")],
        capture_output=True, text=True, env=env, cwd=repo, timeout=300,
    )
    assert r3.returncode == 0, r3.stderr[-500:]
    rep = json.loads((tmp_path / "kws.json").read_text())
    assert rep["train_accuracy"] > 0.9 and rep["loss_last"] < rep["loss_first"]
    # cqt_edit: CQT-domain high-pass through the invertible multirate
    # transform — a two-tone file keeps the high tone, loses the low one
    sr = 16000
    t = np.arange(sr * 2) / sr
    two = (0.4 * np.sin(2 * np.pi * 220.0 * t)
           + 0.4 * np.sin(2 * np.pi * 880.0 * t)).astype(np.float32)
    write_wav(tmp_path / "two.wav", two, sr)
    r4 = subprocess.run(
        [sys.executable, "examples/cqt_edit.py", str(tmp_path / "two.wav"),
         str(tmp_path / "hp.wav"), "440"],
        capture_output=True, text=True, env=env, cwd=repo, timeout=300,
    )
    assert r4.returncode == 0, r4.stderr[-500:]
    from audioflow_tpu.io import read_audio

    y, _ = read_audio(str(tmp_path / "hp.wav"))
    mid = y[8000:-8000]
    spec = np.abs(np.fft.rfft(mid))
    fr = np.fft.rfftfreq(len(mid), 1 / sr)
    a220 = spec[np.argmin(np.abs(fr - 220))]
    a880 = spec[np.argmin(np.abs(fr - 880))]
    assert a880 > 30 * a220, (a220, a880)


@pytest.mark.parametrize("seed", range(6))
def test_random_graph_streaming_equals_offline(seed):
    """Randomized sweep: any streamable graph must satisfy the exact
    streamed == shifted-offline invariant at its declared latency."""
    rng = np.random.default_rng(seed)
    in_rate = int(rng.choice([48000, 44100, 32000]))
    pool = [
        lambda: Resample(in_rate, 16000, str(rng.choice(["kaiser", "cubic"]))),
        lambda: BiquadChain((ops.highpass(float(rng.uniform(50, 200)), 16000.0),)),
        lambda: Gain(float(rng.uniform(-6, 6))),
        lambda: Preemphasis(float(rng.uniform(0.9, 0.99))),
        lambda: Limiter(float(rng.uniform(-6, -1))),
        lambda: Compressor(float(rng.uniform(-24, -12)), float(rng.uniform(2, 6))),
        # NoiseGate excluded like VadGate: its hard threshold is
        # discontinuous, so ~1e-7 reassociation noise from an upstream
        # chunked resample can flip a gate decision — exact streaming is
        # tested without upstream noise in test_nodes_dynamics_features
    ]
    nodes = [pool[0]()]  # always resample first (sets 16k)
    for maker in pool[1:]:
        if rng.random() < 0.6:
            nodes.append(maker())
    if rng.random() < 0.7:
        nodes += [
            Spectrogram(int(rng.choice([256, 512])), 128, center=False),
            MelProject(n_mels=int(rng.choice([24, 40]))),
        ]
    g = chain(*nodes, input_rate=in_rate)
    chunk = g.chunk_granularity() * int(rng.integers(2, 6))
    x = (rng.standard_normal(chunk * 10) * 0.3).astype(np.float32)
    streamed = np.asarray(g.scan_stream(jnp.asarray(x), chunk))
    offline = np.asarray(g.chain(jnp.asarray(x)))
    lat = g.stream_latency(chunk)
    n = min(len(streamed) - lat, len(offline))
    assert n >= 8, (chunk, lat)
    a, b = streamed[lat : lat + n], offline[:n]
    # exact from sample 0: warmup zeroing (Graph._warmups) keeps recursive
    # carries (biquad/limiter) clean of upstream preroll. The only remaining
    # difference is f32 reassociation noise between the chunked and
    # whole-signal programs (~1e-5 relative); the pre-fix preroll transient
    # was ~6e-3 relative, so this tolerance catches any regression.
    scale = max(float(np.abs(b).max()), 0.5)
    np.testing.assert_allclose(a, b, atol=5e-5 * scale)
