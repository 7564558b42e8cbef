"""YIN pitch tracking: serial float64 oracle, tone accuracy, edge behavior."""

import numpy as np
import pytest

import jax.numpy as jnp

from audioflow_tpu import ops

FS = 16000


def _cmnd_oracle(fr: np.ndarray, w: int) -> np.ndarray:
    """Serial float64 CMND straight from the YIN paper (steps 1-3)."""
    fr = fr.astype(np.float64)
    d = np.zeros(w + 1)
    for tau in range(w + 1):
        diff = fr[:w] - fr[tau : tau + w]
        d[tau] = (diff * diff).sum()
    dn = np.ones(w + 1)
    run = 0.0
    for tau in range(1, w + 1):
        run += d[tau]
        dn[tau] = d[tau] * tau / run if run > 0 else 1.0
    return dn


def test_cmnd_matches_serial_oracle(rng):
    fr = (0.5 * np.sin(2 * np.pi * 220.0 * np.arange(1024) / FS)
          + 0.05 * rng.standard_normal(1024)).astype(np.float32)
    got = np.asarray(ops.cmnd_frames(jnp.asarray(fr[None, :]), 512))[0]
    want = _cmnd_oracle(fr, 512)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)
    assert got[0] == 1.0


@pytest.mark.parametrize("f0", [110.0, 220.3, 441.0, 987.0])
def test_yin_pure_tone_accuracy(f0):
    t = np.arange(FS) / FS
    x = jnp.asarray((0.5 * np.sin(2 * np.pi * f0 * t)).astype(np.float32))
    est = np.asarray(ops.yin(x, FS, fmin=80, fmax=1200))
    mid = est[4:-4]
    assert np.abs(mid - f0).max() / f0 < 0.01, (f0, mid.min(), mid.max())


def test_yin_missing_fundamental():
    """Harmonics 2f+3f+4f with no energy at f: YIN still reports f (the
    period is 1/f) — the classic case spectral peak-picking gets wrong."""
    f0 = 150.0
    t = np.arange(FS) / FS
    x = sum(0.3 * np.sin(2 * np.pi * k * f0 * t + 0.7 * k) for k in (2, 3, 4))
    est = np.asarray(ops.yin(jnp.asarray(x.astype(np.float32)), FS, fmin=80, fmax=500))
    assert np.abs(est[4:-4] - f0).max() / f0 < 0.01


def test_yin_voicing_separates_tone_from_noise(rng):
    t = np.arange(FS) / FS
    tone = 0.5 * np.sin(2 * np.pi * 330.0 * t[: FS // 2])
    noise = 0.5 * rng.standard_normal(FS // 2)
    x = jnp.asarray(np.concatenate([tone, noise]).astype(np.float32))
    f0, ap = ops.yin_voicing(x, FS, fmin=80, fmax=1200)
    f0, ap = np.asarray(f0), np.asarray(ap)
    n = len(f0)
    assert ap[2 : n // 2 - 4].max() < 0.1  # periodic half: deep troughs
    assert ap[n // 2 + 4 : -2].min() > 0.3  # noise half: no periodicity


def test_yin_batched_and_silence(rng):
    x = np.zeros((2, FS // 2), np.float32)
    x[1] = 0.4 * np.sin(2 * np.pi * 220.0 * np.arange(FS // 2) / FS)
    f0, ap = ops.yin_voicing(jnp.asarray(x), FS, fmin=80, fmax=1200)
    assert f0.shape == ap.shape and f0.shape[0] == 2
    # silence: CMND defined to 1 (unvoiced), f0 finite (no NaNs anywhere)
    assert np.isfinite(np.asarray(f0)).all()
    assert np.asarray(ap)[0].min() >= 0.99
    assert np.abs(np.asarray(f0)[1][4:-4] - 220.0).max() < 3.0


def test_yin_validation_errors():
    x = jnp.zeros(4096, jnp.float32)
    with pytest.raises(ValueError):
        ops.yin(x, FS, fmin=8000.0, fmax=9000.0)  # lags collapse below 2
    with pytest.raises(ValueError):
        ops.cmnd_frames(jnp.zeros((4, 100)), 80)  # needs frame >= 2*win


def test_yin_node_offline_and_streaming(rng):
    from audioflow_tpu.config import graph_from_spec, graph_to_spec
    from audioflow_tpu.graph import Yin, chain

    t = np.arange(2 * FS) / FS
    x = (0.5 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    g = chain(Yin(fmin=80, fmax=1200, frame_length=1024, hop=256, center=False), input_rate=FS)
    out = np.asarray(g.chain(jnp.asarray(x)))
    assert out.shape[-1] == 2
    assert np.abs(out[4:-4, 0] - 220.0).max() < 3.0
    # exact streaming at the declared latency
    chunk = g.chunk_granularity() * 8
    streamed = np.asarray(g.scan_stream(jnp.asarray(x[: len(x) // chunk * chunk]), chunk))
    lat = g.stream_latency(chunk)
    n = min(streamed.shape[0] - lat, out.shape[0])
    np.testing.assert_allclose(streamed[lat : lat + n], out[:n], rtol=2e-4, atol=1e-4)
    # spec round-trip
    g2 = graph_from_spec(graph_to_spec(g))
    assert g2.nodes[0].fmax == 1200
    # center=True: offline only
    from audioflow_tpu.errors import AudioError

    gc = chain(Yin(center=True), input_rate=FS)
    with pytest.raises(AudioError):
        gc.init_state(2048)
