import numpy as np
import pytest

import jax.numpy as jnp

from audioflow_tpu import ops
from audioflow_tpu.graph import Cmvn, Preemphasis, chain
from audioflow_tpu.models import kaldi_fbank_frontend


def test_preemphasis_matches_serial(rng):
    x = rng.standard_normal(1000).astype(np.float32)
    got = np.asarray(ops.preemphasis(jnp.asarray(x), 0.97))
    want = np.empty_like(x)
    want[0] = x[0] - 0.97 * x[0]
    want[1:] = x[1:] - 0.97 * x[:-1]
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_preemphasis_streaming_exact(rng):
    g = chain(Preemphasis(0.97), input_rate=16000)
    x = rng.standard_normal(4096).astype(np.float32)
    streamed = np.asarray(g.scan_stream(jnp.asarray(x), 512))
    offline = np.asarray(g.chain(jnp.asarray(x)))
    np.testing.assert_allclose(streamed, offline, atol=1e-7)


def test_cmvn(rng):
    f = rng.standard_normal((3, 100, 40)).astype(np.float32) * 3 + 1.5
    out = np.asarray(ops.cmvn(jnp.asarray(f), norm_var=True))
    np.testing.assert_allclose(out.mean(axis=1), 0.0, atol=1e-5)
    np.testing.assert_allclose(out.var(axis=1), 1.0, atol=1e-3)
    out2 = np.asarray(ops.cmvn(jnp.asarray(f), norm_var=False))
    np.testing.assert_allclose(out2.var(axis=1), f.var(axis=1), rtol=1e-4)


def test_kaldi_fbank_frontend(rng):
    g = kaldi_fbank_frontend(16000, n_mels=40)
    x = jnp.asarray((rng.standard_normal((2, 16000)) * 0.3).astype(np.float32))
    out = np.asarray(g.compile()(x))
    # 25ms/10ms at 16k: win 400 -> n_fft 512; frames = (16000-512)//160+1
    assert out.shape == (2, (16000 - 512) // 160 + 1, 40)
    # CMVN applied: per-utterance mean ~ 0
    np.testing.assert_allclose(out.mean(axis=1), 0.0, atol=1e-4)
    assert np.isfinite(out).all()


def test_kaldi_fbank_streaming_without_cmvn(rng):
    g = kaldi_fbank_frontend(16000, n_mels=24, cmvn=False)
    assert g.streamable
    chunk = g.chunk_granularity() * 40
    x = (rng.standard_normal(chunk * 4) * 0.3).astype(np.float32)
    streamed = np.asarray(g.scan_stream(jnp.asarray(x), chunk))
    offline = np.asarray(g.chain(jnp.asarray(x)))
    lat = g.stream_latency(chunk)
    n = min(len(streamed) - lat, len(offline))
    np.testing.assert_allclose(streamed[lat : lat + n], offline[:n], atol=5e-4)


def test_cmvn_not_streamable():
    from audioflow_tpu.errors import AudioError

    g = kaldi_fbank_frontend(16000, cmvn=True)
    with pytest.raises(AudioError):
        g.init_state(1600)
