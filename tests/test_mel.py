import numpy as np
import pytest
import scipy.fft

import jax.numpy as jnp

from audioflow_tpu.ops import apply_mel, dct_matrix, log_mel, mel_filterbank, mfcc
from audioflow_tpu.ops.mel import hz_to_mel, mel_to_hz


def test_mel_hz_round_trip():
    f = np.linspace(0, 8000, 100)
    for htk in (False, True):
        np.testing.assert_allclose(mel_to_hz(hz_to_mel(f, htk), htk), f, rtol=1e-10, atol=1e-6)


def test_hz_to_mel_htk_known_value():
    # 1000 Hz -> 2595*log10(1 + 1000/700) ≈ 999.9855
    np.testing.assert_allclose(hz_to_mel(1000.0, htk=True), 999.9855, atol=1e-3)


def _fb_oracle(n_freqs, n_mels, sr, fmin, fmax, htk, norm):
    """Loop-based independent filterbank construction."""
    n_fft = 2 * (n_freqs - 1)
    freqs = np.arange(n_freqs) * sr / n_fft
    pts = mel_to_hz(np.linspace(hz_to_mel(fmin, htk), hz_to_mel(fmax, htk), n_mels + 2), htk)
    fb = np.zeros((n_freqs, n_mels))
    for m in range(n_mels):
        lo, c, hi = pts[m], pts[m + 1], pts[m + 2]
        for k, f in enumerate(freqs):
            if lo <= f <= c and c > lo:
                fb[k, m] = (f - lo) / (c - lo)
            elif c < f <= hi and hi > c:
                fb[k, m] = (hi - f) / (hi - c)
        if norm == "slaney":
            fb[:, m] *= 2.0 / (hi - lo)
    return fb


@pytest.mark.parametrize("htk,norm", [(False, "slaney"), (True, None), (False, None)])
def test_filterbank_matches_oracle(htk, norm):
    got = mel_filterbank(513, 40, 16000, 50.0, 7600.0, htk=htk, norm=norm, dtype=np.float64)
    want = _fb_oracle(513, 40, 16000, 50.0, 7600.0, htk, norm)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_filterbank_coverage():
    fb = mel_filterbank(513, 128, 16000, norm=None)
    # every interior frequency bin is covered by at least one filter
    covered = fb.sum(axis=1)
    assert (covered[5:-5] > 0).all()
    assert fb.shape == (513, 128)


def test_apply_mel_and_log(rng):
    spec = jnp.asarray(rng.random((7, 513)).astype(np.float32))
    fb = mel_filterbank(513, 64, 16000)
    m = np.asarray(apply_mel(spec, fb))
    want = np.asarray(spec) @ fb
    np.testing.assert_allclose(m, want, rtol=2e-5, atol=1e-6)
    lm = np.asarray(log_mel(spec, fb, floor=1e-10, log_base="ln"))
    np.testing.assert_allclose(lm, np.log(np.maximum(want, 1e-10)), rtol=1e-4, atol=1e-4)


def test_dct_matches_scipy(rng):
    x = rng.standard_normal((5, 40))
    d = dct_matrix(40, 40, norm="ortho", dtype=np.float64)
    got = x @ d
    want = scipy.fft.dct(x, type=2, axis=-1, norm="ortho")
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_mfcc_shape(rng):
    lm = jnp.asarray(rng.standard_normal((9, 40)).astype(np.float32))
    out = mfcc(lm, n_mfcc=13)
    assert out.shape == (9, 13)


def test_log_mel_fused_matches_two_stage(rng):
    """The fused two-dot form == spectrogram(power) -> log_mel at matched
    precisions (the stacked-fb identity: mel(re^2+im^2) == y^2 @ [fb;fb'])."""
    from audioflow_tpu import ops

    x = jnp.asarray((0.3 * rng.standard_normal((2, 16000))).astype(np.float32))
    fb = ops.mel_filterbank(513, 128, 16000)
    want = np.asarray(ops.log_mel(ops.spectrogram(x, 1024, 256, center=False), fb))
    got = np.asarray(ops.log_mel_fused(x, fb, 1024, 256, center=False))
    np.testing.assert_allclose(got, want, atol=2e-4)
    # center=True agrees too
    wc = np.asarray(ops.log_mel(ops.spectrogram(x, 1024, 256, center=True), fb))
    gc = np.asarray(ops.log_mel_fused(x, fb, 1024, 256, center=True))
    np.testing.assert_allclose(gc, wc, atol=2e-4)
    with pytest.raises(ValueError):
        ops.log_mel_fused(x, fb, 1023, 256)


def test_logmelspec_node_streams_and_matches_pair(rng):
    from audioflow_tpu.config import graph_from_spec, graph_to_spec
    from audioflow_tpu.graph import LogMelSpec, MelProject, Spectrogram, chain

    x = (0.3 * rng.standard_normal(16 * 2048)).astype(np.float32)
    g = chain(LogMelSpec(512, 128, 40), input_rate=16000)
    pair = chain(Spectrogram(512, 128, center=False), MelProject(n_mels=40), input_rate=16000)
    a = np.asarray(g.chain(jnp.asarray(x)))
    b = np.asarray(pair.chain(jnp.asarray(x)))
    np.testing.assert_allclose(a, b, atol=2e-4)
    # exact streaming (Spectrogram-style overlap carry)
    chunk = g.chunk_granularity() * 8
    streamed = np.asarray(g.scan_stream(jnp.asarray(x), chunk))
    lat = g.stream_latency(chunk)
    n = min(streamed.shape[0] - lat, a.shape[0])
    np.testing.assert_allclose(streamed[lat : lat + n], a[:n], atol=1e-5)
    g2 = graph_from_spec(graph_to_spec(g))
    np.testing.assert_array_equal(np.asarray(g2.chain(jnp.asarray(x))), a)


def test_log_mel_frontend_fused_flag(rng):
    from audioflow_tpu.models import log_mel_frontend

    x = jnp.asarray((0.3 * rng.standard_normal(22050)).astype(np.float32))
    gf = log_mel_frontend(44100, 16000, 1024, 256, 128, fused=True)
    gp = log_mel_frontend(44100, 16000, 1024, 256, 128)
    assert type(gf.nodes[-1]).__name__ == "LogMelSpec"
    assert type(gp.nodes[-1]).__name__ == "MelProject"  # the shipped default
    np.testing.assert_allclose(
        np.asarray(gf.chain(x)), np.asarray(gp.chain(x)), atol=2e-4
    )


# ---------------------------------------------------------------------------
# Inversion: mel/MFCC -> spectrogram -> audio
# ---------------------------------------------------------------------------


def test_mel_to_stft_nnls_roundtrip(rng):
    from audioflow_tpu.ops import apply_mel, mel_filterbank, mel_to_stft

    fb = mel_filterbank(513, 64, 16000)
    s_true = (rng.random((20, 513)) ** 2).astype(np.float32)
    m = apply_mel(jnp.asarray(s_true), fb)
    s_rec = mel_to_stft(m, fb, n_iter=64)
    assert (np.asarray(s_rec) >= 0).all()
    # the mel projection of the reconstruction matches the target mel
    m_rec = np.asarray(apply_mel(s_rec, fb))
    rel = np.abs(m_rec - np.asarray(m)).max() / np.asarray(m).max()
    assert rel < 2e-2, rel


def test_mfcc_to_log_mel_full_basis_is_exact(rng):
    from audioflow_tpu.ops import mfcc, mfcc_to_log_mel

    lm = rng.standard_normal((7, 32)).astype(np.float32)
    back = np.asarray(mfcc_to_log_mel(mfcc(jnp.asarray(lm), n_mfcc=32), n_mels=32))
    np.testing.assert_allclose(back, lm, atol=1e-4)
    # truncated basis: smooth approximation, finite
    back13 = np.asarray(mfcc_to_log_mel(mfcc(jnp.asarray(lm), 13), n_mels=32))
    assert np.isfinite(back13).all() and back13.shape == lm.shape


def test_mel_to_audio_recovers_tone():
    from audioflow_tpu.ops import apply_mel, mel_filterbank, mel_to_audio, power, stft

    sr = 16000
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    fb = mel_filterbank(513, 128, sr)
    m = apply_mel(power(stft(jnp.asarray(x), 1024, 256)), fb)
    y = np.asarray(mel_to_audio(m, fb, 1024, 256, nnls_iter=32, gl_iter=16, length=sr))
    assert y.shape == (sr,) and np.isfinite(y).all()
    sp = np.abs(np.fft.rfft(y[2000:14000] * np.hanning(12000)))
    peak = np.fft.rfftfreq(12000, 1 / sr)[sp.argmax()]
    assert abs(peak - 440.0) < 8.0, peak


def test_mfcc_to_audio_runs_finite(rng):
    from audioflow_tpu.ops import (apply_mel, log_mel, mel_filterbank, mfcc,
                                   mfcc_to_audio, power, stft)

    sr = 16000
    x = (0.3 * rng.standard_normal(sr)).astype(np.float32)
    fb = mel_filterbank(513, 64, sr)
    lm = log_mel(power(stft(jnp.asarray(x), 1024, 256)), fb)
    c = mfcc(lm, 13)
    y = np.asarray(mfcc_to_audio(c, fb, 1024, 256, gl_iter=4, nnls_iter=8, length=sr))
    assert y.shape == (sr,) and np.isfinite(y).all()
    with pytest.raises(ValueError):
        mfcc_to_audio(c, fb, log_base="log2")
