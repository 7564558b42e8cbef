"""FLAC codec: Python oracle round-trips, C++ parity, loader integration.

FLAC is lossless, so every assertion here is bit-exact on the integer
samples — no tolerance anywhere. The Python encoder (io/flac.py) is the
fixture generator; hand-built streams cover the decoder paths the encoder
itself doesn't emit (LPC, rice2, partitions, wasted bits, stereo
decorrelation, escape partitions).
"""

import struct

import numpy as np
import pytest

from audioflow_tpu.errors import IOError_
from audioflow_tpu.io import decode_batch, native, read_audio
from audioflow_tpu.io.flac import (
    _BitWriter,
    _crc8,
    _crc16,
    MAGIC,
    decode_int,
    probe,
    read_flac,
    write_flac,
)


def _sig(n, seed=0, amp=0.4):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    return (amp * np.sin(2 * np.pi * 220 * t) + 0.05 * rng.standard_normal(n)).astype(np.float32)


def _as_int(x, bits):
    s = float(1 << (bits - 1))
    return np.clip(np.round(np.asarray(x, np.float64) * s), -s, s - 1).astype(np.int64)


# ------------------------------------------------------------------ encoder
@pytest.mark.parametrize("bits", [8, 16, 24])
@pytest.mark.parametrize("channels", [1, 2])
def test_roundtrip_bit_exact(bits, channels):
    x = _sig(10000)
    if channels == 2:
        x = np.stack([x, np.roll(-x, 7)], axis=1)
    buf = write_flac(None, x, 16000, bits=bits, blocksize=1024)
    ints, info = decode_int(buf)
    want = _as_int(x if channels == 2 else x[:, None], bits)
    assert info.bits == bits and info.channels == channels
    np.testing.assert_array_equal(ints, want)
    y, sr = read_flac(buf)
    assert sr == 16000
    np.testing.assert_array_equal(
        np.asarray(y, np.float64), want.squeeze() / float(1 << (bits - 1))
    )


def test_compression_actually_happens():
    x = _sig(32000, amp=0.6)
    buf = write_flac(None, x, 16000, bits=16)
    assert len(buf) < 0.92 * 32000 * 2  # tonal+noise: fixed predictors win
    silence = write_flac(None, np.zeros(32000, np.float32), 16000, bits=16)
    assert len(silence) < 600  # constant subframes collapse


def test_probe_and_errors():
    x = _sig(2000)
    buf = write_flac(None, x, 44100, bits=16)
    info = probe(buf)
    assert (info.sample_rate, info.channels, info.bits, info.n_frames) == (44100, 1, 16, 2000)
    with pytest.raises(IOError_):
        probe(b"not flac at all")
    with pytest.raises(IOError_):
        probe(MAGIC + b"\x00\x00\x00")  # truncated metadata
    with pytest.raises(IOError_):
        decode_int(buf[: len(buf) // 2])  # truncated mid-frame


# ------------------------------------- hand-built streams (decoder-only paths)
def _stream(frame_bits_fn, samples, bits=16, channels=1, rate=16000, ch_code=None):
    """Build a one-frame FLAC stream with a custom subframe writer."""
    n = len(samples[0]) if samples and isinstance(samples[0], (list, np.ndarray)) else len(samples)
    bw = _BitWriter()
    bw.write(0x3FFE, 14)
    bw.write(0, 2)
    bw.write(7, 4)  # 16-bit blocksize-1 follows
    bw.write(0, 4)  # rate from STREAMINFO
    bw.write((channels - 1) if ch_code is None else ch_code, 4)
    bw.write({8: 1, 16: 4, 24: 6}[bits], 3)
    bw.write(0, 1)
    bw.write(0, 8)  # frame number 0
    bw.write(n - 1, 16)
    bw.align()
    header = bw.getvalue()
    bw = _BitWriter()
    for b in header:
        bw.write(b, 8)
    bw.write(_crc8(header), 8)
    frame_bits_fn(bw)
    bw.align()
    body = bw.getvalue()
    frame = body + struct.pack(">H", _crc16(body))

    si = _BitWriter()
    si.write(n, 16)
    si.write(n, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(channels - 1, 3)
    si.write(bits - 1, 5)
    si.write(n, 36)
    streaminfo = si.getvalue() + b"\0" * 16
    return MAGIC + bytes([0x80, 0, 0, 34]) + streaminfo + frame


def test_lpc_subframe_decodes():
    """LPC order-2 with chosen coefficients; residuals computed to invert."""
    rng = np.random.default_rng(3)
    n, order, shift = 512, 2, 5
    coef = [45, -19]  # arbitrary quantized predictor
    s = list((rng.integers(-2000, 2000, n)).astype(int))

    def emit(bw):
        bw.write(0, 1)
        bw.write(32 + order - 1, 6)  # LPC order 2
        bw.write(0, 1)
        for v in s[:order]:
            bw.write(v, 16)
        bw.write(14, 4)  # precision 15
        bw.write(shift, 5)
        for c in coef:
            bw.write(c, 15)
        bw.write(0, 2)  # rice
        bw.write(0, 4)  # 1 partition
        bw.write(14, 4)  # big k: residuals fit without huge unary runs
        for i in range(order, n):
            pred = (coef[0] * s[i - 1] + coef[1] * s[i - 2]) >> shift
            r = s[i] - pred
            z = (r << 1) ^ (r >> 63) if r < 0 else r << 1
            bw.write_unary(z >> 14)
            bw.write(z, 14)

    ints, info = decode_int(_stream(emit, s))
    np.testing.assert_array_equal(ints[:, 0], np.asarray(s))


def test_rice2_partitions_and_escape():
    rng = np.random.default_rng(4)
    n = 256
    s = list(rng.integers(-500, 500, n).astype(int))

    def emit(bw):
        bw.write(0, 1)
        bw.write(8, 6)  # FIXED order 0
        bw.write(0, 1)
        bw.write(1, 2)  # RICE2 (5-bit params)
        bw.write(2, 4)  # 4 partitions of 64
        for p in range(4):
            part = s[p * 64 : (p + 1) * 64]
            if p == 1:
                bw.write(31, 5)  # escape
                bw.write(12, 5)  # 12-bit raw
                for v in part:
                    bw.write(v, 12)
            else:
                bw.write(6, 5)
                for v in part:
                    z = (v << 1) ^ (v >> 63) if v < 0 else v << 1
                    bw.write_unary(z >> 6)
                    bw.write(z, 6)

    ints, _ = decode_int(_stream(emit, s))
    np.testing.assert_array_equal(ints[:, 0], np.asarray(s))


def test_wasted_bits():
    s = [v << 3 for v in range(-100, 100)]  # 3 trailing zero bits everywhere

    def emit(bw):
        bw.write(0, 1)
        bw.write(1, 6)  # VERBATIM
        bw.write(1, 1)  # wasted flag
        bw.write(1, 3)  # unary 2 zeros + 1 -> wasted = 3
        for v in s:
            bw.write(v >> 3, 13)  # bps - wasted

    ints, _ = decode_int(_stream(emit, s))
    np.testing.assert_array_equal(ints[:, 0], np.asarray(s))


@pytest.mark.parametrize("ch_code", [8, 9, 10], ids=["left-side", "side-right", "mid-side"])
def test_stereo_decorrelation(ch_code):
    rng = np.random.default_rng(5)
    n = 128
    left = rng.integers(-3000, 3000, n).astype(int)
    right = rng.integers(-3000, 3000, n).astype(int)
    side = left - right

    def verb(bw, vals, bps):
        bw.write(0, 1)
        bw.write(1, 6)
        bw.write(0, 1)
        for v in vals:
            bw.write(int(v), bps)

    def emit(bw):
        if ch_code == 8:  # left, side
            verb(bw, left, 16)
            verb(bw, side, 17)
        elif ch_code == 9:  # side, right
            verb(bw, side, 17)
            verb(bw, right, 16)
        else:  # mid, side
            mid = (left + right) >> 1
            verb(bw, mid, 16)
            verb(bw, side, 17)

    ints, info = decode_int(_stream(emit, [list(left), list(right)], channels=2, ch_code=ch_code))
    assert info.channels == 2
    np.testing.assert_array_equal(ints[:, 0], left)
    np.testing.assert_array_equal(ints[:, 1], right)


# ---------------------------------------------------------------- C++ parity
def _native_decode_one(buf, stride):
    out, frames, rates = native.decode_batch_mono([buf], stride)
    return out[0], int(frames[0]), int(rates[0])


@pytest.mark.skipif(not native.available(), reason="native decoder not built")
def test_native_matches_python_oracle():
    for seed, bits, channels, blocksize in [(0, 16, 1, 1024), (1, 24, 2, 512), (2, 8, 2, 4096)]:
        x = _sig(9000, seed=seed)
        if channels == 2:
            x = np.stack([x, -0.25 * x], axis=1)
        buf = write_flac(None, x, 16000, bits=bits, blocksize=blocksize)
        ints, info = decode_int(buf)
        mono64 = ints.astype(np.float64).mean(axis=1) / float(1 << (bits - 1))
        got, n, rate = _native_decode_one(buf, 9216)
        assert (n, rate) == (9000, 16000)
        # C++ downmix averages in f32 exactly like the WAV lane; compare to
        # the same arithmetic (f32 sum * inv_ch)
        scale = np.float32(1.0 / (1 << (bits - 1)))
        acc = np.zeros(9000, np.float32)
        for c in range(info.channels):
            acc += ints[:, c].astype(np.float32)
        want = acc * scale * np.float32(1.0 / info.channels)
        np.testing.assert_array_equal(got[:9000], want)
        assert not got[9000:].any()


@pytest.mark.skipif(not native.available(), reason="native decoder not built")
def test_native_handbuilt_streams():
    """The C++ decoder handles LPC/rice2/wasted-bit streams the Python
    encoder never emits (same hand-built fixtures as the oracle tests)."""
    rng = np.random.default_rng(3)
    n, order, shift = 512, 2, 5
    coef = [45, -19]
    s = list((rng.integers(-2000, 2000, n)).astype(int))

    def emit(bw):
        bw.write(0, 1)
        bw.write(32 + order - 1, 6)
        bw.write(0, 1)
        for v in s[:order]:
            bw.write(v, 16)
        bw.write(14, 4)
        bw.write(shift, 5)
        for c in coef:
            bw.write(c, 15)
        bw.write(0, 2)
        bw.write(0, 4)
        bw.write(14, 4)
        for i in range(order, n):
            pred = (coef[0] * s[i - 1] + coef[1] * s[i - 2]) >> shift
            r = s[i] - pred
            z = (r << 1) ^ (r >> 63) if r < 0 else r << 1
            bw.write_unary(z >> 14)
            bw.write(z, 14)

    buf = _stream(emit, s)
    got, nf, rate = _native_decode_one(buf, 512)
    assert (nf, rate) == (512, 16000)
    np.testing.assert_array_equal(got, (np.asarray(s, np.float32) / 32768.0))


# ------------------------------------------------------------------- loader
def test_loader_mixed_wav_flac_batch(tmp_path):
    from audioflow_tpu.io import write_wav

    x1 = _sig(4000, seed=7)
    x2 = _sig(5000, seed=8)
    write_wav(tmp_path / "a.wav", x1, 16000)
    write_flac(tmp_path / "b.flac", x2, 16000)
    (tmp_path / "c.flac").write_bytes(b"fLaC garbage")
    for use_native in ([True, False] if native.available() else [False]):
        batch = decode_batch(
            [tmp_path / "a.wav", tmp_path / "b.flac", tmp_path / "c.flac"],
            use_native=use_native,
        )
        assert list(batch.valid) == [True, True, False]
        assert list(batch.lengths) == [4000, 5000, 0]
        assert list(batch.rates) == [16000, 16000, 0]
        q1 = np.clip(np.round(x1 * 32768), -32768, 32767).astype(np.float32) / 32768.0
        np.testing.assert_allclose(batch.samples[0, :4000], q1, atol=2e-4)
        q2 = np.clip(np.round(x2 * 32768), -32768, 32767).astype(np.float32) / 32768.0
        np.testing.assert_array_equal(batch.samples[1, :5000], q2)


def test_read_audio_dispatch(tmp_path):
    x = _sig(3000)
    write_flac(tmp_path / "f.flac", x, 22050)
    y, sr = read_audio(tmp_path / "f.flac")
    assert sr == 22050 and y.shape == (3000,)
    from audioflow_tpu.io import write_wav

    write_wav(tmp_path / "w.wav", x, 8000)
    y2, sr2 = read_audio(tmp_path / "w.wav")
    assert sr2 == 8000 and y2.shape == (3000,)
