"""Chip batch r3/1: where do YIN's 60 ms go, and does a matmul-DFT
autocorrelation beat XLA's FFT?

Stages of ops/pitch.py::yin (batch 64 x 10 s @16 kHz, fmin 65 / fmax 1000,
frame 2048, hop 256 — the BENCHMARKS.md row config):
  frame -> cmnd (2x rfft + product + irfft + cumsum norm) -> trough/parabolic

Knockouts: full yin, frames-only, fft-product-only, cmnd-only. Then a
matmul-ACF variant: rfft/irfft as real cos|sin MXU banks (the spectrogram
lesson — XLA's TPU FFT is the suspected bottleneck), at precisions
default/high, checked for f0 agreement against the shipped path.

Writes JSON lines to /tmp/chip_r3_yin.jsonl. Single-process (the chip is
claimed per process).
"""
import json
import time

import numpy as np

OUT = open("/tmp/chip_r3_yin.jsonl", "a", buffering=1)


def emit(**kw):
    kw["t"] = round(time.time(), 1)
    OUT.write(json.dumps(kw) + "\n")
    print(kw, flush=True)


import jax
import jax.numpy as jnp

emit(stage="backend", backend=jax.default_backend())

from audioflow_tpu import ops
from audioflow_tpu.obs.metrics import measure_throughput
from audioflow_tpu.ops._mm import mm
from audioflow_tpu.ops.framing import frame
from audioflow_tpu.ops.pitch import cmnd_frames, yin_frames

rng = np.random.default_rng(0)
B, SECS, SR = 64, 10.0, 16000
FMIN, FMAX, FRAME, HOP = 65.0, 1000.0, 2048, 256
audio_s = B * SECS

# voiced-ish test signal: chirp + noise
t = np.arange(int(SR * SECS)) / SR
x = (0.4 * np.sin(2 * np.pi * (110 + 80 * np.sin(2 * np.pi * 0.3 * t)) * t)
     + 0.02 * rng.standard_normal(t.shape)).astype(np.float32)
x = jnp.asarray(np.broadcast_to(x, (B, x.shape[0])).copy())

W = FRAME // 2  # 1024
TAU_HI = int(np.ceil(SR / FMIN))  # 247
T_MAX = min(TAU_HI + 1, W)  # 248


def bench(name, fn, arg, extra=None):
    t0 = time.time()
    out0 = jax.block_until_ready(jax.jit(fn)(arg))
    compile_s = time.time() - t0
    m = measure_throughput(jax.jit(fn), arg, audio_s, iters=10)
    kw = dict(stage=name, ms=round(1000 * m.wall_seconds / m.batches, 2),
              x_rt=round(m.realtime_factor), compile_s=round(compile_s, 1))
    if extra:
        kw.update(extra)
    emit(**kw)
    return out0


# ---- 1. full yin (shipped) ----
def yin_full(z):
    return ops.yin(z, SR, fmin=FMIN, fmax=FMAX, frame_length=FRAME, hop=HOP)

ref_f0 = np.asarray(bench("yin_full_fft", yin_full, x))

# ---- 2. framing only ----
def frames_of(z):
    pads = [(0, 0)] * (z.ndim - 1) + [(FRAME // 2, FRAME // 2)]
    return frame(jnp.pad(z, pads, mode="reflect"), FRAME, HOP)

bench("frames_only", lambda z: frames_of(z).sum(), x)

# ---- 3. fft product only (the acf inner core) ----
def fft_only(z):
    fr = frames_of(z)[..., : W + T_MAX]
    n = 1 << (W + 2 * T_MAX).bit_length()
    sf = jnp.fft.rfft(fr, n=n, axis=-1)
    sw = jnp.fft.rfft(fr[..., :W], n=n, axis=-1)
    acf = jnp.fft.irfft(sf * jnp.conj(sw), n=n, axis=-1)[..., : T_MAX + 1]
    return acf.sum()

bench("fft_acf_only", fft_only, x)

# ---- 4. cmnd only ----
bench("cmnd_only", lambda z: cmnd_frames(frames_of(z), W, T_MAX).sum(), x)


# ---- 5. matmul-ACF cmnd + full yin on top ----
def _banks(precision_dtype=np.float32):
    m = W + T_MAX
    n = 1 << (W + 2 * T_MAX).bit_length()
    K = n // 2 + 1
    j = np.arange(m, dtype=np.float64)[:, None]
    k = np.arange(K, dtype=np.float64)[None, :]
    ang = 2 * np.pi * j * k / n
    fullb = np.concatenate([np.cos(ang), -np.sin(ang)], axis=1)  # [m, 2K] Re|Im
    tau = np.arange(T_MAX + 1, dtype=np.float64)[None, :]
    wk = np.full((K, 1), 2.0)
    wk[0, 0] = 1.0
    wk[-1, 0] = 1.0  # n even -> Nyquist bin unpaired
    angi = 2 * np.pi * np.arange(K, dtype=np.float64)[:, None] * tau / n
    ci = np.concatenate([wk * np.cos(angi) / n, -wk * np.sin(angi) / n], axis=0)  # [2K, T+1]
    return (jnp.asarray(fullb.astype(precision_dtype)),
            jnp.asarray(ci.astype(precision_dtype)), K)


FULLB, CI, K = _banks()


def cmnd_matmul(fr, precision):
    m = W + T_MAX
    fr = fr[..., :m]
    F = mm(fr, FULLB, precision)                       # [..., 2K]
    Wv = mm(fr[..., :W], FULLB[:W], precision)
    ReF, ImF = F[..., :K], F[..., K:]
    ReW, ImW = Wv[..., :K], Wv[..., K:]
    prod = jnp.concatenate(
        [ReF * ReW + ImF * ImW, ImF * ReW - ReF * ImW], axis=-1)
    acf = mm(prod, CI, precision)                       # [..., T+1]
    sq = fr * fr
    cs = jnp.cumsum(sq, axis=-1)
    cs = jnp.concatenate([jnp.zeros_like(cs[..., :1]), cs], axis=-1)
    e0 = cs[..., W : W + 1]
    e_tau = cs[..., W : W + T_MAX + 1] - cs[..., 0 : T_MAX + 1]
    d = jnp.maximum(e0 + e_tau - 2.0 * acf, 0.0)
    csd = jnp.cumsum(d[..., 1:], axis=-1)
    tau = jnp.arange(1, T_MAX + 1, dtype=fr.dtype)
    dn = jnp.where(csd > 0, d[..., 1:] * tau / jnp.maximum(csd, 1e-30), 1.0)
    return jnp.concatenate([jnp.ones_like(d[..., :1]), dn], axis=-1)


def yin_matmul(z, precision):
    import audioflow_tpu.ops.pitch as P
    fr = frames_of(z)
    # inline yin_frames with the matmul cmnd
    tau_lo = max(int(np.floor(SR / FMAX)), 2)
    tau_hi = min(int(np.ceil(SR / FMIN)), W - 1)
    dn = cmnd_matmul(fr, precision)
    lags = jnp.arange(dn.shape[-1])
    in_range = (lags >= tau_lo) & (lags <= tau_hi)
    prev = jnp.concatenate([dn[..., :1], dn[..., :-1]], axis=-1)
    nxt = jnp.concatenate([dn[..., 1:], dn[..., -1:]], axis=-1)
    trough = (dn < prev) & (dn <= nxt) & (dn < 0.1) & in_range
    has_trough = trough.any(axis=-1)
    first_trough = jnp.argmax(trough, axis=-1)
    big = jnp.asarray(jnp.finfo(dn.dtype).max, dn.dtype)
    global_min = jnp.argmin(jnp.where(in_range, dn, big), axis=-1)
    tau_star = jnp.where(has_trough, first_trough, global_min)

    def at(idx):
        return jnp.take_along_axis(dn, idx[..., None], axis=-1)[..., 0]

    d0 = at(tau_star)
    dm = at(jnp.maximum(tau_star - 1, 0))
    dp = at(jnp.minimum(tau_star + 1, dn.shape[-1] - 1))
    denom = dm - 2.0 * d0 + dp
    delta = jnp.where(jnp.abs(denom) > 1e-12,
                      0.5 * (dm - dp) / jnp.where(denom == 0, 1.0, denom), 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    return SR / jnp.maximum(tau_star.astype(dn.dtype) + delta, 1.0)


for prec in ["high", "default"]:
    f0 = np.asarray(bench(f"yin_matmul_{prec}", lambda z, p=prec: yin_matmul(z, p), x))
    diff = np.abs(f0 - ref_f0)
    emit(stage=f"yin_matmul_{prec}_agree", max_hz=float(diff.max()),
         p99_hz=float(np.percentile(diff, 99)),
         frac_gt_1hz=float((diff > 1.0).mean()))

# ---- griffin-lim inner-precision ladder (batch 64 x 10 s mags, 8 iters) ----
mag = jnp.asarray(np.abs(np.asarray(
    ops.spectrogram(x, 1024, 256, center=True, power=False))))
mag_np = np.asarray(mag, dtype=np.float64)


def gl_err(y):
    got = np.asarray(ops.magnitude(ops.stft(jnp.asarray(y), 1024, 256, center=True)))
    f = min(got.shape[-2], mag_np.shape[-2])
    return float(np.linalg.norm(got[..., :f, :] - mag_np[..., :f, :])
                 / np.linalg.norm(mag_np))

for prec in ["high", "default"]:
    y = bench(f"griffinlim_{prec}",
              lambda mz, p=prec: ops.griffin_lim(mz, 1024, 256, n_iter=8, precision=p),
              mag)
    emit(stage=f"griffinlim_{prec}_quality", spectral_err=round(gl_err(np.asarray(y)), 5))

emit(stage="done")
