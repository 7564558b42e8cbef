"""Benchmark harness: the five BASELINE.md configs, measured in
audio-seconds/sec/chip (the north-star metric)."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .models import log_mel_frontend, master_chain_graph, stft_magnitude_graph
from .obs import measure_throughput
from .ops import time_stretch


def _tone_batch(batch: int, seconds: float, rate: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * rate), dtype=np.float32) / rate
    freqs = rng.uniform(80, 4000, batch).astype(np.float32)
    x = 0.3 * np.sin(2 * np.pi * freqs[:, None] * t[None, :])
    x += 0.05 * rng.standard_normal((batch, t.size)).astype(np.float32)
    return x.astype(np.float32)


# iters=10 everywhere: the tunnel charges a fixed ~22-25 ms post-scan
# scalar-readback latency per measured loop call; at 4 iterations that tax
# inflated per-iter times by 25-40% on the fast configs (config 2 measured
# 21.1 ms/iter at iters=4 vs 15.4 ms at iters=10 — identical program).
def _measure(graph_fn, x, audio_seconds, iters=10, sharded=False):
    if sharded:
        from .parallel import compile_sharded, make_mesh, shard_batch

        mesh = make_mesh()
        x = shard_batch(np.asarray(x), mesh)
        fn = compile_sharded(graph_fn, mesh)
        n_dev = mesh.devices.size
    else:
        # Graph.compile auto-chunks long signals (scan over cache-sized
        # chunks, ~30% on TPU); callables are jitted directly
        fn = graph_fn.compile() if hasattr(graph_fn, "compile") else jax.jit(graph_fn)
        x = jnp.asarray(x)
        n_dev = 1
    m = measure_throughput(fn, x, audio_seconds, iters=iters)
    m.n_devices = n_dev
    return m


def run_benchmark(name: str = "logmel", batch: int = 0, seconds: float = 10.0, sharded: bool = False) -> dict:
    """Run one named benchmark; returns a JSON-ready dict."""
    if name in ("stft", "config1"):
        batch = batch or 64
        rate = 16000
        x = _tone_batch(batch, seconds, rate)
        g = stft_magnitude_graph(rate, 1024, 256)
        m = _measure(g, x, batch * seconds, sharded=sharded)
    elif name in ("logmel", "config2"):
        batch = batch or 256
        rate = 44100
        x = _tone_batch(batch, seconds, rate)
        g = log_mel_frontend(rate, 16000, 1024, 256, 128)
        m = _measure(g, x, batch * seconds, sharded=sharded)
    elif name == "logmel_stream":
        # the headline: same decode->resample->log-mel computation, run in
        # the framework's chunked-scan streaming mode — ~30% faster than the
        # offline whole-array program (smaller HBM working set per step)
        batch = batch or 512
        rate = 44100
        g = log_mel_frontend(rate, 16000, 1024, 256, 128, center=False)
        gran = g.chunk_granularity()
        chunk = gran * max(1, 16384 // gran)
        x = _tone_batch(batch, seconds, rate)
        t = x.shape[-1] // chunk * chunk
        x = jnp.asarray(x[:, :t])
        fn = jax.jit(lambda b: g.scan_stream(b, chunk))
        m = measure_throughput(fn, x, batch * t / rate, iters=10)
    elif name in ("master", "eq", "config3"):
        batch = batch or 64
        rate = 16000
        x = _tone_batch(batch, seconds, rate)
        g = master_chain_graph(rate)
        m = _measure(g, x, batch * seconds, sharded=sharded)
    elif name in ("pvoc", "config4"):
        batch = batch or 64
        rate = 16000
        x = _tone_batch(batch, seconds, rate)
        fn = lambda z: time_stretch(z, 1.25, 1024, 256)  # noqa: E731
        # iters=10: the fused kernel runs ~26 ms/iter at batch 256, so the
        # tunnel's fixed ~25 ms post-scan scalar-readback latency inflates a
        # 4-iter measurement by ~24% (measured 81k vs 100k x) — amortize it
        m = _measure(fn, x, batch * seconds, iters=10, sharded=False)
    elif name == "pitch":
        # the other half of config 4's definition ("time-stretch/pitch-shift
        # with ISTFT round-trip"): fused Pallas stretch + polyphase resample.
        # +12 semitones (stretch rate exactly 1/2) so the fused kernel path
        # is what gets measured: the kernel requires an exact small-rational
        # rate (denominator <= 12), so irrational 2^(k/12) rates route via
        # the XLA matmul path instead (its cost is the config-4 XLA row).
        from .ops import pitch_shift

        batch = batch or 64
        rate = 16000
        x = _tone_batch(batch, seconds, rate)
        fn = lambda z: pitch_shift(z, 12.0, rate, 1024, 256)  # noqa: E731
        m = _measure(fn, x, batch * seconds, iters=10, sharded=False)
    elif name in ("streaming", "config5"):
        from .graph import chain as _chain
        from .models import eq_bands_default
        from .graph import BiquadChain, MelProject, Resample, Spectrogram

        batch = batch or 256
        rate = 44100
        x = _tone_batch(batch, seconds, rate)
        g = _chain(
            Resample(rate, 16000, "kaiser"),
            BiquadChain(eq_bands_default(16000.0)),
            Spectrogram(1024, 256, center=False),
            MelProject(n_mels=128),
            input_rate=rate,
        )
        gran = g.chunk_granularity()
        t = x.shape[-1] // gran * gran
        x = x[:, :t]
        chunk = gran * max(1, 16384 // gran)
        t = t // chunk * chunk
        x = x[:, :t]
        fn = jax.jit(lambda b: g.scan_stream(b, chunk))
        if sharded:
            from .parallel import batch_sharding, make_mesh, shard_batch

            mesh = make_mesh()
            xs = shard_batch(x, mesh)
            fn = jax.jit(lambda b: g.scan_stream(b, chunk), in_shardings=(batch_sharding(mesh, 2),))
            m = measure_throughput(fn, xs, batch * t / rate, iters=10)
            m.n_devices = mesh.devices.size
        else:
            m = measure_throughput(fn, jnp.asarray(x), batch * t / rate, iters=10)
    elif name in ("session", "session_drain"):
        # live push-path throughput: StreamSession's device-ring + lazy
        # results, one host dispatch chain per chunk. Dominated by this
        # runtime's ~2 ms/dispatch-segment charge, so the number is a
        # LATENCY-mode figure, not the batch headline (that's "streaming").
        import time as _time

        from .session import StreamSession

        batch = batch or 64
        rate = 44100
        g = log_mel_frontend(rate, 16000, 1024, 256, 128)
        gran = g.chunk_granularity()
        chunk = gran * max(1, 16384 // gran)
        x = _tone_batch(batch, seconds, rate)
        # session_drain: producer outpaces the consumer — push 8-chunk blocks
        # so the bucketed lax.scan multi-step drains 8 chunks per dispatch
        # (ROADMAP 4b; per-chunk Result semantics preserved)
        block = 8 * chunk if name == "session_drain" else chunk
        cap = 17 * chunk if name == "session_drain" else None
        n = x.shape[-1] // block * block
        sess = StreamSession(
            g, chunk_in=chunk, lead_shape=(batch,), ring_capacity=cap
        ).open()
        sess.push(x[:, :block])  # compile + warm
        sess.poll_all()
        t0 = _time.perf_counter()
        for i in range(block, n, block):
            sess.push(x[:, i : i + block])
        last = sess.poll_all()[-1]
        np.asarray(last.data).sum()  # materialize the final chunk = sync
        wall = _time.perf_counter() - t0
        sess.close()
        audio = batch * (n - block) / rate
        from .obs.metrics import RunMetrics

        m = RunMetrics(
            audio_seconds=audio, wall_seconds=wall, batches=(n - block) // chunk,
        )
    else:
        raise ValueError(f"unknown benchmark {name!r}")
    out = m.to_dict()
    out.update({"benchmark": name, "batch": batch, "clip_seconds": seconds})
    return out
