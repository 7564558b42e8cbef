"""Chip batch r3/3: the dated round-3 headline sweep (VERDICT r2 items 5+7).

One process, one consistent code state: the roofline calibration row plus
every BENCHMARKS.md headline config re-measured at iters=10 WITH the new
XLA cost-analysis columns (flops, bytes accessed, achieved TFLOP/s + GB/s)
— the utilization audit — and the session latency mode (p50/p99 ms/chunk).
Includes the config-5 1024-file row that was still carrying the iters=4
readback tax (BENCHMARKS.md:22). Writes JSON lines to
/tmp/chip_r3_rooflinesweep.jsonl.
"""
import json
import time

OUT = open("/tmp/chip_r3_rooflinesweep.jsonl", "a", buffering=1)


def emit(**kw):
    kw["t"] = round(time.time(), 1)
    OUT.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


import jax

emit(stage="backend", backend=jax.default_backend())

from audioflow_tpu.bench import run_benchmark

ROWS = [
    ("roofline", {}),
    ("stft", {"batch": 64}),
    ("stft", {"batch": 512}),
    ("logmel", {"batch": 256}),
    ("master", {"batch": 64}),
    ("master", {"batch": 512}),
    ("pvoc", {"batch": 256}),
    ("streaming", {"batch": 256}),
    ("streaming", {"batch": 1024}),
    ("logmel_stream", {"batch": 512}),
    ("session", {}),
    ("session_drain", {}),
]

for name, kw in ROWS:
    t0 = time.time()
    try:
        out = run_benchmark(name, **kw)
        out["sweep_wall_s"] = round(time.time() - t0, 1)
        emit(**out)
    except Exception as e:  # keep the sweep going; record the failure
        emit(stage=name, error=repr(e), **kw)

emit(stage="done")
