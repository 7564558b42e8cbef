"""Round-5 dated headline sweep: every BENCHMARKS.md headline config at
iters=10 with roofline calibration, the bench.py headline metric, and the
end-of-round record discipline (VERDICT r4 items 4 + 7 — raw rows live in
the COMMITTED bench_records/, not /tmp).

Run WITH the axon sitecustomize: PYTHONPATH=/root/repo:/root/.axon_site.
"""

import json
import time

OUT = open("/root/repo/bench_records/chip_r5_sweep.jsonl", "a", buffering=1)


def emit(**kw):
    kw["t"] = round(time.time(), 1)
    OUT.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


import numpy as np  # noqa: F401

import jax

emit(stage="backend", backend=jax.default_backend(), date="2026-08-21", round=5)

from audioflow_tpu.bench import run_benchmark

ROWS = [
    ("roofline", {}),
    ("stft", {"batch": 64}),
    ("stft", {"batch": 512}),
    ("logmel", {"batch": 256}),
    ("master", {"batch": 64}),
    ("master", {"batch": 512}),
    ("pvoc", {"batch": 256}),
    ("pitch", {"batch": 64}),
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
    except Exception as e:  # keep sweeping; record the failure
        emit(stage=name, error=repr(e), **kw)

emit(stage="done")
