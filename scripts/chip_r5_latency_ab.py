"""Round-5 session-latency A/B (VERDICT r4 item 3).

Round 4 measured session p50/p99 = 102.6/124.0 ms vs round 3's 47/68 ms and
attributed the 2x swing to tunnel variance WITHOUT evidence. This script
settles it: ONE process, same chip, same hour — alternate `bench session`
between the round-3 code state (git worktree of a2378c9 at /tmp/r3repo)
and the current tree, three interleaved repeats each. Module trees are
swapped by purging sys.modules between imports (pure-Python package; the
JAX backend persists across swaps, which is the point — identical runtime,
only the session/dispatch code differs).

Writes JSON lines to bench_records/chip_r5_latency_ab.jsonl (committed —
VERDICT r4 item 4's artifact discipline).
Run WITH the axon sitecustomize: PYTHONPATH=/root/.axon_site (repo paths
are managed inside).
"""

import importlib
import json
import os
import sys
import time

R3 = "/tmp/r3repo"
CUR = "/root/repo"
OUT_PATH = os.path.join(CUR, "bench_records", "chip_r5_latency_ab.jsonl")
os.makedirs(os.path.dirname(OUT_PATH), exist_ok=True)
OUT = open(OUT_PATH, "a", buffering=1)


def emit(**kw):
    kw["t"] = round(time.time(), 1)
    OUT.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def run_session(tree: str, label: str, repeat: int):
    for m in [m for m in sys.modules if m.split(".")[0] == "audioflow_tpu"]:
        del sys.modules[m]
    sys.path.insert(0, tree)
    try:
        bench = importlib.import_module("audioflow_tpu.bench")
        t0 = time.time()
        row = bench.run_benchmark("session", cost=False)
        row.update(state=label, repeat=repeat, run_s=round(time.time() - t0, 1))
        emit(**row)
        return row
    finally:
        sys.path.remove(tree)


def main():
    import jax

    emit(stage="backend", backend=jax.default_backend())
    rows = []
    for rep in range(3):  # interleaved: r3, current, r3, current, ...
        rows.append(run_session(R3, "r3_a2378c9", rep))
        rows.append(run_session(CUR, "r5_current", rep))
    for label in ("r3_a2378c9", "r5_current"):
        p50s = [r["latency_ms_p50"] for r in rows if r["state"] == label]
        p99s = [r["latency_ms_p99"] for r in rows if r["state"] == label]
        emit(stage="summary", state=label,
             p50_ms=[round(v, 1) for v in p50s],
             p99_ms=[round(v, 1) for v in p99s],
             p50_spread=round(max(p50s) - min(p50s), 1))


if __name__ == "__main__":
    main()
