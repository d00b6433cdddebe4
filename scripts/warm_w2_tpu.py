"""Warm + validate the bench w2 engine stage on the real TPU, standalone.

Runs `bench.bench_workload2_engine()` (Eagle-127, chi=8, BMPS rank-10
expect, 50 factored-q certified samples — the reference's own
`examples/heavyhexIsing_dynamics.jl` config) under the shared TPU lock,
WITHOUT touching `.bench_flex_baseline.json`.  Purpose: (a) populate the
persistent XLA compile cache so the driver's full bench pays no w2
compiles, (b) capture on-chip evidence for the round-3 verdict items 3/4
(certification noise, w2 cross-tier <Z> gap) after the factored-q +
deterministic-exact-SVD mitigations.

Usage: timeout 1500 python scripts/warm_w2_tpu.py
"""

import json
import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import bench  # noqa: E402


def main():
    bench.acquire_tpu_lock(max_wait_s=600.0)
    bench.wait_for_tpu(max_wait_s=900.0)
    t0 = time.time()
    w2 = bench.bench_workload2_engine()
    w2["total_s"] = round(time.time() - t0, 1)
    print(json.dumps(w2), flush=True)


if __name__ == "__main__":
    main()
