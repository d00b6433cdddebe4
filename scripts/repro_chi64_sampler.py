"""Reproduce / fix the chi=64 certified-sampler remote-compile SIGKILL
(round-4 bench run 1: `tpu_compile_helper subprocess exit signal SIGKILL`
while compiling the 2-sample projected-sweep group at chi=64, proj 16).

Evolves the flagship state (compiles are persistent-cached), then tries
sampler configurations smallest-program-first, reporting which compile.

Run: python scripts/repro_chi64_sampler.py  (holds the TPU lock)
"""

import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import bench


def main():
    bench.acquire_tpu_lock()
    bench.wait_for_tpu(600)
    g, layer, chi = bench.build_workload()
    t0 = time.time()
    _, compile_s, eng = bench.bench_engine(g, layer, chi, steps=20)
    print(f"evolved 20 layers in {time.time() - t0:.1f}s (compile {compile_s:.1f}s)", flush=True)

    from tnqs.bmps_engine import BMPSEngine, BMPSSampler

    for chunk, proj in [(1, 16), (2, 16), (1, 24)]:
        try:
            t0 = time.time()
            sam = BMPSSampler(BMPSEngine(eng, rank=8), proj_rank=proj)
            cert = sam.sample_directly_certified(4, seed=0, chunk=chunk)
            pq = np.array([c["poverq"] for c in cert])
            print(
                f"chunk={chunk} proj={proj}: OK in {time.time() - t0:.1f}s, "
                f"p/q mean {pq.mean():.4f}",
                flush=True,
            )
        except Exception as e:
            print(f"chunk={chunk} proj={proj}: FAILED {e!r}", flush=True)


if __name__ == "__main__":
    main()
