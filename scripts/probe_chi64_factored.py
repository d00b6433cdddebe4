"""On-chip probe: factored-q certified sampling at the flagship chi=64.

The round-4 diagnosis (`diag_chi64_cert.py`) showed the doubled-boundary
sampler at proj_rank=16 produces finite but collapsed certificates
(p/q ~ 1e-5..1e-14): a rank-16 randomized sketch over the 4096-dim
doubled cut bonds cannot represent the projected boundary.  The factored
mode zips the SINGLE-layer projected boundary (chi-dim bonds) instead —
rank r carries doubled-r^2 information and the sketch operates in a
chi-dim ambient space where it is well conditioned.

Sweeps factored ranks (and one doubled control) at a few samples each,
printing p/q statistics + per-sample seconds.

Run: python scripts/probe_chi64_factored.py   (holds the TPU lock)
"""

import json
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import bench


def main():
    bench.acquire_tpu_lock()
    bench.wait_for_tpu()
    g, layer, chi = bench.build_workload()
    t0 = time.time()
    _, compile_s, eng = bench.bench_engine(g, layer, chi, steps=20)
    print(f"evolved 20 layers in {time.time() - t0:.1f}s (compile {compile_s:.1f}s)", flush=True)

    from tnqs.bmps_engine import BMPSEngine, BMPSSampler

    nsamp = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rows = []
    for q_mode, proj, chunk in [
        ("factored", 4, 2),
        ("factored", 6, 2),
        ("doubled", 16, 2),
    ]:
        try:
            sam = BMPSSampler(
                BMPSEngine(eng, rank=8), proj_rank=proj, q_mode=q_mode
            )
            t0 = time.time()
            cert = sam.sample_directly_certified(nsamp, seed=0, chunk=chunk)
            t_cold = time.time() - t0
            t0 = time.time()
            cert = sam.sample_directly_certified(nsamp, seed=1, chunk=chunk)
            t_warm = time.time() - t0
            pq = np.array([c["poverq"] for c in cert])
            row = dict(
                q_mode=q_mode, proj=proj, chunk=chunk, nsamp=nsamp,
                pq_mean=float(pq.mean()),
                pq_rel_std=float(pq.std() / pq.mean()) if pq.mean() else None,
                pq_min=float(pq.min()), pq_max=float(pq.max()),
                s_per_sample=round(t_warm / nsamp, 2),
                cold_s=round(t_cold, 1),
            )
            rows.append(row)
            print(json.dumps(row), flush=True)
        except Exception as e:
            print(f"# {q_mode} proj={proj}: FAILED {e!r}", flush=True)
    out = ROOT / "scripts" / "probe_chi64_factored_results.json"
    out.write_text(json.dumps(rows, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
