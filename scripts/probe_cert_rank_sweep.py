"""On-chip certificate-noise rank sweep at the w2 config (round-4 verdict
item 3: close compiled pq_rel_std toward the flex 8.1e-4 class).

With the deterministic exact-SVD emits active everywhere at chi=8 (all w2
step matrices fit `_EXACT_EMIT_LIMIT`), the residual p/q spread is
TRUNCATION, not sketch noise — and the committed config (norm rank 10,
factored proj 12) is under-ranked against the flex pipeline it is compared
to (norm rank 10 FITTING + projected rank 40 single-layer,
`bench.bench_workload2_flex`).  This sweeps the two rank knobs upward:

    A  norm 10, factored r16, pi3   (proj-rank axis)
    B  norm 10, factored r24, pi3   (proj-rank axis, further)
    C  norm 16, factored r24, pi3   (norm-rank axis on top)

Each config is one fresh XLA program (~400-600 s remote compile, cached
persistently).  Results -> scripts/probe_cert_rank_sweep_results.json.

Run: timeout -k 30 3000 python scripts/probe_cert_rank_sweep.py
"""

import json
import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import numpy as np

import bench  # noqa: E402


def main():
    import jax.numpy as jnp

    import tnqs
    from tnqs.bmps_engine import BMPSEngine, BMPSSampler
    from tnqs.engine import LatticeEngine
    from tnqs.models import heavy_hex_kicked_ising_layer

    bench.acquire_tpu_lock(max_wait_s=600.0)
    bench.wait_for_tpu(max_wait_s=900.0)

    g = tnqs.eagle_lattice()
    layer = heavy_hex_kicked_ising_layer(g, float(np.pi / 4), 0.4)
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)
    eng = LatticeEngine(psi, chi=8, dtype=jnp.complex64)
    step = eng.make_step(layer, cutoff=1e-12, bp_maxiter=25)
    T, M = eng.T, eng.M
    for _ in range(20):
        T, M, _ = step(T, M)
    eng.T, eng.M = T, M
    print("## evolve done", flush=True)

    results = []
    for name, nrank, prank in (
        ("A norm10 r16", 10, 16),
        ("B norm10 r24", 10, 24),
        ("C norm16 r24", 16, 24),
    ):
        t0 = time.time()
        try:
            be = BMPSEngine(eng, rank=nrank, oversample=8, power_iters=3)
            sam = BMPSSampler(be, proj_rank=prank, q_mode="factored")
            cert = sam.sample_directly_certified(50, seed=0, chunk=10)
            pq = np.array([c["poverq"] for c in cert])
            row = dict(
                config=name, norm_rank=nrank, proj_rank=prank,
                pq_mean=round(float(pq.mean()), 5),
                pq_rel_std=float(pq.std() / pq.mean()),
                pq_min=float(pq.min()),
                total_s=round(time.time() - t0, 1),
            )
        except Exception as e:  # vmem OOM at high rank: record and continue
            row = dict(config=name, norm_rank=nrank, proj_rank=prank,
                       error=repr(e)[:300], total_s=round(time.time() - t0, 1))
        results.append(row)
        print(f"## {row}", flush=True)

    out = ROOT / "scripts" / "probe_cert_rank_sweep_results.json"
    out.write_text(json.dumps(
        {"workload": "w2 Eagle-127 chi=8 20 layers, 50 samples, chunk 10",
         "baseline": {"config": "committed norm10 r12 pi3",
                      "pq_rel_std": 3.97e-2, "pq_mean": 0.9907,
                      "source": "/tmp/probe_w2_r5.out 2026-08-19"},
         "flex_reference": {"pq_rel_std": 8.1e-4,
                            "config": "norm10 fitting + proj40"},
         "rows": results}, indent=1))
    print(f"## wrote {out}", flush=True)


if __name__ == "__main__":
    main()
