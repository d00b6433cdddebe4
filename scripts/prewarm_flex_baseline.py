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

    # mirror bench.py:main's condition: BOTH values must be present or it
    # re-measures anyway
    if "layers_per_sec" not in cached or "julia_bound_lps" not in cached:
        print("measuring flex baseline (interpreted, saturated bonds)...")
        flex_lps = bench.bench_flex(g, layer, chi)
        julia_lps = bench.julia_bound_lps(g, layer, chi, flex_lps)
        cached.update(
            chi=chi, nv=g.nv(), host=host,
            layers_per_sec=flex_lps, julia_bound_lps=julia_lps,
        )
        bench.CACHE.write_text(json.dumps(cached))
        print(f"flex {flex_lps:.4f} layers/s, julia bound {julia_lps:.4f}")
    else:
        print("flex baseline already cached")

    if "pq_rel_std" not in cached.get("w2_flex", {}):
        print("measuring workload-2 flex pipeline...")
        cached["w2_flex"] = bench.bench_workload2_flex(None)
        cached.update(chi=chi, nv=g.nv(), host=host)
        bench.CACHE.write_text(json.dumps(cached))
        print("w2_flex:", {k: round(v, 4) for k, v in cached["w2_flex"].items()})
    else:
        print("w2_flex already cached")


if __name__ == "__main__":
    main()
