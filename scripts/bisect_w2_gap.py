"""Bisect the workload-2 cross-tier <Z> gap (round-3 verdict weak #2).

The bench's chi=8/20-layer pipeline printed engine <Z>(11,5)=0.8562 vs flex
0.8530 — a 3.2e-3 gap.  The committed f32 control
(`tests/golden/golden_f32_controls.json` "w2") measures the flex f32-vs-f64
spread of the same trajectory at ~7e-6, so precision does NOT explain the
gap: it is engine-side, either in evolution (factorization path / BP
schedule / kernel) or in the compiled BMPS measurement sketch.

This script walks the engine's config axes one at a time on CPU (where the
flex oracle ran) and records, for each variant, the BP <Z> trajectory
endpoint AND the compiled BMPS rank-10 value — separating evolution error
from measurement error.  Axes:

  dtype          complex128 -> complex64
  factor_method  direct -> gram           (gram squares the condition number)
  bp_schedule    wavefront -> color
  bp_kernel      xla (pallas is TPU-only; `interpret` is checked separately
                 in tests)
  bp_maxiter     25 -> 50                 (BP convergence sensitivity)

Run on CPU:  PALLAS_AXON_POOL_IPS= python scripts/bisect_w2_gap.py
"""

import json
import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

import tnqs
from tnqs.bmps_engine import BMPSEngine
from tnqs.engine import LatticeEngine
from tnqs.models import heavy_hex_kicked_ising_layer

GOLDEN = ROOT / "tests" / "golden"
CENTER = (7, 8)
BENCH_V = (11, 5)

VARIANTS = [
    # tag, dtype, factor_method, bp_schedule, bp_maxiter
    ("c128 direct wavefront", jnp.complex128, "direct", "wavefront", 25),
    ("c64  direct wavefront", jnp.complex64, "direct", "wavefront", 25),
    ("c64  gram   wavefront", jnp.complex64, "gram", "wavefront", 25),
    ("c64  gram   color    ", jnp.complex64, "gram", "color", 25),
    ("c64  gram   color i50", jnp.complex64, "gram", "color", 50),
]


def run_variant(tag, dtype, factor_method, bp_schedule, bp_maxiter, layers=20):
    g = tnqs.eagle_lattice()
    layer = heavy_hex_kicked_ising_layer(g, float(np.pi / 4), 0.4)
    np_dtype = np.complex128 if dtype == jnp.complex128 else np.complex64
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np_dtype)
    eng = LatticeEngine(
        psi, chi=8, dtype=dtype,
        factor_method=factor_method, bp_schedule=bp_schedule,
    )
    step = eng.make_step(layer, cutoff=1e-12, bp_maxiter=bp_maxiter)
    t0 = time.time()
    T, M = eng.T, eng.M
    for _ in range(layers):
        T, M, errors = step(T, M)
    eng.T, eng.M = T, M
    z_bp = eng.expect_1site("Z")
    z_bmps = BMPSEngine(eng, rank=10).expect_1site(
        "Z", vertices=[CENTER, BENCH_V]
    )
    return dict(
        tag=tag,
        z_bp_center=float(np.real(z_bp[CENTER])),
        z_bp_bench=float(np.real(z_bp[BENCH_V])),
        z_bmps_center=float(np.real(z_bmps[CENTER])),
        z_bmps_bench=float(np.real(z_bmps[BENCH_V])),
        seconds=time.time() - t0,
    )


def main():
    w2 = json.loads((GOLDEN / "golden_f32_controls.json").read_text())["w2"]
    ref_bp_b = w2["z_bench_f64"][-1]
    ref_bp_c = w2["z_center_f64"][-1]
    ref_bmps_b = w2["z_bmps_bench_f64"]
    print(
        f"flex f64:  BP Z{BENCH_V}={ref_bp_b:+.6f} Z{CENTER}={ref_bp_c:+.6f} "
        f"BMPS(10) Z{BENCH_V}={ref_bmps_b:+.6f}"
    )
    print(f"flex f32 spread (BP, 20 layers): {w2['f32_floor_bp']:.2e}")
    rows = []
    for v in VARIANTS:
        r = run_variant(*v)
        rows.append(r)
        print(
            f"{r['tag']}: BP Z{BENCH_V}={r['z_bp_bench']:+.6f} "
            f"(dev {abs(r['z_bp_bench'] - ref_bp_b):.2e})  "
            f"BMPS Z{BENCH_V}={r['z_bmps_bench']:+.6f} "
            f"(dev {abs(r['z_bmps_bench'] - ref_bmps_b):.2e})  "
            f"BP Z{CENTER} dev {abs(r['z_bp_center'] - ref_bp_c):.2e}  "
            f"[{r['seconds']:.0f}s]",
            flush=True,
        )
    out = ROOT / "scripts" / "bisect_w2_gap_results.json"
    out.write_text(json.dumps(dict(reference=w2["config"], rows=rows), indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
