"""Production-path parity artifact: TPU engine vs the committed f64 golden.

Round-3 verdict item 1: the 1e-5 golden gate runs the f64/CPU engine
config; the PRODUCTION path (complex64, gram factorizations, Pallas
BP/Jacobi kernels, subspace truncation, color schedule) was verified only in
a commit message.  This script runs the production engine on the flagship
config (Eagle-127 kicked Ising at chi=64) for the layers covered by
`tests/golden/golden_f32_controls.json`, records the per-layer <Z>
trajectory, and writes `tests/golden/tpu_parity_chi64.json` — the committed
artifact `tests/test_f32_floor.py` then gates:

    |engine - flex_f64|  <=  margin * max(|flex_f32 - flex_f64|)

i.e. the engine must sit at the intrinsic float32 truncation-chaos floor
measured by the flex-f32 control, not at some larger engine-error floor.

Run ON TPU (one process!):  python scripts/tpu_parity_check.py
Prerequisite: tests/golden/golden_f32_controls.json (generate_f32_controls.py).

Variants (diagnosing the round-3 parity gap — the randomized subspace
truncation was measured at 4e-2 reconstruction error on saturated
gently-decaying spectra by `scripts/probe_trunc_accuracy.py`, vs 5e-6 for
the full-eigh gram path):

    --trunc {subspace,full}   truncation eigensolver for large theta grams
    --layers N                override layer count
    --out PATH                artifact path (default tests/golden/tpu_parity_chi64.json)
"""

import argparse
import json
import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
GOLDEN = ROOT / "tests" / "golden"

import numpy as np

import jax
import jax.numpy as jnp

import tnqs
from tnqs.engine import LatticeEngine
from tnqs.models import heavy_hex_kicked_ising_layer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trunc", choices=("subspace", "full", "svd"), default=None)
    ap.add_argument("--svd-impl", choices=("auto", "pjsvd", "xla"), default=None,
                    help="backend for trunc=svd (pjsvd = preconditioned "
                    "one-sided Jacobi kernel; xla = jnp.linalg.svd)")
    ap.add_argument("--layers", type=int, default=None)
    ap.add_argument("--out", default=str(GOLDEN / "tpu_parity_chi64.json"))
    args = ap.parse_args()

    controls = json.loads((GOLDEN / "golden_f32_controls.json").read_text())
    cfg = controls["chi64"]["config"]
    center = tuple(cfg["center"])
    bench_v = tuple(cfg["bench_vertex"])
    layers = args.layers or int(cfg["layers"])

    g = tnqs.eagle_lattice()
    layer = heavy_hex_kicked_ising_layer(g, cfg["J"], cfg["theta_h"])
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)
    eng = LatticeEngine(psi, chi=int(cfg["maxdim"]), dtype=jnp.complex64)
    if args.trunc is not None:
        eng.trunc_method = args.trunc
    if args.svd_impl is not None:
        eng.svd_impl = args.svd_impl
    step = eng.make_step(layer, cutoff=float(cfg["cutoff"]), bp_maxiter=25)

    zc, zb = [], []
    T, M = eng.T, eng.M
    for li in range(layers):
        t0 = time.time()
        T, M, errors = step(T, M)
        eng.T, eng.M = T, M
        z = eng.expect_1site("Z")
        zc.append(float(np.real(z[center])))
        zb.append(float(np.real(z[bench_v])))
        print(
            f"layer {li + 1}/{layers}: Z{center}={zc[-1]:+.6f} "
            f"Z{bench_v}={zb[-1]:+.6f} [{time.time() - t0:.1f}s]",
            flush=True,
        )
        if not (np.isfinite(zc[-1]) and np.isfinite(zb[-1])):
            raise RuntimeError("non-finite observable; parity run void")

    dev_c = [abs(a - b) for a, b in zip(zc, controls["chi64"]["z_center_f64"])]
    dev_b = [abs(a - b) for a, b in zip(zb, controls["chi64"]["z_bench_f64"])]
    payload = {
        "config": cfg,
        "backend": jax.default_backend(),
        "engine": dict(
            factor_method=eng.factor_method,
            env_gauge=eng.env_gauge,
            trunc_method=eng.trunc_method,
            svd_impl=getattr(eng, "svd_impl", "auto"),
            pjsvd_routing=__import__("tnqs.ops.osj", fromlist=["x"]).PJSVD_ROUTING,
            bp_kernel=eng.bp_kernel,
            bp_schedule=eng.plan.bp_schedule,
            dtype="complex64",
        ),
        "z_center_engine": zc,
        "z_bench_engine": zb,
        "dev_from_f64_per_layer": [max(a, b) for a, b in zip(dev_c, dev_b)],
        "f32_floor_per_layer": controls["chi64"]["f32_floor_per_layer"],
    }
    out = pathlib.Path(args.out)
    out.write_text(json.dumps(payload, indent=1, sort_keys=True))
    floor = max(controls["chi64"]["f32_floor_per_layer"])
    dev = max(payload["dev_from_f64_per_layer"])
    print(f"wrote {out}")
    print(f"max |engine - f64| = {dev:.2e}; flex-f32 floor = {floor:.2e}; "
          f"ratio = {dev / max(floor, 1e-30):.2f}")


if __name__ == "__main__":
    main()
