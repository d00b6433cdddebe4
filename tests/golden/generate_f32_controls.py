"""Generate the committed f32-vs-f64 control trajectories (flex tier, CPU).

Purpose (round-3 verdict item 1): the production TPU engine runs the
flagship benchmark at complex64 with the Pallas/gram kernel path; its
agreement with the f64 golden was measured ad hoc at ~3e-4.  Whether that is
an engine defect or the intrinsic float32 truncation-chaos floor can only be
decided against a *flex-f32 control*: the same reference-semantics
trajectory at complex64 on the host (LAPACK kernels, the reference's own
f32 behavior including the `safe_eigen` f32->f64 eig escape hatch,
`/root/reference/src/utils.jl:94-108`).  The committed spread
|flex_c64 - flex_c128| per layer IS the matched-precision bar
(reference tolerance discipline: 10*eps of the working precision,
`/root/reference/test/test_expect.jl:33-35` — but past bond saturation the
per-layer truncation decisions amplify rounding chaotically, so the
empirical control, not 10*eps(f32), is the honest f32 floor).

Two configs:

* ``chi64``  — the flagship benchmark config (Eagle-127 kicked Ising at
  chi=64, cutoff 1e-12, 10 layers).  Bonds saturate at layer 6; layers 7-10
  truncate, so the tail of the trajectory measures the chaos floor.
  `tests/test_f32_floor.py` gates the production TPU engine config against
  the f64 golden at a multiple of this spread.
* ``w2`` — BASELINE workload-2 config (chi=8, 20 layers) plus the rank-10
  boundary-MPS <Z> and 50-sample certification statistics in BOTH
  precisions (round-3 verdict items 4 and 7: the compiled sampler's p/q
  spread and the bench's cross-tier <Z> gap need an f32-intrinsic
  reference).

Run once (CPU-only, ~25 min):
    PALLAS_AXON_POOL_IPS= python tests/golden/generate_f32_controls.py
Deterministic: seeded rng everywhere.
"""

import json
import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))
HERE = pathlib.Path(__file__).resolve().parent

import numpy as np

import tnqs
from tnqs.models import heavy_hex_kicked_ising_layer

CENTER = (7, 8)   # golden_eagle127's central vertex
BENCH_V = (11, 5)  # bench.py workload-2 probe vertex


def _traj(dtype, chi, layers, cutoff=1e-12):
    g = tnqs.eagle_lattice()
    layer = heavy_hex_kicked_ising_layer(g, float(np.pi / 4), 0.4)
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=dtype)
    bpc = tnqs.BeliefPropagationCache(psi)
    ak = dict(maxdim=chi, cutoff=cutoff, normalize_tensors=True)
    zc, zb = [], []
    for li in range(layers):
        t0 = time.time()
        bpc, _ = tnqs.apply_gates(layer, bpc, apply_kwargs=ak)
        z = tnqs.expect(bpc, [("Z", [CENTER]), ("Z", [BENCH_V])])
        zc.append(float(np.real(z[0])))
        zb.append(float(np.real(z[1])))
        print(
            f"  {np.dtype(dtype).name} chi={chi} layer {li + 1}/{layers}: "
            f"Z({CENTER})={zc[-1]:+.6f} Z({BENCH_V})={zb[-1]:+.6f} "
            f"[{time.time() - t0:.1f}s]",
            flush=True,
        )
    return bpc, zc, zb


def gen_chi64(layers=10):
    out = {"config": {
        "lattice": "eagle_lattice() 127q/144e",
        "J": float(np.pi / 4), "theta_h": 0.4,
        "maxdim": 64, "cutoff": 1e-12, "layers": layers,
        "center": list(CENTER), "bench_vertex": list(BENCH_V),
    }}
    for dtype, tag in ((np.complex128, "f64"), (np.complex64, "f32")):
        _, zc, zb = _traj(dtype, 64, layers)
        out[f"z_center_{tag}"] = zc
        out[f"z_bench_{tag}"] = zb
    spread_c = [abs(a - b) for a, b in zip(out["z_center_f64"], out["z_center_f32"])]
    spread_b = [abs(a - b) for a, b in zip(out["z_bench_f64"], out["z_bench_f32"])]
    out["f32_floor_per_layer"] = [max(a, b) for a, b in zip(spread_c, spread_b)]
    out["f32_floor"] = max(out["f32_floor_per_layer"])
    return out


def gen_w2(layers=20):
    out = {"config": {
        "lattice": "eagle_lattice() 127q/144e",
        "J": float(np.pi / 4), "theta_h": 0.4,
        "maxdim": 8, "cutoff": 1e-12, "layers": layers,
        "center": list(CENTER), "bench_vertex": list(BENCH_V),
        "mps_bond_dimension": 10, "projected_mps_bond_dimension": 40,
        "nsamples": 50, "sample_seed": 0,
    }}
    for dtype, tag in ((np.complex128, "f64"), (np.complex64, "f32")):
        bpc, zc, zb = _traj(dtype, 8, layers)
        out[f"z_center_{tag}"] = zc
        out[f"z_bench_{tag}"] = zb
        psi_t = bpc.network
        z = tnqs.expect(
            psi_t, [("Z", [CENTER]), ("Z", [BENCH_V])],
            alg="boundarymps", mps_bond_dimension=10,
        )
        out[f"z_bmps_center_{tag}"] = float(np.real(z[0]))
        out[f"z_bmps_bench_{tag}"] = float(np.real(z[1]))
        cert = tnqs.sample_directly_certified(
            psi_t, 50, alg="boundarymps", norm_mps_bond_dimension=10,
            projected_mps_bond_dimension=40, rng=np.random.default_rng(0),
        )
        pq = np.array([np.real(c["poverq"]) for c in cert])
        out[f"pq_mean_{tag}"] = float(pq.mean())
        out[f"pq_rel_std_{tag}"] = float(pq.std() / pq.mean())
        print(f"  w2 {tag}: bmps Z({BENCH_V})={out[f'z_bmps_bench_{tag}']:+.6f} "
              f"p/q rel-std={out[f'pq_rel_std_{tag}']:.2e}", flush=True)
    out["f32_floor_bp"] = max(
        abs(a - b) for a, b in zip(out["z_center_f64"], out["z_center_f32"])
    )
    out["f32_floor_bmps"] = max(
        abs(out["z_bmps_center_f64"] - out["z_bmps_center_f32"]),
        abs(out["z_bmps_bench_f64"] - out["z_bmps_bench_f32"]),
    )
    return out


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    path = HERE / "golden_f32_controls.json"
    payload = json.loads(path.read_text()) if path.exists() else {}
    if which in ("all", "w2"):
        payload["w2"] = gen_w2()
        path.write_text(json.dumps(payload, indent=1, sort_keys=True))
        print(f"wrote {path} [w2]")
    if which in ("all", "chi64"):
        payload["chi64"] = gen_chi64()
        path.write_text(json.dumps(payload, indent=1, sort_keys=True))
        print(f"wrote {path} [chi64]")


if __name__ == "__main__":
    main()
