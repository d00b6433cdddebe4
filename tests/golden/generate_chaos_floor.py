"""Multi-seed f32 truncation-chaos floor for the flagship chi=64 config.

Round-4 verdict item 7: the pjsvd parity artifact sits at 0.89x the
committed flex-f32 control floor — a thin margin, but the "floor" there is
a SINGLE sample of a chaotic deviation process.  Past bond saturation the
per-layer truncation decisions amplify rounding noise with a positive
Lyapunov exponent, so |f32_trajectory - f64_golden| is a random variable
over equivalent-at-epsilon initial conditions, and one control trajectory
estimates its scale with n=1.

This script widens the estimate: K flex-f32 trajectories of the exact
benchmark config, each started from the product state perturbed by additive
complex Gaussian noise of relative scale 1e-7 (float32 eps is 1.19e-7 — the
perturbation is the same size as one rounding event, i.e. each sample is a
trajectory the f32 arithmetic could legitimately have produced).  Each
sample's per-layer deviation from the committed flex-f64 golden is recorded;
the per-layer MAX over {original control} ∪ {seeds} is the widened running
floor `f32_floor_multiseed_per_layer`.

The pjsvd gate in `tests/test_f32_floor.py` then asks the engine artifact to
sit INSIDE this distribution (≤ its max) rather than under one sample of it.

Reference anchor for the tolerance discipline this widens:
`/root/reference/test/test_expect.jl:33-35` (10*eps of working precision —
valid only pre-saturation; the empirical control is the honest bar after).

Run (CPU, ~8 min/seed on the 1-core CI host):
    PALLAS_AXON_POOL_IPS= python tests/golden/generate_chaos_floor.py [K]
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
from tnqs.core.tensor import Tensor
from tnqs.models import heavy_hex_kicked_ising_layer

CENTER = (7, 8)
BENCH_V = (11, 5)
PERT_SCALE = 1e-7  # one f32 rounding event (eps = 1.19e-7)


def perturbed_traj(seed: int, chi: int, layers: int, cutoff=1e-12):
    g = tnqs.eagle_lattice()
    layer = heavy_hex_kicked_ising_layer(g, float(np.pi / 4), 0.4)
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)
    rng = np.random.default_rng(seed)
    for v in psi.vertices():
        t = psi[v]
        noise = (
            rng.standard_normal(t.data.shape) + 1j * rng.standard_normal(t.data.shape)
        ).astype(np.complex64) * np.float32(PERT_SCALE)
        psi[v] = Tensor(t.data + noise, t.inds)
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
            f"  seed {seed} layer {li + 1}/{layers}: Z({CENTER})={zc[-1]:+.6f} "
            f"Z({BENCH_V})={zb[-1]:+.6f} [{time.time() - t0:.1f}s]",
            flush=True,
        )
    return zc, zb


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    path = HERE / "golden_f32_controls.json"
    payload = json.loads(path.read_text())
    chi64 = payload["chi64"]
    layers = int(chi64["config"]["layers"])
    zc64, zb64 = chi64["z_center_f64"], chi64["z_bench_f64"]

    seeds = dict(chi64.get("multiseed_controls", {}).get("seeds", {}))
    for seed in range(1, k + 1):
        if str(seed) in seeds:
            print(f"seed {seed}: already captured, skipping", flush=True)
            continue
        zc, zb = perturbed_traj(seed, int(chi64["config"]["maxdim"]), layers)
        dev = [
            max(abs(a - b), abs(c - d))
            for a, b, c, d in zip(zc, zc64, zb, zb64)
        ]
        seeds[str(seed)] = {
            "z_center_f32": zc,
            "z_bench_f32": zb,
            "dev_from_f64_per_layer": dev,
        }
        # widened floor: per-layer max over the original control + all seeds
        per_layer = list(chi64["f32_floor_per_layer"])
        for s in seeds.values():
            per_layer = [max(a, b) for a, b in zip(per_layer, s["dev_from_f64_per_layer"])]
        chi64["multiseed_controls"] = {
            "perturbation": f"additive complex N(0,1)*{PERT_SCALE} per tensor entry "
                            "(one f32 rounding event), flex complex64 trajectory",
            "seeds": seeds,
            "f32_floor_multiseed_per_layer": per_layer,
            "f32_floor_multiseed": max(per_layer),
        }
        path.write_text(json.dumps(payload, indent=1, sort_keys=True))
        print(
            f"wrote {path}: {len(seeds)} seeds, widened floor "
            f"{max(per_layer):.3e} (single-control floor "
            f"{chi64['f32_floor']:.3e})",
            flush=True,
        )


if __name__ == "__main__":
    main()
