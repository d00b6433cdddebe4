"""CPU probe of the compiled sampler's certification spread (verdict #4).

The flex-f64 golden certifies the w2 state at p/q rel-std 8.0e-4
(rank 10 / proj 40); round 2's compiled sampler printed 1.46e-1 on the
same nominal workload.  The committed f32 control shows precision
contributes ~nothing (flex-f32 rel-std 8.06e-4), so the gap is the
compiled pipeline's randomized-sketch truncations.  This script evolves
the w2 state with the engine ON CPU and sweeps the sampler's accuracy
knobs (norm-MPS rank, projected rank, sketch oversampling, power
iterations), reporting the p/q statistics per configuration — the
committed answer to "which knob closes the gap".

Run:  PALLAS_AXON_POOL_IPS= python scripts/probe_cert_noise.py
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
from tnqs.bmps_engine import BMPSEngine, BMPSSampler
from tnqs.engine import LatticeEngine
from tnqs.models import heavy_hex_kicked_ising_layer


def main():
    g = tnqs.eagle_lattice()
    layer = heavy_hex_kicked_ising_layer(g, float(np.pi / 4), 0.4)
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)
    eng = LatticeEngine(psi, chi=8, dtype=jnp.complex64)
    step = eng.make_step(layer, cutoff=1e-12, bp_maxiter=25)
    T, M = eng.T, eng.M
    t0 = time.time()
    for _ in range(20):
        T, M, _ = step(T, M)
    eng.T, eng.M = T, M
    print(f"evolved 20 layers chi=8 in {time.time() - t0:.1f}s", flush=True)

    only = sys.argv[1] if len(sys.argv) > 1 else None
    rows = []
    for tag, rank, proj, overs, piters, qmode in [
        ("bench r2 cfg        ", 10, 40, 8, 1, "doubled"),
        ("power iters 3       ", 10, 40, 8, 3, "doubled"),
        ("oversample 24       ", 10, 40, 24, 1, "doubled"),
        ("oversample 24 + pi3 ", 10, 40, 24, 3, "doubled"),
        ("proj 64             ", 10, 64, 8, 1, "doubled"),
        ("rank 16             ", 16, 40, 8, 1, "doubled"),
        ("rank 16 + ovs24 pi3 ", 16, 64, 24, 3, "doubled"),
        # factored-q (round 4): single-layer projected boundaries — rank r
        # carries doubled-r^2 information, sketched in a chi-dim ambient
        ("factored r6         ", 10, 6, 8, 1, "factored"),
        ("factored r8         ", 10, 8, 8, 1, "factored"),
        ("factored r8 + pi3   ", 10, 8, 8, 3, "factored"),
        ("factored r12 + pi3  ", 10, 12, 8, 3, "factored"),
        ("factored r16 + pi3  ", 10, 16, 8, 3, "factored"),
        ("factored r16 + pi5  ", 10, 16, 16, 5, "factored"),
        # the norm-network RIGHT boundaries are doubled sketches at the
        # BMPSEngine rank — raise them too (flex's deterministic fitting
        # at rank 10 has no sketch noise; ours needs rank/power headroom)
        ("factored nrm24      ", 24, 12, 8, 3, "factored"),
        ("factored nrm32 pi5  ", 32, 16, 16, 5, "factored"),
    ]:
        if only and only not in tag:
            continue
        t0 = time.time()
        be = BMPSEngine(eng, rank=rank, oversample=overs, power_iters=piters)
        sam = BMPSSampler(be, proj_rank=proj, q_mode=qmode)
        cert = sam.sample_directly_certified(50, seed=1)
        pq = np.array([c["poverq"] for c in cert])
        row = dict(
            tag=tag.strip(), rank=rank, proj=proj, oversample=overs,
            power_iters=piters, q_mode=qmode, pq_mean=float(pq.mean()),
            pq_rel_std=float(pq.std() / pq.mean()),
            seconds=round(time.time() - t0, 1),
        )
        rows.append(row)
        print(
            f"{tag} rank={rank:3d} proj={proj:3d} ovs={overs:3d} pi={piters} "
            f"-> p/q mean {row['pq_mean']:.4f} rel-std {row['pq_rel_std']:.2e} "
            f"({row['seconds']}s)",
            flush=True,
        )

    out = ROOT / "scripts" / "probe_cert_noise_results.json"
    # merge with any earlier (partial/filtered) run, newest row per tag wins
    old = json.loads(out.read_text())["rows"] if out.exists() else []
    by_tag = {r["tag"]: r for r in old}
    by_tag.update({r["tag"]: r for r in rows})
    out.write_text(
        json.dumps(dict(flex_rel_std=8.06e-4, rows=list(by_tag.values())), indent=1)
    )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
