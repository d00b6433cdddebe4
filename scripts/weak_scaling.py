"""Multi-chip scaling table on the virtual CPU mesh (round-4 verdict
item 9): the dryrun proves the sharded programs are correct; this script
attaches NUMBERS — per-stage wall times, per-device halo/relay traffic,
and partition balance at D = 1/2/4/8 devices on the flagship Eagle-127
kicked-Ising workload (chi=2: the largest config the 1-core CI host can
hold for every D).

Measurement caveat, recorded in the artifact: the virtual mesh multiplexes
all D "devices" onto ONE physical core, so wall-clock cannot show speedup
— it validates that the sharded programs' overhead (relay steps, padding,
collective scheduling) stays bounded as D grows.  The scaling story is
carried by the analytic per-device numbers, which ARE exact for a real
mesh: halo bytes/device/layer (ICI traffic of the halo-exchange step,
`HaloStepEngine.halo_bytes_per_layer`), vertices/device (compute
partition), and samples/device (embarrassing axis).

Each D runs in a fresh subprocess (device count must be fixed before
backend init).  Output: scripts/weak_scaling_results.json + a markdown
table on stdout (pasted into docs/parallel.md).

Run: python scripts/weak_scaling.py          (parent; ~10 min)
"""

import json
import os
import pathlib
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

DEVICE_COUNTS = (1, 2, 4, 8)
STEADY_REPS = 3


def child(n: int) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    import tnqs
    from tnqs.bmps_engine import BMPSEngine, BMPSSampler
    from tnqs.engine import LatticeEngine
    from tnqs.models import heavy_hex_kicked_ising_layer
    from tnqs.parallel.bmps_ring import ShardedBMPS, ShardedSampler
    from tnqs.parallel.halo_step import HaloStepEngine
    from tnqs.parallel.mesh import make_mesh

    assert len(jax.devices()) >= n
    mesh = make_mesh(n)
    g = tnqs.eagle_lattice()
    layer = heavy_hex_kicked_ising_layer(g, float(np.pi / 4), 0.4)
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)
    eng = LatticeEngine(psi, chi=2, bp_schedule="color")
    out: dict = {"devices": n, "nv": g.nv(), "chi": 2}

    # -- stage 1: halo-exchange full layer step ---------------------------
    hse = HaloStepEngine(eng, n_bands=n, mesh=mesh, order="sorted")
    step = hse.make_step(layer, cutoff=1e-12, bp_maxiter=4)
    t0 = time.perf_counter()
    Tb, Mb, err = step(hse.Tb, hse.Mb)
    jax.block_until_ready(err)
    out["halo_step_first_s"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    for _ in range(STEADY_REPS):
        Tb, Mb, err = step(Tb, Mb)
    jax.block_until_ready(err)
    out["halo_step_steady_s"] = round((time.perf_counter() - t0) / STEADY_REPS, 3)
    hse.Tb, hse.Mb = Tb, Mb
    traffic = hse.halo_bytes_per_layer(layer, bp_maxiter=4)
    out["halo_bytes_per_device_layer"] = traffic["total_bytes"]
    out["halo_bp_bytes"] = traffic["bp_bytes"]
    out["halo_gate_bytes"] = traffic["gate_bytes"]
    from collections import Counter

    sizes = Counter(hse.hplan.band_of_vertex.values())
    out["vertices_per_device"] = {
        "max": max(sizes.values()), "min": min(sizes.values())
    }

    meng = hse.unshard()
    meng.bp_update(maxiter=10)

    # -- stage 2: mesh-parallel certified sampling (16 samples total) -----
    sam = ShardedSampler(BMPSSampler(BMPSEngine(meng, rank=4), proj_rank=8), mesh)
    t0 = time.perf_counter()
    cert = sam.sample_directly_certified(16, seed=0)
    out["sample16_first_s"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    cert = sam.sample_directly_certified(16, seed=1)
    out["sample16_steady_s"] = round(time.perf_counter() - t0, 3)
    out["samples_per_device"] = -(-16 // n)
    out["pq_mean"] = round(float(np.mean([c["poverq"] for c in cert])), 4)

    # -- stage 3: ring-pipelined boundary-MPS expect -----------------------
    ring = ShardedBMPS(BMPSEngine(meng, rank=4), mesh)
    t0 = time.perf_counter()
    z = ring.expect_1site("Z")
    out["bmps_expect_first_s"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    z = ring.expect_1site("Z")
    out["bmps_expect_steady_s"] = round(time.perf_counter() - t0, 3)
    out["columns_per_device"] = {
        "max": max(s1 - s0 for (s0, s1) in ring.bands),
        "min": min(s1 - s0 for (s0, s1) in ring.bands),
    }
    out["z_mean"] = round(float(np.mean([np.real(x) for x in z.values()])), 6)
    return out


def main():
    rows = []
    for n in DEVICE_COUNTS:
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PALLAS_AXON_POOL_IPS"] = ""
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n}"
        ).strip()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(n)],
            env=env, capture_output=True, text=True, timeout=2400,
        )
        if proc.returncode != 0:
            print(proc.stderr[-3000:], file=sys.stderr)
            raise RuntimeError(f"D={n} child failed rc={proc.returncode}")
        rows.append(json.loads(proc.stdout.strip().splitlines()[-1]))
        print(f"# D={n} done: {rows[-1]}", file=sys.stderr, flush=True)
    artifact = {
        "workload": "Eagle-127 heavy-hex kicked-Ising, chi=2, virtual CPU mesh",
        "caveat": (
            "wall times measured with all virtual devices multiplexed on one"
            " physical core — they bound sharding OVERHEAD, not speedup; the"
            " per-device byte/partition columns are exact for a real mesh"
        ),
        "rows": rows,
    }
    out = ROOT / "scripts" / "weak_scaling_results.json"
    out.write_text(json.dumps(artifact, indent=1))
    # markdown table for docs/parallel.md
    hdr = (
        "| D | halo step steady (s) | halo MB/dev/layer | verts/dev "
        "| 16-sample steady (s) | samples/dev | BMPS expect steady (s) "
        "| cols/dev |"
    )
    print(hdr)
    print("|" + "---|" * 8)
    for r in rows:
        print(
            f"| {r['devices']} | {r['halo_step_steady_s']} "
            f"| {r['halo_bytes_per_device_layer'] / 1e6:.3f} "
            f"| {r['vertices_per_device']['max']} "
            f"| {r['sample16_steady_s']} | {r['samples_per_device']} "
            f"| {r['bmps_expect_steady_s']} "
            f"| {r['columns_per_device']['max']} |"
        )
    print(f"# wrote {out}")


if __name__ == "__main__":
    if len(sys.argv) > 1:
        n = int(sys.argv[1])
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n}"
            ).strip()
        import numpy as _np

        def _py(o):  # numpy scalars from traffic/partition counters
            return int(o) if isinstance(o, _np.integer) else float(o)

        print(json.dumps(child(n), default=_py), flush=True)
    else:
        main()
