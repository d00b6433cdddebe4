"""Generate the committed golden parity artifacts (f64, CPU, flex tier).

Produces `tests/golden/golden_*.json`: float64 `factor_method="direct"`
reference trajectories for the five BASELINE.md benchmark configs, replacing
the reference's test anchors (`/root/reference/test/test_expect.jl:33-35`,
`examples/heavyhexIsing_dynamics.jl:48-59`,
`examples/hexagonal_heisenbergmodel_thermalstate.jl:36-37`,
`test/test_sampling.jl:43-44`).  `tests/test_golden.py` gates both the flex
tier and the compiled engine against these at the 1e-5 observable bar
(BASELINE.md "north star" accuracy).

Run once (CPU-only, ~10 min):
    PALLAS_AXON_POOL_IPS= python tests/golden/generate_goldens.py
Deterministic: all randomness is seeded with np.random.default_rng.
"""

import json
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))
HERE = pathlib.Path(__file__).resolve().parent

import numpy as np

import tnqs
from tnqs.models import (
    heavy_hex_kicked_ising_layer,
    heisenberg_imaginary_time_gates,
    htse_free_energy_density_4th,
)


def _write(name, payload):
    path = HERE / f"golden_{name}.json"
    path.write_text(json.dumps(payload, indent=1, sort_keys=True))
    print(f"wrote {path}")


def gen_tfim5x5():
    """BASELINE config 1: 5x5 square-lattice TFIM Trotter dynamics
    (README quickstart, `examples/2dIsing_dynamics.jl`)."""
    g = tnqs.named_grid((5, 5))
    dt, hx, hz, J = 0.25, 1.0, 0.8, 0.5
    layer = [("Rx", [v], 2 * hx * dt) for v in g.vertices()]
    layer += [("Rz", [v], 2 * hz * dt) for v in g.vertices()]
    for group in tnqs.edge_color(g, 4):
        layer += [("Rzz", list(pair), 2 * J * dt) for pair in group]
    center = (3, 3)
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex128)
    bpc = tnqs.BeliefPropagationCache(psi)
    ak = dict(maxdim=10, cutoff=1e-14, normalize_tensors=True)
    zs, errs = [], []
    for _ in range(10):
        bpc, e = tnqs.apply_gates(layer, bpc, apply_kwargs=ak)
        zs.append(float(np.real(tnqs.expect(bpc, [("Z", [center])])[0])))
        errs.append(float(np.max(e)))
    _write(
        "tfim5x5",
        {
            "config": {
                "lattice": "named_grid(5,5)",
                "dt": dt,
                "hx": hx,
                "hz": hz,
                "J": J,
                "maxdim": 10,
                "cutoff": 1e-14,
                "layers": 10,
                "center": list(center),
                "dtype": "complex128",
            },
            "z_center": zs,
            "max_gate_error": errs,
        },
    )


def gen_eagle127():
    """BASELINE config 2: 127q Eagle heavy-hex kicked Ising, chi=8, 20 layers,
    BMPS <Z> + 50 certified samples (`examples/heavyhexIsing_dynamics.jl`)."""
    g = tnqs.eagle_lattice()
    J, theta_h = float(np.pi / 4), 0.4
    layer = heavy_hex_kicked_ising_layer(g, J, theta_h)
    central = (7, 8)
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex128)
    bpc = tnqs.BeliefPropagationCache(psi)
    ak = dict(maxdim=8, cutoff=1e-12, normalize_tensors=True)
    zs, fids = [], []
    for _ in range(20):
        bpc, e = tnqs.apply_gates(layer, bpc, apply_kwargs=ak)
        fids.append(float(np.prod(1.0 - e)))
        zs.append(float(np.real(tnqs.expect(bpc, [("Z", [central])])[0])))
    psi_t = bpc.network
    z_bmps = float(
        np.real(
            tnqs.expect(psi_t, [("Z", [central])], alg="boundarymps", mps_bond_dimension=10)[0]
        )
    )
    rng = np.random.default_rng(0)
    cert = tnqs.sample_directly_certified(
        psi_t, 50, alg="boundarymps", norm_mps_bond_dimension=10, rng=rng
    )
    pq = np.array([np.real(c["poverq"]) for c in cert])
    sampled_z = float(
        sum(np.real(c["poverq"]) * (-2 * c["bitstring"][central] + 1) for c in cert) / pq.sum()
    )
    first4 = [
        {
            "poverq": float(np.real(c["poverq"])),
            "bits_central": int(c["bitstring"][central]),
            "n_ones": int(sum(c["bitstring"].values())),
        }
        for c in cert[:4]
    ]
    _write(
        "eagle127",
        {
            "config": {
                "lattice": "eagle_lattice() 127q/144e",
                "J": J,
                "theta_h": theta_h,
                "maxdim": 8,
                "cutoff": 1e-12,
                "layers": 20,
                "central": list(central),
                "mps_bond_dimension": 10,
                "nsamples": 50,
                "sample_seed": 0,
                "dtype": "complex128",
            },
            "z_central": zs,
            "layer_fidelity": fids,
            "z_bmps_central": z_bmps,
            "pq_mean": float(pq.mean()),
            "pq_std": float(pq.std()),
            "sampled_z_central": sampled_z,
            "first4_samples": first4,
        },
    )


def gen_cubic333():
    """BASELINE config 3: 3D periodic cubic Ising dynamics
    (`examples/3dIsing_dynamics.jl`) + loop-corrected norms
    (`examples/loopcorrections.jl`, separate lattices below)."""
    g = tnqs.named_grid((3, 3, 3), periodic=True)
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex128)
    bpc = tnqs.BeliefPropagationCache(psi)
    h, J, dt = -1.0, -1.0, 0.04
    layer = [("Rz", [v], h * dt) for v in g.vertices()]
    for group in tnqs.edge_color(g, 7):
        layer += [("Rxx", list(pair), 2 * J * dt) for pair in group]
    layer += [("Rz", [v], h * dt) for v in g.vertices()]
    vc = tnqs.center(g)[0]
    ak = dict(maxdim=4, cutoff=1e-10, normalize_tensors=True)
    zs = []
    for _ in range(10):
        bpc, _ = tnqs.apply_gates(layer, bpc, apply_kwargs=ak)
        zs.append(float(np.real(tnqs.expect(bpc, [("Z", [vc])])[0])))
    _write(
        "cubic333",
        {
            "config": {
                "lattice": "named_grid(3,3,3,periodic)",
                "h": h,
                "J": J,
                "dt": dt,
                "maxdim": 4,
                "cutoff": 1e-10,
                "layers": 10,
                "center": list(vc),
                "dtype": "complex128",
            },
            "z_center": zs,
        },
    )


def gen_loopcorrections():
    """Loop-corrected BP norms vs exact on hex / square lattices with a
    seeded random chi=3 state (`examples/loopcorrections.jl`)."""
    rng = np.random.default_rng(1634)
    out = {}
    for g, name, max_len in [
        (tnqs.named_hexagonal_lattice_graph(2, 2), "hexagonal", 6),
        (tnqs.named_grid((4, 4)), "square", 4),
    ]:
        psi = tnqs.random_tensornetworkstate(g, bond_dimension=3, rng=rng, dtype=np.float64)
        psi = tnqs.normalize(psi, alg="bp")
        exact = complex(tnqs.norm_sqr(psi, alg="exact"))
        bp = complex(tnqs.norm_sqr(psi, alg="bp"))
        loop = complex(
            tnqs.norm_sqr(psi, alg="loopcorrections", max_configuration_size=max_len)
        )
        out[name] = {
            "nv": g.nv(),
            "max_configuration_size": max_len,
            "norm_exact": [exact.real, exact.imag],
            "norm_bp": [bp.real, bp.imag],
            "norm_loop_corrected": [loop.real, loop.imag],
        }
    _write("loopcorrections", {"config": {"seed": 1634, "chi": 3, "dtype": "float64"}, "lattices": out})


def gen_thermal():
    """BASELINE config 4: hexagonal Heisenberg thermal state, imaginary-time
    simple update chi=32 (`examples/hexagonal_heisenbergmodel_thermalstate.jl`)."""
    g = tnqs.named_hexagonal_lattice_graph(2, 2, periodic=True)
    s = tnqs.siteinds("S=1/2", g, inds_per_site=2)
    psi = tnqs.identity_tensornetworkstate(g, s, dtype=np.float64)
    bpc = tnqs.BeliefPropagationCache(psi).update()
    dbeta, J = 0.01, 1.0
    gates = heisenberg_imaginary_time_gates(g, s, J, dbeta)
    ak = dict(maxdim=32, cutoff=1e-14, normalize_tensors=False)
    logz = -bpc.freenergy()
    bpc.rescale_()
    f_traj, htse = [], []
    for i in range(1, 26):
        bpc, _ = tnqs.apply_gates(gates, bpc, apply_kwargs=ak)
        logz -= bpc.freenergy()
        bpc.rescale_()
        if i % 5 == 0:
            beta = 2 * i * dbeta
            f_traj.append(float(np.real(logz) / g.nv()))
            htse.append(float(htse_free_energy_density_4th(J, beta)))
    _write(
        "thermal",
        {
            "config": {
                "lattice": "named_hexagonal_lattice_graph(2,2,periodic)",
                "dbeta": dbeta,
                "J": J,
                "maxdim": 32,
                "cutoff": 1e-14,
                "steps": 25,
                "record_every": 5,
                "dtype": "float64",
            },
            "free_energy_density": f_traj,
            "htse_4th": htse,
        },
    )


def gen_heisenberg_picture():
    """BASELINE config 5: Heisenberg-picture operator dynamics
    (`examples/2dIsing_dynamics_Heisenbergpicture.jl`); certified-sampling
    stats are covered by the eagle127 golden."""
    from tnqs.gates import op

    g = tnqs.named_grid((4, 4))
    vz = tnqs.center(g)[0]
    s = tnqs.siteinds("S=1/2", g, inds_per_site=2)
    psi_I = tnqs.identity_tensornetworkstate(g, s, dtype=np.complex128)
    psi0 = psi_I.copy()
    psi0.set_preserve(vz, (psi0[vz] * psi0._adapt_like(op("Z", s[vz][0]))).noprime())
    ak = dict(maxdim=4, cutoff=1e-14, normalize_tensors=False)
    psi0 = tnqs.normalize(psi0, alg="bp")
    psi = psi0.copy()
    bpc = tnqs.BeliefPropagationCache(psi)
    h, J, dt = -1.0, -1.0, 0.04
    layer = []
    layer += [op("Rz", s[v][0], -h * dt) * op("Rz", s[v][1], h * dt) for v in g.vertices()]
    for group in tnqs.edge_color(g, 4):
        for (u, v) in group:
            layer.append(
                op("Rxx", [s[u][0], s[v][0]], -2 * J * dt)
                * op("Rxx", [s[u][1], s[v][1]], 2 * J * dt)
            )
    layer += [op("Rz", s[v][0], -h * dt) * op("Rz", s[v][1], h * dt) for v in g.vertices()]
    fro, tr_t, tr_t0 = [], [], []
    for _ in range(10):
        bpc, _ = tnqs.apply_gates(layer, bpc, apply_kwargs=ak)
        bpc.rescale_()
        fro.append(float(np.real(bpc.partitionfunction())))
        psi_t = bpc.network
        tr_t.append(float(np.real(tnqs.inner(psi_t, psi_I, alg="bp"))))
        tr_t0.append(float(np.real(tnqs.inner(psi_t, psi0, alg="bp"))))
    _write(
        "heisenberg_picture",
        {
            "config": {
                "lattice": "named_grid(4,4)",
                "h": h,
                "J": J,
                "dt": dt,
                "maxdim": 4,
                "cutoff": 1e-14,
                "steps": 10,
                "vz": list(vz),
                "dtype": "complex128",
            },
            "frobenius_norm": fro,
            "tr_Ot": tr_t,
            "tr_Ot_O0": tr_t0,
        },
    )


if __name__ == "__main__":
    import time

    for fn in (
        gen_tfim5x5,
        gen_cubic333,
        gen_loopcorrections,
        gen_thermal,
        gen_heisenberg_picture,
        gen_eagle127,
    ):
        t0 = time.time()
        fn()
        print(f"  {fn.__name__}: {time.time() - t0:.1f}s")
