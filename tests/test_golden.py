"""Golden parity gates (BASELINE.md accuracy bar).

Committed f64 reference trajectories for the five BASELINE benchmark configs
live in `tests/golden/golden_*.json` (generated once by
`tests/golden/generate_goldens.py`, flex tier, complex128, CPU — the same
role the Julia reference's test anchors play:
`/root/reference/test/test_expect.jl:33-35`,
`examples/heavyhexIsing_dynamics.jl:48-59`).  Every test here re-runs a
config and gates observables at the 1e-5 bar; the eagle127 test additionally
gates the *compiled engine* against the flex-tier golden, which is the
cross-implementation parity check (two independent execution tiers, one
semantics).
"""

import json
import pathlib

import numpy as np
import pytest

import tnqs
from tnqs.models import (
    heavy_hex_kicked_ising_layer,
    heisenberg_imaginary_time_gates,
)

GOLDEN = pathlib.Path(__file__).resolve().parent / "golden"
TOL = 1e-5


def load(name):
    return json.loads((GOLDEN / f"golden_{name}.json").read_text())


def test_tfim5x5_flex_matches_golden():
    gold = load("tfim5x5")
    c = gold["config"]
    g = tnqs.named_grid((5, 5))
    layer = [("Rx", [v], 2 * c["hx"] * c["dt"]) for v in g.vertices()]
    layer += [("Rz", [v], 2 * c["hz"] * c["dt"]) for v in g.vertices()]
    for group in tnqs.edge_color(g, 4):
        layer += [("Rzz", list(pair), 2 * c["J"] * c["dt"]) for pair in group]
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex128)
    bpc = tnqs.BeliefPropagationCache(psi)
    ak = dict(maxdim=c["maxdim"], cutoff=c["cutoff"], normalize_tensors=True)
    center = tuple(c["center"])
    for i in range(c["layers"]):
        bpc, e = tnqs.apply_gates(layer, bpc, apply_kwargs=ak)
        z = float(np.real(tnqs.expect(bpc, [("Z", [center])])[0]))
        assert abs(z - gold["z_center"][i]) < TOL
        assert abs(float(np.max(e)) - gold["max_gate_error"][i]) < TOL


def test_cubic333_flex_matches_golden():
    gold = load("cubic333")
    c = gold["config"]
    g = tnqs.named_grid((3, 3, 3), periodic=True)
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex128)
    bpc = tnqs.BeliefPropagationCache(psi)
    layer = [("Rz", [v], c["h"] * c["dt"]) for v in g.vertices()]
    for group in tnqs.edge_color(g, 7):
        layer += [("Rxx", list(pair), 2 * c["J"] * c["dt"]) for pair in group]
    layer += [("Rz", [v], c["h"] * c["dt"]) for v in g.vertices()]
    vc = tuple(c["center"])
    ak = dict(maxdim=c["maxdim"], cutoff=c["cutoff"], normalize_tensors=True)
    for i in range(c["layers"]):
        bpc, _ = tnqs.apply_gates(layer, bpc, apply_kwargs=ak)
        z = float(np.real(tnqs.expect(bpc, [("Z", [vc])])[0]))
        assert abs(z - gold["z_center"][i]) < TOL


def test_loopcorrections_match_golden():
    gold = load("loopcorrections")
    rng = np.random.default_rng(gold["config"]["seed"])
    for g, name in [
        (tnqs.named_hexagonal_lattice_graph(2, 2), "hexagonal"),
        (tnqs.named_grid((4, 4)), "square"),
    ]:
        entry = gold["lattices"][name]
        psi = tnqs.random_tensornetworkstate(
            g, bond_dimension=gold["config"]["chi"], rng=rng, dtype=np.float64
        )
        psi = tnqs.normalize(psi, alg="bp")
        bp = complex(tnqs.norm_sqr(psi, alg="bp"))
        loop = complex(
            tnqs.norm_sqr(
                psi,
                alg="loopcorrections",
                max_configuration_size=entry["max_configuration_size"],
            )
        )
        exact = complex(tnqs.norm_sqr(psi, alg="exact"))
        assert abs(bp - complex(*entry["norm_bp"])) < TOL
        assert abs(loop - complex(*entry["norm_loop_corrected"])) < TOL
        assert abs(exact - complex(*entry["norm_exact"])) < TOL
        # physics: the loop correction must tighten BP toward exact
        assert abs(loop - exact) < abs(bp - exact)


def test_thermal_free_energy_matches_golden_and_htse():
    gold = load("thermal")
    c = gold["config"]
    g = tnqs.named_hexagonal_lattice_graph(2, 2, periodic=True)
    s = tnqs.siteinds("S=1/2", g, inds_per_site=2)
    psi = tnqs.identity_tensornetworkstate(g, s, dtype=np.float64)
    bpc = tnqs.BeliefPropagationCache(psi).update()
    gates = heisenberg_imaginary_time_gates(g, s, c["J"], c["dbeta"])
    ak = dict(maxdim=c["maxdim"], cutoff=c["cutoff"], normalize_tensors=False)
    logz = -bpc.freenergy()
    bpc.rescale_()
    k = 0
    for i in range(1, c["steps"] + 1):
        bpc, _ = tnqs.apply_gates(gates, bpc, apply_kwargs=ak)
        logz -= bpc.freenergy()
        bpc.rescale_()
        if i % c["record_every"] == 0:
            f_bp = float(np.real(logz) / g.nv())
            assert abs(f_bp - gold["free_energy_density"][k]) < TOL
            # BASELINE accuracy anchor: BP free energy tracks 4th-order HTSE
            assert abs(f_bp - gold["htse_4th"][k]) < 2e-3
            k += 1
    assert k == len(gold["free_energy_density"])


def test_heisenberg_picture_matches_golden():
    from tnqs.gates import op

    gold = load("heisenberg_picture")
    c = gold["config"]
    g = tnqs.named_grid((4, 4))
    vz = tuple(c["vz"])
    s = tnqs.siteinds("S=1/2", g, inds_per_site=2)
    psi_I = tnqs.identity_tensornetworkstate(g, s, dtype=np.complex128)
    psi0 = psi_I.copy()
    psi0.set_preserve(vz, (psi0[vz] * psi0._adapt_like(op("Z", s[vz][0]))).noprime())
    ak = dict(maxdim=c["maxdim"], cutoff=c["cutoff"], normalize_tensors=False)
    psi0 = tnqs.normalize(psi0, alg="bp")
    bpc = tnqs.BeliefPropagationCache(psi0.copy())
    h, J, dt = c["h"], c["J"], c["dt"]
    layer = []
    layer += [op("Rz", s[v][0], -h * dt) * op("Rz", s[v][1], h * dt) for v in g.vertices()]
    for group in tnqs.edge_color(g, 4):
        for (u, v) in group:
            layer.append(
                op("Rxx", [s[u][0], s[v][0]], -2 * J * dt)
                * op("Rxx", [s[u][1], s[v][1]], 2 * J * dt)
            )
    layer += [op("Rz", s[v][0], -h * dt) * op("Rz", s[v][1], h * dt) for v in g.vertices()]
    for i in range(c["steps"]):
        bpc, _ = tnqs.apply_gates(layer, bpc, apply_kwargs=ak)
        bpc.rescale_()
        assert abs(float(np.real(bpc.partitionfunction())) - gold["frobenius_norm"][i]) < TOL
        psi_t = bpc.network
        assert abs(float(np.real(tnqs.inner(psi_t, psi_I, alg="bp"))) - gold["tr_Ot"][i]) < TOL
        assert abs(float(np.real(tnqs.inner(psi_t, psi0, alg="bp"))) - gold["tr_Ot_O0"][i]) < TOL


def test_eagle127_engine_f64_matches_golden():
    """THE cross-tier parity gate: the compiled engine (static shapes, packed
    buckets, batched BP) re-runs BASELINE config 2 — 20 kicked-Ising layers
    on the 127q Eagle lattice at chi=8 — at complex128/factor_method='direct'
    and must land within 1e-5 of the flex-tier golden trajectory."""
    import jax
    import jax.numpy as jnp

    from tnqs.engine import LatticeEngine

    gold = load("eagle127")
    c = gold["config"]
    g = tnqs.eagle_lattice()
    layer = heavy_hex_kicked_ising_layer(g, c["J"], c["theta_h"])
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex128)
    eng = LatticeEngine(psi, chi=c["maxdim"], dtype=jnp.complex128, factor_method="direct")
    central = tuple(c["central"])
    eng.evolve(layer, num_layers=c["layers"], cutoff=c["cutoff"], bp_maxiter=25)
    z = float(np.real(eng.expect_1site("Z")[central]))
    assert abs(z - gold["z_central"][-1]) < TOL


def test_eagle127_bmps_and_certified_sampling_match_golden():
    """BASELINE config 2 measurement stage: evolve 20 layers on the flex
    tier, then gate the boundary-MPS <Z> and the seeded certified-sampling
    stream against the golden (first 4 of the 50-sample golden stream —
    same seed, same draw order)."""
    gold = load("eagle127")
    c = gold["config"]
    g = tnqs.eagle_lattice()
    layer = heavy_hex_kicked_ising_layer(g, c["J"], c["theta_h"])
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex128)
    bpc = tnqs.BeliefPropagationCache(psi)
    ak = dict(maxdim=c["maxdim"], cutoff=c["cutoff"], normalize_tensors=True)
    central = tuple(c["central"])
    for i in range(c["layers"]):
        bpc, e = tnqs.apply_gates(layer, bpc, apply_kwargs=ak)
        assert abs(float(np.prod(1.0 - e)) - gold["layer_fidelity"][i]) < TOL
        z = float(np.real(tnqs.expect(bpc, [("Z", [central])])[0]))
        assert abs(z - gold["z_central"][i]) < TOL
    psi_t = bpc.network
    z_bmps = float(
        np.real(
            tnqs.expect(
                psi_t,
                [("Z", [central])],
                alg="boundarymps",
                mps_bond_dimension=c["mps_bond_dimension"],
            )[0]
        )
    )
    assert abs(z_bmps - gold["z_bmps_central"]) < TOL
    rng = np.random.default_rng(c["sample_seed"])
    # 2 samples (not the golden's 4) keep the suite budget: same seed and
    # draw order, so they still pin the full autoregressive stream prefix.
    cert = tnqs.sample_directly_certified(
        psi_t, 2, alg="boundarymps", norm_mps_bond_dimension=c["mps_bond_dimension"], rng=rng
    )
    for got, want in zip(cert, gold["first4_samples"]):
        assert abs(float(np.real(got["poverq"])) - want["poverq"]) < TOL
        assert int(got["bitstring"][central]) == want["bits_central"]
        assert int(sum(got["bitstring"].values())) == want["n_ones"]
    # certified-sampling sanity at the golden's recorded precision
    assert gold["pq_std"] < 1e-2 and abs(gold["pq_mean"] - 1.0) < 1e-2
