"""Gate application tests (mirrors reference `test/test_apply.jl`)."""

import numpy as np
import pytest

from tnqs.apply import apply_gates
from tnqs.bp import BeliefPropagationCache, default_bp_update_kwargs
from tnqs.gates import register_alias, register_gate, unregister_gate, gate_matrix
from tnqs.graphs import build_graph_from_circuit, edge_color, named_grid
from tnqs.measure import expect, norm_sqr
from tnqs.networks import tensornetworkstate, zerostate


def test_build_graph_from_circuit():
    circ = [("Rzz", [(1, 1), (1, 2)], 0.1), ("Rzz", [(1, 2), (2, 2)], 0.1), ("Rx", [(1, 1)], 0.3),
            ("Rzz", [(2, 2), (2, 1)], 0.1), ("Rzz", [(2, 1), (1, 1)], 0.1)]
    g = build_graph_from_circuit(circ)
    assert g.nv() == 4 and g.ne() == 4
    with pytest.raises(ValueError, match="not connected"):
        build_graph_from_circuit([("Rzz", [1, 2], 0.1), ("Rzz", [3, 4], 0.1)])


def test_tfim_layer_preserves_norm_and_maxdim(rng):
    g = named_grid((3, 3))
    psi = tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex128)
    layer = [("Rx", [v], 0.3) for v in g.vertices()]
    for ce in edge_color(g, 4):
        layer += [("Rzz", pair, 0.2) for pair in ce]
    maxdim = 4
    psi2, errs = apply_gates(
        layer * 4, psi, apply_kwargs=dict(maxdim=maxdim, cutoff=1e-12, normalize_tensors=True)
    )
    assert psi2.maxvirtualdim() <= maxdim
    assert np.all(errs >= 0)
    # state norm should remain finite/positive and BP-normalizable
    n = norm_sqr(psi2, alg="bp")
    assert np.isfinite(abs(n)) and abs(n) > 0
    # unitarity: exact <Z> from circuit equals statevector result on small lattice
    sz = expect(psi2, ("Z", (2, 2)), alg="exact")
    assert abs(np.imag(sz)) < 1e-8
    assert -1.0 <= np.real(sz) <= 1.0


def test_apply_via_cache_matches_state_path(rng):
    g = named_grid((2, 3))
    psi = tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex128)
    layer = [("Rx", [v], 0.37) for v in g.vertices()]
    for ce in edge_color(g, 4):
        layer += [("Rzz", pair, 0.23) for pair in ce]
    apply_kwargs = dict(maxdim=8, cutoff=1e-12)
    psi_a, _ = apply_gates(layer, psi, apply_kwargs=apply_kwargs)
    bpc = BeliefPropagationCache(psi).update(**default_bp_update_kwargs(psi))
    bpc_b, _ = apply_gates(layer, bpc, apply_kwargs=apply_kwargs)
    za = expect(psi_a, ("Z", (1, 2)), alg="exact")
    zb = expect(bpc_b.network, ("Z", (1, 2)), alg="exact")
    assert abs(za - zb) < 1e-9


def test_two_site_gate_requires_adjacency():
    g = named_grid((2, 2))
    psi = zerostate(g)
    with pytest.raises(ValueError, match="non-adjacent"):
        apply_gates([("Rzz", [(1, 1), (2, 2)], 0.1)], psi, apply_kwargs={})


def test_gate_registry_end_to_end():
    # custom gate registration (reference `test_apply.jl:56-106`)
    mat = gate_matrix("Rzz", 0.4)
    register_gate("MyZZ", lambda t: gate_matrix("Rzz", t), num_qubits=2, num_params=1)
    register_alias("myzz_alias", "MyZZ")
    g = named_grid((1, 2))
    psi = zerostate(g, dtype=np.complex128)
    psi1, _ = apply_gates([("MyZZ", [(1, 1), (1, 2)], 0.4)], psi, apply_kwargs={})
    psi2, _ = apply_gates([("myzz_alias", [(1, 1), (1, 2)], 0.4)], psi, apply_kwargs={})
    psi3, _ = apply_gates([("Rzz", [(1, 1), (1, 2)], 0.4)], psi, apply_kwargs={})
    z1 = expect(psi1, ("Z", (1, 1)), alg="exact")
    z2 = expect(psi2, ("Z", (1, 1)), alg="exact")
    z3 = expect(psi3, ("Z", (1, 1)), alg="exact")
    assert abs(z1 - z3) < 1e-12 and abs(z2 - z3) < 1e-12
    # locked builtins
    with pytest.raises(ValueError, match="built-in"):
        register_gate("Rzz", mat)
    with pytest.raises(ValueError, match="built-in"):
        unregister_gate("Rzz")
    unregister_gate("MyZZ")
    with pytest.raises(ValueError, match="Unknown gate"):
        apply_gates([("MyZZ", [(1, 1), (1, 2)], 0.4)], psi, apply_kwargs={})


def test_unknown_gate_suggestions():
    g = named_grid((1, 2))
    psi = zerostate(g)
    with pytest.raises(ValueError, match="Did you mean"):
        apply_gates([("Rzx", [(1, 1)], 0.1)], psi, apply_kwargs={})


def test_pauli_string_gate():
    g = named_grid((1, 2))
    psi = zerostate(g, dtype=np.complex128)
    psi2, _ = apply_gates([("XX", [(1, 1), (1, 2)])], psi, apply_kwargs={})
    z = expect(psi2, ("Z", (1, 1)), alg="exact")
    assert abs(z + 1.0) < 1e-12  # X|0> = |1> on both sites


def test_gate_conventions_vs_statevector():
    """One Trotter layer on 2 qubits vs dense statevector (qiskit conventions)."""
    import itertools

    g = named_grid((1, 2))
    psi = zerostate(g, dtype=np.complex128)
    theta, phi = 0.31, 0.57
    circuit = [("Rx", [(1, 1)], theta), ("Rzz", [(1, 1), (1, 2)], phi), ("Ry", [(1, 2)], 0.11)]
    psi2, _ = apply_gates(circuit, psi, apply_kwargs={}, update_cache=True)
    # dense reference
    state = np.zeros(4, dtype=complex)
    state[0] = 1.0
    rx = gate_matrix("Rx", theta)
    rzz = gate_matrix("Rzz", phi)
    ry = gate_matrix("Ry", 0.11)
    U = np.kron(np.eye(2), ry) @ rzz @ np.kron(rx, np.eye(2))
    state = U @ state
    z0 = state.conj() @ np.kron(np.array([[1, 0], [0, -1]]), np.eye(2)) @ state
    z_tn = expect(psi2, ("Z", (1, 1)), alg="exact")
    assert abs(z_tn - z0) < 1e-10


def test_tfim_circuit_vs_from_scratch_statevector():
    """Independent oracle for the full evolve->measure chain: 3 kicked-Ising
    Trotter layers on a 2x3 grid (6 qubits) against a dense statevector
    built from explicit cos/sin matrices — no tnqs gate registry, no TN
    machinery, nothing from the repo's own numerics on the reference side.

    Without truncation (Rzz is bond-rank 2, so chi=2^3=8 is exact) the
    simple-update evolution is exact regardless of BP convergence (the env
    gauge cancels, reference `simple_update.jl:38-64`), so flex evolution,
    exact contraction, AND the compiled engine must all match the dense
    result to f64 precision."""
    J, h = 0.39, 0.23
    g = named_grid((2, 3))
    verts = g.vertices()
    n = len(verts)
    pos = {v: i for i, v in enumerate(verts)}

    # -- dense statevector from scratch (explicit matrices) -------------
    I2 = np.eye(2)
    Z = np.diag([1.0, -1.0])
    X = np.array([[0.0, 1.0], [1.0, 0.0]])
    # qiskit convention: Rzz(t) = exp(-i t/2 Z x Z), Rx(t) = exp(-i t/2 X)
    rx = np.cos(h / 2) * I2 - 1j * np.sin(h / 2) * X

    def op_at(mat1q, i):
        out = np.array([[1.0 + 0j]])
        for k in range(n):
            out = np.kron(out, mat1q if k == i else I2)
        return out

    def rzz_at(i, j):
        zz = op_at(Z, i) @ op_at(Z, j)
        return (
            np.cos(J / 2) * np.eye(2**n) - 1j * np.sin(J / 2) * zz
        )

    state = np.zeros(2**n, dtype=complex)
    state[0] = 1.0
    layer = [("Rzz", e, J) for e in g.edges()] + [
        ("Rx", [v], h) for v in verts
    ]
    for _ in range(3):
        for e in g.edges():
            state = rzz_at(pos[e[0]], pos[e[1]]) @ state
        for v in verts:
            state = op_at(rx, pos[v]) @ state
    z_dense = {
        v: (state.conj() @ op_at(Z, pos[v]) @ state).real for v in verts
    }

    # -- flex tier -------------------------------------------------------
    psi = zerostate(g, dtype=np.complex128)
    bpc = BeliefPropagationCache(psi)
    for _ in range(3):
        bpc, _ = apply_gates(
            layer, bpc, apply_kwargs=dict(cutoff=0.0, maxdim=8)
        )
    psi3 = bpc.network
    for v in verts:
        assert abs(expect(psi3, ("Z", v), alg="exact") - z_dense[v]) < 1e-9

    # -- compiled engine tier ---------------------------------------------
    from tnqs.engine import LatticeEngine

    eng = LatticeEngine(
        zerostate(g, dtype=np.complex128), chi=8, dtype=np.complex128
    )
    eng.bp_update(maxiter=20)
    eng.evolve(layer, num_layers=3, cutoff=0.0, bp_maxiter=20)
    psi_e = eng.to_state()
    for v in verts:
        assert abs(expect(psi_e, ("Z", v), alg="exact") - z_dense[v]) < 1e-9
