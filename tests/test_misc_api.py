"""Property tests for API surface not covered by the per-subsystem files:
special-state constructors, graph algorithms, and core linalg."""

import numpy as np
import pytest

import tnqs
from tnqs.core.index import Index
from tnqs.core.tensor import Tensor


def test_ising_partitionfunction_matches_enumeration():
    # classical Ising Z(beta) on a 2x3 open grid vs brute-force enumeration
    beta = 0.37
    g = tnqs.named_grid((2, 3))
    tn = tnqs.ising_partitionfunction(g, beta)
    z_tn = tnqs.contract(tn, alg="exact")
    verts = g.vertices()
    edges = g.edges()
    z_ref = 0.0
    for conf in range(2 ** len(verts)):
        s = {v: 1 - 2 * ((conf >> i) & 1) for i, v in enumerate(verts)}
        e = -sum(s[u] * s[v] for (u, v) in edges)
        z_ref += np.exp(-beta * e)
    assert abs(complex(z_tn).real - z_ref) < 1e-8 * z_ref


def test_toriccode_groundstate_structure():
    psi = tnqs.toriccode_groundstate(3)
    assert psi.maxvirtualdim() == 2
    z = tnqs.norm_sqr(psi, alg="exact")
    assert np.isfinite(z) and abs(z) > 0
    # single-site magnetization vanishes in the toric-code ground state
    v = psi.vertices()[0]
    sz = tnqs.expect(psi, ("Z", v), alg="exact")
    assert abs(sz) < 1e-10


def test_lieb_lattice_counts():
    g = tnqs.lieb_lattice(5, 5)
    # odd x odd open Lieb lattice: grid minus every even-even site
    assert g.nv() == 25 - 4
    assert tnqs.is_connected(g)


def test_steiner_tree_properties():
    g = tnqs.named_grid((4, 4))
    terminals = [(1, 1), (4, 4), (1, 4)]
    st = tnqs.steiner_tree(g, terminals)
    assert tnqs.is_tree(st)
    for t in terminals:
        assert st.has_vertex(t)
    for (u, v) in st.edges():
        assert g.has_edge(u, v)


def test_a_star_shortest_on_grid():
    g = tnqs.named_grid((5, 5))
    path = tnqs.a_star(g, (1, 1), (5, 5))  # edge list
    assert path[0][0] == (1, 1) and path[-1][1] == (5, 5)
    assert len(path) == 8  # manhattan distance


def test_forest_cover_covers_all_edges():
    g = tnqs.named_grid((3, 3))
    forests = tnqs.forest_cover(g)
    covered = set()
    for f in forests:
        assert tnqs.is_tree(f) or all(
            tnqs.is_tree(sub) for sub in [f]
        )  # forests: acyclic
        for e in f.edges():
            covered.add(frozenset(e))
    assert covered == {frozenset(e) for e in g.edges()}


def test_core_linalg_roundtrips(rng):
    i, j = Index(6, "i"), Index(8, "j")
    t = Tensor((rng.normal(size=(6, 8)) + 1j * rng.normal(size=(6, 8))).astype(np.complex128), [i, j])
    # qr
    q, r = tnqs.qr(t, [i])
    rec = q * r
    assert np.max(np.abs(rec.permute([i, j]).to_numpy() - t.to_numpy())) < 1e-12
    # truncated svd
    out = tnqs.factorize_svd(t, [i], maxdim=3)
    lfac, rfac, err = out[0], out[1], out[-1]
    rec3 = (lfac * rfac).permute([i, j]).to_numpy()
    u, s, vh = np.linalg.svd(t.to_numpy(), full_matrices=False)
    best3 = (u[:, :3] * s[:3]) @ vh[:3]
    assert np.max(np.abs(rec3 - best3)) < 1e-10  # optimal rank-3 approx
    # eigh on a hermitian matrix tensor
    m = t.to_numpy() @ t.to_numpy().conj().T
    ip = i.prime()
    ht = Tensor(m, [i, ip])
    w, U, lp, e = tnqs.eigh(ht)
    Um = np.asarray(U.matricize([i]))
    rec_m = Um @ np.diag(np.asarray(w)) @ Um.conj().T
    assert np.max(np.abs(rec_m - m)) < 1e-10


def test_apply_circuit_alias(rng):
    g = tnqs.named_path_graph(3)
    psi = tnqs.zerostate(g, tnqs.siteinds("S=1/2", g), dtype=np.complex128)
    circuit = [("H", [1]), ("CNOT", [1, 2]), ("CNOT", [2, 3])]
    bpc, errs = tnqs.apply_circuit(circuit, tnqs.BeliefPropagationCache(psi), apply_kwargs=dict(maxdim=4))
    # GHZ state: <ZZ> = 1 on every bond, <Z> = 0
    assert abs(tnqs.expect(bpc, ("ZZ", [1, 2]))) > 0.99
    assert abs(tnqs.expect(bpc, ("Z", 1))) < 1e-6


def test_topology_and_list_constructors(rng):
    g = tnqs.topology_to_graph([(1, 2), (2, 3), (3, 1)])
    assert g.nv() == 3 and g.ne() == 3
    a, b, c = Index(2), Index(3), Index(2)
    ts = [
        Tensor(rng.normal(size=(2, 3)), [a, b]),
        Tensor(rng.normal(size=(3, 2)), [b, c]),
        Tensor(rng.normal(size=(2, 2)), [c, a]),
    ]
    tn = tnqs.tensornetwork_from_list(ts)
    assert tn.graph.ne() == 3
    z = tnqs.contract(tn, alg="exact")
    ref = np.einsum("ab,bc,ca->", *[np.asarray(t.data) for t in ts])
    assert abs(complex(z) - ref) < 1e-10


def test_eagle_lattice_is_ibm_eagle_geometry():
    """127 qubits / 144 couplers, heavy-hex degree profile of ibm_washington
    (the lattice of reference `examples/heavyhexIsing_dynamics.jl`'s paper)."""
    from collections import Counter

    g = tnqs.eagle_lattice()
    assert g.nv() == 127
    assert g.ne() == 144
    deg = Counter(len(g.neighbors(v)) for v in g.vertices())
    assert deg == {2: 89, 3: 36, 1: 2}
    assert tnqs.is_connected(g)


def test_edge_color_bipartite_is_optimal_and_k_contract():
    # heavy-hex lattices are subdivided graphs -> bipartite -> Delta-colorable
    for g in (tnqs.eagle_lattice(), tnqs.heavy_hexagonal_lattice(3, 3)):
        groups = tnqs.edge_color(g, 3)
        assert len(groups) == 3
        assert sum(len(c) for c in groups) == g.ne()
        for c in groups:  # proper: each class is a matching
            touched = [v for e in c for v in e]
            assert len(touched) == len(set(touched))
    # num_colors is a contract: raise when unsatisfiable (odd cycle needs 3)
    c5 = tnqs.named_ring_graph(5)
    assert len(tnqs.edge_color(c5)) == 3
    with pytest.raises(ValueError):
        tnqs.edge_color(c5, 2)


def test_map_virtualinds_preserves_state():
    """map_virtualinds with a sim() map detaches index identity but leaves
    every physical quantity unchanged (reference `map_virtualinds`,
    `abstracttensornetwork.jl:93-107`)."""
    rng = np.random.default_rng(3)
    g = tnqs.named_grid((2, 2))
    psi = tnqs.random_tensornetworkstate(g, "S=1/2", bond_dimension=2, rng=rng)
    mapped = psi.map_virtualinds(lambda inds: [i.sim() for i in inds])
    # same norm, same observables
    assert abs(
        tnqs.norm_sqr(psi, alg="exact") - tnqs.norm_sqr(mapped, alg="exact")
    ) < 1e-10
    v = psi.vertices()[0]
    assert abs(
        tnqs.expect(psi, ("Z", v), alg="exact")
        - tnqs.expect(mapped, ("Z", v), alg="exact")
    ) < 1e-10
    # virtual indices are now disjoint from the original's
    for e in psi.edges():
        old = set(psi.virtualinds(e))
        assert not old & set(mapped.virtualinds(e))
    # original untouched
    assert all(psi.virtualinds(e) for e in psi.edges())
    with pytest.raises(ValueError, match="same-dimension"):
        psi.map_virtualinds(lambda inds: [Index(7, "bad") for _ in inds])
