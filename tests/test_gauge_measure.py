"""Gauging, normalization, overlaps, RDMs, full update, and BP diagnostics —
the measurement/transformation API surface of SURVEY.md §2.5-2.7 not already
covered by the per-cache test files.  Oracle: exact contraction / analytic
properties, as in the reference suite."""

import numpy as np
import pytest

import tnqs
from tnqs.core.tensor import Tensor


@pytest.fixture
def loopy_state(rng):
    g = tnqs.named_grid((3, 3))
    return g, tnqs.random_tensornetworkstate(g, bond_dimension=2, dtype=np.complex128, rng=rng)


def test_symmetric_gauge_diagonalizes_messages(loopy_state):
    g, psi = loopy_state
    bpc = tnqs.BeliefPropagationCache(psi)
    bpc.update()
    bpc = tnqs.symmetric_gauge_(bpc)
    # Vidal-gauge property: every message is diagonal (reference
    # `symmetric_gauge.jl:1-56` writes the singular values back as messages)
    for e, m in bpc.messages.items():
        mat = np.asarray(m.matricize([m.inds[0]]))
        off = mat - np.diag(np.diag(mat))
        assert np.max(np.abs(off)) < 1e-8 * max(1.0, np.max(np.abs(mat))), e
    # and the state itself is unchanged up to norm
    z_gauged = tnqs.norm_sqr(bpc.network, alg="exact")
    assert np.isfinite(z_gauged) and abs(z_gauged) > 0


def test_normalize_sets_local_scalars(loopy_state):
    g, psi = loopy_state
    psi_n = tnqs.normalize(psi, alg="bp")
    bpc = tnqs.BeliefPropagationCache(psi_n)
    bpc.update()
    z = bpc.partitionfunction()
    # re-converging BP on the normalized state lands near (not exactly at)
    # the rescaled fixed point on loopy graphs
    assert abs(z - 1.0) < 0.02


def test_inner_bp_equals_exact_on_tree(rng):
    g = tnqs.named_comb_tree((3, 2))
    s = tnqs.siteinds("S=1/2", g)
    psi = tnqs.random_tensornetworkstate(g, s, bond_dimension=2, dtype=np.complex128, rng=rng)
    phi = tnqs.random_tensornetworkstate(g, s, bond_dimension=2, dtype=np.complex128, rng=rng)
    ov_exact = tnqs.inner(psi, phi, alg="exact")
    ov_bp = tnqs.inner(psi, phi, alg="bp")
    assert abs(ov_exact - ov_bp) < 1e-8 * max(1.0, abs(ov_exact))


def test_rdm_bp_equals_exact_on_tree(rng):
    g = tnqs.named_comb_tree((3, 2))
    psi = tnqs.random_tensornetworkstate(g, bond_dimension=2, dtype=np.float64, rng=rng)
    v = g.vertices()[0]
    rho_bp = tnqs.rdm_matrix(tnqs.reduced_density_matrix(psi, [v], alg="bp"))
    rho_ex = tnqs.rdm_matrix(tnqs.reduced_density_matrix(psi, [v], alg="exact"))
    assert np.max(np.abs(rho_bp - rho_ex)) < 1e-10
    assert abs(np.trace(rho_bp) - 1.0) < 1e-12


def test_entropy_wrappers(rng):
    # GHZ on a path: every bipartition has entropy log 2
    g = tnqs.named_path_graph(4)
    s = tnqs.siteinds("S=1/2", g)
    up = tnqs.tensornetworkstate(lambda v: "↑", g, s, dtype=np.float64)
    dn = tnqs.tensornetworkstate(lambda v: "↓", g, s, dtype=np.float64)
    ghz = up + dn
    S1 = tnqs.von_neumann_entanglement_entropy(ghz, [g.vertices()[0]], alg="exact")
    S2 = tnqs.second_renyi_entanglement_entropy(ghz, [g.vertices()[0]], alg="exact")
    assert abs(S1 - np.log(2)) < 1e-8
    assert abs(S2 - np.log(2)) < 1e-8


def test_full_update_matches_simple_update_untruncated(rng):
    # with no truncation and trivial environments the two reduce to the same
    # gate application (reference uses full_update for BMPS truncation)
    g = tnqs.named_path_graph(2)
    psi = tnqs.random_tensornetworkstate(g, bond_dimension=2, dtype=np.complex128, rng=rng)
    gate, _ = tnqs.to_tensor(("Rzz", [1, 2], 0.37), g, psi.siteinds())
    bpc = tnqs.BeliefPropagationCache(psi).update()
    envs = bpc.incoming_messages([1, 2])
    (t1, t2), _, _ = tnqs.simple_update(gate, [psi[1], psi[2]], envs=envs, maxdim=8)
    psi_su = psi.copy()
    psi_su[1] = t1
    psi_su[2] = t2
    t1f, t2f = tnqs.full_update(gate, psi, [1, 2], envs=envs, maxdim=8, nfullupdatesweeps=20)
    psi_fu = psi.copy()
    psi_fu[1] = t1f
    psi_fu[2] = t2f
    # compare via overlap (gauge freedom between the two factorizations)
    num = tnqs.inner(psi_su, psi_fu, alg="exact")
    den = np.sqrt(abs(tnqs.norm_sqr(psi_su, alg="exact")) * abs(tnqs.norm_sqr(psi_fu, alg="exact")))
    assert abs(abs(num) / den - 1.0) < 1e-8


def test_loop_correlations_detect_loopiness(rng):
    tree = tnqs.named_comb_tree((3, 2))
    ring = tnqs.named_ring_graph(6)
    psi_t = tnqs.random_tensornetworkstate(tree, bond_dimension=2, dtype=np.float64, rng=rng)
    psi_r = tnqs.random_tensornetworkstate(ring, bond_dimension=2, dtype=np.float64, rng=rng)
    bpc_t = tnqs.BeliefPropagationCache(psi_t).update()
    bpc_r = tnqs.BeliefPropagationCache(psi_r).update()
    corr_t = bpc_t.loop_correlations(3)
    corr_r = bpc_r.loop_correlations(6)
    # trees have no cycles -> no loop correlations; rings do
    assert len(corr_t) == 0 or np.max(np.abs(list(corr_t.values()) if isinstance(corr_t, dict) else corr_t)) < 1e-12
    assert len(corr_r) > 0
