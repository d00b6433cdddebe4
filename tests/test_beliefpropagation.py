"""BP cache tests (mirrors reference `test/test_beliefpropagation.jl`)."""

import numpy as np
import pytest

from tnqs.bp import BeliefPropagationCache, default_bp_update_kwargs
from tnqs.contraction import contract, contraction_sequence
from tnqs.graphs import named_comb_tree, named_grid
from tnqs.measure import norm_sqr, reduced_density_matrix
from tnqs.networks import random_tensornetwork, random_tensornetworkstate

DTYPES = [np.float32, np.float64, np.complex64, np.complex128]


def exact_norm_sqr(psi):
    facs = psi.norm_factors(psi.vertices())
    return contract(facs, sequence=contraction_sequence(facs, alg="greedy")).item()


@pytest.mark.parametrize("dtype", DTYPES)
def test_bp_exact_on_tree(dtype, rng):
    g = named_comb_tree((4, 3))
    psi = random_tensornetworkstate(g, "S=1/2", bond_dimension=3, dtype=dtype, rng=rng)
    bpc = BeliefPropagationCache(psi).update(**default_bp_update_kwargs(psi))
    # message count = 2 * E after a sweep
    assert len(bpc.messages) == 2 * g.ne()
    z = bpc.partitionfunction()
    exact = exact_norm_sqr(psi)
    tol = 10 * np.finfo(np.dtype(dtype).char.lower() if np.dtype(dtype).kind == "c" else dtype).eps
    assert abs(z - exact) / abs(exact) < max(tol, 1e-6 if np.dtype(dtype).itemsize <= 8 else 1e-12)


def test_bp_scalar_network_tree(rng):
    g = named_comb_tree((3, 2))
    tn = random_tensornetwork(g, bond_dimension=3, dtype=np.float64, rng=rng)
    ts = [tn[v] for v in tn.vertices()]
    exact = contract(ts, sequence=contraction_sequence(ts, alg="greedy")).item()
    z = BeliefPropagationCache(tn).update(maxiter=1).partitionfunction()
    assert abs(z - exact) / abs(exact) < 1e-12


def test_one_site_rdm_exact_on_tree(rng):
    g = named_comb_tree((4, 2))
    psi = random_tensornetworkstate(g, "S=1/2", bond_dimension=3, dtype=np.complex128, rng=rng)
    bpc = BeliefPropagationCache(psi).update(**default_bp_update_kwargs(psi))
    v = (2, 2)
    rho_bp = reduced_density_matrix(bpc, [v], alg="bp")
    rho_exact = reduced_density_matrix(psi, [v], alg="exact")
    m_bp = np.asarray(rho_bp.matricize([i for i in rho_bp.inds if i.plev == 0]))
    m_ex = np.asarray(rho_exact.matricize([i for i in rho_exact.inds if i.plev == 0]))
    assert np.allclose(m_bp, m_ex, atol=1e-10)


def test_seq_cache_lifecycle(rng):
    g = named_grid((3, 3))
    psi = random_tensornetworkstate(g, "S=1/2", bond_dimension=2, rng=rng)
    bpc = BeliefPropagationCache(psi)
    updated = bpc.update(maxiter=3)
    # sequences are invalidated after update (reference
    # `abstractbeliefpropagationcache.jl:253`)
    assert len(updated.seq_cache) == 0


def test_set_messages(rng):
    g = named_grid((2, 2))
    psi = random_tensornetworkstate(g, "S=1/2", bond_dimension=2, rng=rng)
    bpc = BeliefPropagationCache(psi)
    e = g.edges()[0]
    m = bpc.message(e)
    bpc.set_message(e, m * 2.0)
    assert np.allclose(np.asarray(bpc.message(e).data), 2 * np.asarray(m.data))
    bpc.delete_message(e)
    m2 = bpc.message(e)  # back to default
    assert np.allclose(np.asarray(m2.data), np.asarray(m.data))


def test_bp_convergence_warns(rng):
    g = named_grid((3, 3))
    psi = random_tensornetworkstate(g, "S=1/2", bond_dimension=2, rng=rng)
    bpc = BeliefPropagationCache(psi)
    with pytest.warns(UserWarning, match="did not converge"):
        bpc.update(maxiter=1, tolerance=1e-14)


def test_rescale_normalizes_local_scalars(rng):
    g = named_grid((3, 3))
    psi = random_tensornetworkstate(g, "S=1/2", bond_dimension=2, dtype=np.complex128, rng=rng)
    bpc = BeliefPropagationCache(psi).update(maxiter=30, tolerance=1e-12)
    bpc.rescale_()
    assert np.allclose(np.asarray(bpc.vertex_scalars(), dtype=complex), 1.0, atol=1e-10)
    assert np.allclose(np.asarray(bpc.edge_scalars(), dtype=complex), 1.0, atol=1e-10)


def test_loop_correlations_zero_on_tree(rng):
    g = named_comb_tree((3, 3))
    psi = random_tensornetworkstate(g, "S=1/2", bond_dimension=2, rng=rng)
    bpc = BeliefPropagationCache(psi).update(**default_bp_update_kwargs(psi))
    assert bpc.loop_correlations(4) == []


def test_loop_corrections_improve_z(rng):
    from tnqs.loopcorrections import loopcorrected_partitionfunction

    g = named_grid((3, 3))
    psi = random_tensornetworkstate(g, "S=1/2", bond_dimension=2, dtype=np.float64, rng=rng)
    exact = exact_norm_sqr(psi)
    bpc = BeliefPropagationCache(psi).update(maxiter=60, tolerance=1e-13)
    z_bp = bpc.partitionfunction()
    z_lc = loopcorrected_partitionfunction(bpc, 4)
    assert abs(z_lc - exact) < abs(z_bp - exact)


def test_native_loop_enumeration_matches_python():
    """The C++ subgraph enumerator must agree exactly with the Python one."""
    import tnqs.native as nat

    if not nat.have_native():
        import pytest

        pytest.skip("native library unavailable")
    import tnqs

    for g, mx in [
        (tnqs.named_grid((3, 3)), 8),
        (tnqs.named_ring_graph(6), 6),
        (tnqs.named_grid((2, 2, 2)), 8),
    ]:
        a = tnqs.leafless_edge_induced_subgraphs(g, mx)
        old = nat.LIB
        nat.LIB = None
        try:
            b = tnqs.leafless_edge_induced_subgraphs(g, mx)
        finally:
            nat.LIB = old
        sa = set(frozenset(frozenset(e) for e in s) for s in a)
        sb = set(frozenset(frozenset(e) for e in s) for s in b)
        assert sa == sb
