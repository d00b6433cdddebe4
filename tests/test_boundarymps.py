"""Boundary-MPS tests (mirrors reference `test/test_boundarymps.jl`)."""

import numpy as np
import pytest

from tnqs.boundarymps import BoundaryMPSCache
from tnqs.graphs import named_grid, named_hexagonal_lattice_graph
from tnqs.measure import (
    contract_network,
    expect,
    norm_sqr,
    rdm_matrix,
    reduced_density_matrix,
    renyi_entropy,
)
from tnqs.networks import random_tensornetwork, random_tensornetworkstate

DTYPES = [np.float32, np.float64, np.complex64, np.complex128]


@pytest.mark.parametrize("dtype", DTYPES)
def test_norm_matches_exact_state(dtype, rng):
    g = named_grid((3, 3))
    psi = random_tensornetworkstate(g, "S=1/2", bond_dimension=2, dtype=dtype, rng=rng)
    exact = norm_sqr(psi, alg="exact")
    z = norm_sqr(psi, alg="boundarymps", mps_bond_dimension=16)
    rtol = 10 * np.finfo(np.dtype(dtype).char.lower() if np.dtype(dtype).kind == "c" else dtype).eps
    assert abs(z - exact) / abs(exact) < max(rtol, 1e-5)


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_partitionfunction_matches_exact_network(dtype, rng):
    g = named_grid((3, 3))
    tn = random_tensornetwork(g, bond_dimension=2, dtype=dtype, rng=rng)
    exact = contract_network(tn, alg="exact")
    z = contract_network(tn, alg="boundarymps", mps_bond_dimension=16)
    assert abs(z - exact) / abs(exact) < 1e-10


def test_seq_cache_cleared_after_update(rng):
    g = named_grid((3, 3))
    psi = random_tensornetworkstate(g, "S=1/2", bond_dimension=2, rng=rng)
    cache = BoundaryMPSCache(psi, 8)
    cache = cache.update()
    assert len(cache.seq_cache) == 0


def test_expect_accuracy_anchor(rng):
    """BMPS <Z> within 10*eps(float32) of exact at chi_mps=16 on 4x4
    lattices (reference `test_expect.jl:33-35`)."""
    for g in (named_grid((4, 4)), named_hexagonal_lattice_graph(2, 2), named_grid((1, 6))):
        psi = random_tensornetworkstate(g, "S=1/2", bond_dimension=2, dtype=np.float32, rng=rng)
        vs = sorted(g.vertices())
        v = vs[len(vs) // 2]
        sz_b = expect(psi, ("Z", v), alg="boundarymps", mps_bond_dimension=16)
        sz_e = expect(psi, ("Z", v), alg="exact")
        assert abs(sz_b - sz_e) < 10 * np.finfo(np.float32).eps


def test_rdm_and_entropy_same_row(rng):
    g = named_grid((3, 3))
    psi = random_tensornetworkstate(g, "S=1/2", bond_dimension=2, dtype=np.float64, rng=rng)
    vs = [(2, 1), (2, 2)]
    r_b = reduced_density_matrix(psi, vs, alg="boundarymps", mps_bond_dimension=16)
    r_e = reduced_density_matrix(psi, vs, alg="exact")
    assert np.allclose(rdm_matrix(r_b), rdm_matrix(r_e), atol=1e-10)
    for alpha in (1, 2):
        s_b = renyi_entropy(psi, vs, alg="boundarymps", alpha=alpha, mps_bond_dimension=16)
        s_e = renyi_entropy(psi, vs, alg="exact", alpha=alpha)
        assert abs(s_b - s_e) < 1e-8


def test_column_partitioning(rng):
    g = named_grid((3, 3))
    psi = random_tensornetworkstate(g, "S=1/2", bond_dimension=2, rng=rng)
    obs = ("ZZ", [(1, 2), (3, 2)])  # same column
    zz_b = expect(psi, obs, alg="boundarymps", mps_bond_dimension=16)
    zz_e = expect(psi, obs, alg="exact")
    assert abs(zz_b - zz_e) < 1e-8


def test_format_validation(rng):
    # 3D lattice cannot be row-partitioned into lines
    g = named_grid((2, 2, 2))
    psi = random_tensornetworkstate(g, "S=1/2", bond_dimension=2, rng=rng)
    with pytest.raises(ValueError, match="path"):
        BoundaryMPSCache(psi, 4)


def test_observable_alignment_error(rng):
    g = named_grid((3, 3))
    psi = random_tensornetworkstate(g, "S=1/2", bond_dimension=2, rng=rng)
    with pytest.raises(ValueError, match="aligned"):
        expect(psi, ("ZZ", [(1, 1), (2, 2)]), alg="boundarymps", mps_bond_dimension=8)
