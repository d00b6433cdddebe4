"""Network constructor tests (mirrors reference `test/test_constructors.jl`)."""

import numpy as np
import pytest

from tnqs.core.index import Index
from tnqs.core.tensor import Tensor, random_tensor
from tnqs.contraction import contract, contraction_sequence
from tnqs.graphs import (
    heavy_hexagonal_lattice,
    is_tree,
    named_comb_tree,
    named_grid,
    named_hexagonal_lattice_graph,
)
from tnqs.networks import (
    TensorNetwork,
    TensorNetworkState,
    identity_tensornetworkstate,
    random_tensornetwork,
    random_tensornetworkstate,
    siteinds,
    tensornetworkstate,
    zerostate,
)

DTYPES = [np.float32, np.float64, np.complex64, np.complex128]


def test_network_from_tensor_list_infers_graph(rng):
    # chain of tensors sharing bonds -> path graph
    a, b, c = Index(2), Index(3), Index(4)
    t1 = random_tensor([a], rng=rng)
    t2 = random_tensor([a, b], rng=rng)
    t3 = random_tensor([b, c], rng=rng)
    t4 = random_tensor([c], rng=rng)
    tn = TensorNetwork({1: t1, 2: t2, 3: t3, 4: t4})
    assert set(map(frozenset, tn.edges())) == {
        frozenset((1, 2)),
        frozenset((2, 3)),
        frozenset((3, 4)),
    }


@pytest.mark.parametrize("dtype", DTYPES)
def test_random_networks_all_dtypes(dtype, rng):
    g = named_grid((3, 3))
    tn = random_tensornetwork(g, bond_dimension=2, dtype=dtype, rng=rng)
    assert tn.dtype() == np.dtype(dtype)
    psi = random_tensornetworkstate(g, "S=1/2", bond_dimension=2, dtype=dtype, rng=rng)
    assert psi.dtype() == np.dtype(dtype)
    assert psi.maxvirtualdim() == 2
    for v in psi.vertices():
        assert len(psi.siteinds(v)) == 1
        assert psi.siteinds(v)[0].dim == 2


def test_dag_prime_involution_vs_exact(rng):
    g = named_comb_tree((3, 2))
    psi = random_tensornetworkstate(g, "S=1/2", bond_dimension=2, dtype=np.complex128, rng=rng)
    # <psi|psi> from norm factors is real positive
    facs = psi.norm_factors(psi.vertices())
    seq = contraction_sequence(facs, alg="greedy")
    z = contract(facs, sequence=seq).item()
    assert abs(z.imag) < 1e-10 * abs(z)
    assert z.real > 0


def test_rem_vertex(rng):
    g = named_grid((3, 3))
    tn = random_tensornetwork(g, bond_dimension=2, rng=rng)
    tn.rem_vertex((2, 2))
    assert not tn.graph.has_vertex((2, 2))
    assert tn.graph.nv() == 8


def test_siteinds_shape():
    g = named_grid((3, 3))
    s = siteinds("S=1/2", g)
    assert len(s) == 9
    s2 = siteinds("S=1", g, inds_per_site=2)
    assert all(len(v) == 2 and v[0].dim == 3 for v in s2.values())


def test_ghz_via_addition_entropy():
    """GHZ = |0...0> + |1...1>; BP bond entropy must equal log 2
    (reference `test_constructors.jl:69-74`)."""
    from tnqs.measure import renyi_entropy

    g = named_grid((3, 3))
    s = siteinds("S=1/2", g)
    up = tensornetworkstate(lambda v: "↑", g, s, dtype=np.float64)
    dn = tensornetworkstate(lambda v: "↓", g, s, dtype=np.float64)
    ghz = up + dn
    assert isinstance(ghz, TensorNetworkState)
    assert ghz.maxvirtualdim() == 2
    e = ghz.edges()[0]
    ent = renyi_entropy(ghz, e, alpha=1, alg="bp")
    assert abs(ent - np.log(2)) < 1e-8


def test_identity_tns_and_odd_index_error():
    g = named_grid((2, 2))
    ident = identity_tensornetworkstate(g)
    assert ident.maxvirtualdim() == 1
    s_odd = siteinds("S=1/2", g, inds_per_site=3)
    with pytest.raises(ValueError, match="Odd number"):
        identity_tensornetworkstate(g, s_odd)


def test_zerostate():
    g = named_grid((2, 3))
    psi = zerostate(g)
    from tnqs.measure import norm_sqr

    assert abs(norm_sqr(psi, alg="exact") - 1.0) < 1e-12


def test_lattice_generators():
    assert named_grid((5, 5)).nv() == 25
    assert named_grid((3, 3, 3), periodic=True).ne() == 81
    hh = heavy_hexagonal_lattice(5, 5)
    assert hh.has_vertex((11, 5))
    hexg = named_hexagonal_lattice_graph(3, 3)
    assert max(hexg.degree(v) for v in hexg.vertices()) == 3
    assert is_tree(named_comb_tree((4, 3)))
