"""Expectation-value tests (mirrors reference `test/test_expect.jl`)."""

import numpy as np
import pytest

from tnqs.graphs import named_comb_tree, named_grid, named_hexagonal_lattice_graph
from tnqs.measure import expect
from tnqs.networks import random_tensornetworkstate


def test_bp_equals_exact_iff_tree(rng):
    # tree: BP exact
    g = named_comb_tree((3, 2))
    psi = random_tensornetworkstate(g, "S=1/2", bond_dimension=2, dtype=np.float64, rng=rng)
    v = (2, 2)
    sz_bp = expect(psi, ("Z", v), alg="bp")
    sz_ex = expect(psi, ("Z", v), alg="exact")
    assert abs(sz_bp - sz_ex) < 1e-10
    # loopy: BP is NOT exact (reference asserts inequality,
    # `test_expect.jl:27-29`)
    g2 = named_grid((3, 3))
    psi2 = random_tensornetworkstate(g2, "S=1/2", bond_dimension=2, dtype=np.float64, rng=rng)
    v2 = (2, 2)
    sz_bp2 = expect(psi2, ("Z", v2), alg="bp")
    sz_ex2 = expect(psi2, ("Z", v2), alg="exact")
    assert sz_bp2 != sz_ex2


def test_two_site_zz(rng):
    g = named_comb_tree((3, 3))
    psi = random_tensornetworkstate(g, "S=1/2", bond_dimension=2, dtype=np.complex128, rng=rng)
    obs = ("ZZ", [(2, 1), (2, 2)])
    zz_bp = expect(psi, obs, alg="bp")
    zz_ex = expect(psi, obs, alg="exact")
    assert abs(zz_bp - zz_ex) < 1e-9


def test_observable_forms(rng):
    g = named_grid((2, 2))
    psi = random_tensornetworkstate(g, "S=1/2", bond_dimension=2, rng=rng)
    # string form, vector form, coefficient
    a = expect(psi, ("Z", (1, 1)), alg="exact")
    b = expect(psi, (["Z"], [(1, 1)]), alg="exact")
    c = expect(psi, ("Z", (1, 1), 2.5), alg="exact")
    assert abs(a - b) < 1e-12
    assert abs(c - 2.5 * a) < 1e-12
    # zero coefficient short-circuits
    assert expect(psi, ("Z", (1, 1), 0.0), alg="exact") == 0.0
    # vector of observables
    out = expect(psi, [("Z", (1, 1)), ("X", (2, 2))], alg="bp")
    assert len(out) == 2


def test_hexagonal_lattice_bp(rng):
    g = named_hexagonal_lattice_graph(2, 2)
    psi = random_tensornetworkstate(g, "S=1/2", bond_dimension=2, dtype=np.float64, rng=rng)
    v = g.vertices()[len(g.vertices()) // 2]
    sz_bp = expect(psi, ("Z", v), alg="bp")
    sz_ex = expect(psi, ("Z", v), alg="exact")
    # loopy but close at small bond dimension
    assert abs(sz_bp - sz_ex) < 0.2
