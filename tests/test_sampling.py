"""Sampling tests (mirrors reference `test/test_sampling.jl`)."""

import numpy as np
import pytest

from tnqs.graphs import named_grid, named_hexagonal_lattice_graph
from tnqs.measure import norm_sqr
from tnqs.networks import siteinds, tensornetworkstate
from tnqs.sampling import sample, sample_certified, sample_directly_certified


def test_product_state_sampling_deterministic(rng):
    g = named_hexagonal_lattice_graph(2, 2)
    psi = tensornetworkstate(lambda v: "↓", g, "S=1/2", dtype=np.float64)
    for alg, kwargs in (
        ("boundarymps", dict(projected_mps_bond_dimension=4, norm_mps_bond_dimension=4)),
        ("bp", {}),
    ):
        samples = sample(psi, 3, alg=alg, rng=rng, **kwargs)
        assert len(samples) == 3
        for s in samples:
            assert set(s.keys()) == set(g.vertices())
            assert all(b == 1 for b in s.values())


def test_ghz_sampling_and_certification(rng):
    g = named_grid((3, 3))
    s = siteinds("S=1/2", g)
    up = tensornetworkstate(lambda v: "↑", g, s)
    dn = tensornetworkstate(lambda v: "↓", g, s)
    ghz = up + dn
    # GHZ: bitstrings all-0 or all-1
    certified = sample_certified(
        ghz,
        5,
        alg="boundarymps",
        norm_mps_bond_dimension=4,
        projected_mps_bond_dimension=4,
        certification_mps_bond_dimension=4,
        gauge_state=False,
        rng=rng,
    )
    for c in certified:
        vals = set(c["bitstring"].values())
        assert vals == {0} or vals == {1}
    pq = np.array([c["poverq"] for c in certified])
    # std small, mean = norm_sqr (reference `test_sampling.jl:43-44`)
    assert pq.std() < 1e-8
    nsq = norm_sqr(ghz, alg="boundarymps", mps_bond_dimension=4)
    assert abs(pq.mean() - nsq) < 1e-6


def test_directly_certified(rng):
    g = named_grid((3, 3))
    psi = tensornetworkstate(lambda v: "+", g, "S=1/2", dtype=np.float64)
    out = sample_directly_certified(
        psi, 4, alg="boundarymps", norm_mps_bond_dimension=4, rng=rng
    )
    for r in out:
        assert set(r.keys()) == {"poverq", "logq", "bitstring"}
        assert abs(r["poverq"] - 1.0) < 1e-6  # product state: p == q
