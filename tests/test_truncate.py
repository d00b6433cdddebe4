"""Truncation tests (mirrors reference `test/test_truncate.jl`)."""

import numpy as np
import pytest

from tnqs.apply import apply_gates
from tnqs.graphs import edge_color, named_grid
from tnqs.measure import inner, norm_sqr
from tnqs.networks import tensornetworkstate
from tnqs.truncate import truncate


def _entangled_state():
    g = named_grid((3, 3))
    psi = tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex128)
    layer = [("Rx", [v], 0.4) for v in g.vertices()]
    for ce in edge_color(g, 4):
        layer += [("Rzz", p, 0.7) for p in ce]
    psi, _ = apply_gates(layer * 3, psi, apply_kwargs=dict(maxdim=4, cutoff=1e-14))
    return psi


def _fidelity(a, b):
    ip = inner(a, b, alg="exact")
    return abs(ip) ** 2 / (abs(norm_sqr(a, alg="exact")) * abs(norm_sqr(b, alg="exact")))


def test_truncate_orderings():
    """fidelity(BMPS) >= fidelity(BP), both in [0, 1]
    (reference `test_truncate.jl:29-33`)."""
    psi = _entangled_state()
    assert psi.maxvirtualdim() == 4
    t_bp = truncate(psi, alg="bp", maxdim=2)
    t_bm = truncate(psi, alg="boundarymps", maxdim=2, mps_bond_dimension=12)
    assert t_bp.maxvirtualdim() <= 2
    assert t_bm.maxvirtualdim() <= 2
    f_bp = _fidelity(t_bp, psi)
    f_bm = _fidelity(t_bm, psi)
    assert 0.0 <= f_bp <= 1.0 + 1e-8
    assert 0.0 <= f_bm <= 1.0 + 1e-8
    assert f_bm >= f_bp - 1e-6
