"""Form tests (mirrors reference `test/test_forms.jl`)."""

import numpy as np
import pytest

from tnqs.bp import BeliefPropagationCache, default_bp_update_kwargs
from tnqs.forms import BilinearForm, QuadraticForm
from tnqs.graphs import named_comb_tree, named_grid
from tnqs.measure import inner, norm_sqr
from tnqs.networks import random_tensornetworkstate, siteinds

DTYPES = [np.float64, np.complex128]


@pytest.mark.parametrize("dtype", DTYPES)
def test_quadraticform_partitionfunction_equals_norm_sqr(dtype, rng):
    g = named_comb_tree((3, 2))
    psi = random_tensornetworkstate(g, "S=1/2", bond_dimension=2, dtype=dtype, rng=rng)
    qf = QuadraticForm(psi)
    cache = BeliefPropagationCache(qf).update(maxiter=1)
    z = cache.partitionfunction()
    nsq = norm_sqr(psi, alg="exact")
    assert abs(z - nsq) / abs(nsq) < 1e-9


@pytest.mark.parametrize("dtype", DTYPES)
def test_bilinearform_equals_inner_on_tree(dtype, rng):
    g = named_comb_tree((3, 2))
    s = siteinds("S=1/2", g)
    psi = random_tensornetworkstate(g, s, bond_dimension=2, dtype=dtype, rng=rng)
    phi = random_tensornetworkstate(g, s, bond_dimension=3, dtype=dtype, rng=rng)
    ip_exact = inner(psi, phi, alg="exact")
    ip_bp = inner(psi, phi, alg="bp", cache_update_kwargs=dict(maxiter=1))
    assert abs(ip_exact - ip_bp) / abs(ip_exact) < 1e-9


def test_bilinearform_conjugation(rng):
    g = named_comb_tree((2, 2))
    s = siteinds("S=1/2", g)
    psi = random_tensornetworkstate(g, s, bond_dimension=2, dtype=np.complex128, rng=rng)
    phi = random_tensornetworkstate(g, s, bond_dimension=2, dtype=np.complex128, rng=rng)
    ip = inner(psi, phi, alg="exact")
    ip_rev = inner(phi, psi, alg="exact")
    assert abs(ip - np.conj(ip_rev)) < 1e-10
