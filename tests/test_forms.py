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


def test_bilinearform_remaps_foreign_site_indices():
    """Two states built independently (same graph/dims, different Index
    objects) must still pair site legs: the constructor remaps the bra's
    site indices onto the ket's.  Without the remap the sandwich shares no
    site indices and exact contraction needs a d^(2 nv) intermediate."""
    import numpy as np

    import tnqs

    g = tnqs.named_grid((3, 2))
    rng = np.random.default_rng(5)
    ket = tnqs.random_tensornetworkstate(g, "S=1/2", bond_dimension=2, rng=rng, dtype=np.complex64)
    bra_shared = ket.map_tensors(lambda t: t * 1.0)  # same indices
    # independently-built bra: same values, fresh site indices
    bra_foreign = tnqs.random_tensornetworkstate(
        g, "S=1/2", bond_dimension=2, rng=np.random.default_rng(7), dtype=np.complex64
    )
    want = tnqs.inner(ket, ket, alg="exact")
    got = tnqs.inner(ket, bra_shared, alg="exact")
    assert abs(got - want) < 1e-6 * abs(want)
    # foreign indices: must contract tractably and give a finite overlap
    v = tnqs.inner(ket, bra_foreign, alg="exact")
    assert np.isfinite(v)
    # dims must still be validated
    g1 = tnqs.named_grid((3, 2))
    qutrit = tnqs.random_tensornetworkstate(
        g1, "S=1", bond_dimension=2, rng=np.random.default_rng(8), dtype=np.complex64
    )
    import pytest

    with pytest.raises(ValueError, match="site indices"):
        tnqs.inner(ket, qutrit, alg="exact")
