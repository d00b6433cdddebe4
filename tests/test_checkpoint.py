"""Checkpoint / resume round-trips.

The oracle is exactness: a restored object must produce bit-identical tensors
and identical downstream numerics (partition functions, expectation values)
to the original — including shared bond-index identity between a network and
its BP messages (the property that makes a restored cache contractible).
"""

import numpy as np
import pytest

import tnqs
from tnqs.checkpoint import (
    load_bp_cache,
    load_engine,
    load_state,
    save_bp_cache,
    save_engine,
    save_state,
)


def test_state_roundtrip(tmp_path, rng):
    g = tnqs.named_grid((3, 3))
    psi = tnqs.random_tensornetworkstate(g, bond_dimension=3, dtype=np.complex128, rng=rng)
    p = tmp_path / "psi.npz"
    save_state(psi, p)
    psi2 = load_state(p)
    assert psi2.vertices() == psi.vertices()
    for v in psi.vertices():
        np.testing.assert_array_equal(np.asarray(psi2[v].data), np.asarray(psi[v].data))
    # bond identity is relational: shared edges restore to shared indices
    for e in psi.edges():
        assert psi2.virtualind(e).dim == psi.virtualind(e).dim
    z1 = tnqs.norm_sqr(psi, alg="exact")
    z2 = tnqs.norm_sqr(psi2, alg="exact")
    assert np.isclose(z1, z2)


def test_tensornetwork_roundtrip(tmp_path, rng):
    g = tnqs.named_grid((2, 3))
    tn = tnqs.random_tensornetwork(g, bond_dimension=2, rng=rng)
    p = tmp_path / "tn.npz"
    save_state(tn, p)
    tn2 = load_state(p)
    assert type(tn2).__name__ == "TensorNetwork"
    z1 = tnqs.contract(tn, alg="exact")
    z2 = tnqs.contract(tn2, alg="exact")
    assert np.isclose(z1, z2)


def test_bp_cache_roundtrip(tmp_path, rng):
    g = tnqs.named_comb_tree((3, 2))
    psi = tnqs.random_tensornetworkstate(g, bond_dimension=2, dtype=np.float64, rng=rng)
    bpc = tnqs.BeliefPropagationCache(psi)
    bpc.update()
    p = tmp_path / "bpc.npz"
    save_bp_cache(bpc, p)
    bpc2 = load_bp_cache(p)
    # messages restored and contractible against the restored network
    z1 = bpc.partitionfunction()
    z2 = bpc2.partitionfunction()
    assert np.isclose(z1, z2, rtol=1e-12)
    obs = [("Z", [g.vertices()[0]])]
    e1 = tnqs.expect(bpc, obs)
    e2 = tnqs.expect(bpc2, obs)
    assert np.isclose(e1[0], e2[0], rtol=1e-12)


def test_engine_roundtrip(tmp_path):
    import jax.numpy as jnp

    from tnqs.engine import LatticeEngine
    from tnqs.models import heavy_hex_kicked_ising_layer

    g = tnqs.heavy_hexagonal_lattice(2, 2)
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)
    layer = heavy_hex_kicked_ising_layer(g, float(np.pi / 4), 0.4)
    eng = LatticeEngine(psi, chi=4, dtype=jnp.complex64)
    eng.evolve(layer, num_layers=2, cutoff=1e-12, bp_maxiter=10)
    p = tmp_path / "eng.npz"
    save_engine(eng, p)
    eng2 = load_engine(p)
    assert eng2.chi == eng.chi and eng2.d == eng.d
    for k in eng.T:
        np.testing.assert_array_equal(np.asarray(eng2.T[k]), np.asarray(eng.T[k]))
    np.testing.assert_array_equal(np.asarray(eng2.M), np.asarray(eng.M))
    z1 = eng.expect_1site("Z")
    z2 = eng2.expect_1site("Z")
    for v in z1:
        assert np.isclose(z1[v], z2[v])


def test_engine_roundtrip_color_schedule(tmp_path):
    """bp_schedule='color' orders edge ids/buckets differently than the
    default 'wavefront'; the checkpoint must restore the same plan or the
    packed rows come back silently permuted (ADVICE r1, medium)."""
    import jax.numpy as jnp

    from tnqs.engine import LatticeEngine
    from tnqs.models import heavy_hex_kicked_ising_layer

    g = tnqs.heavy_hexagonal_lattice(2, 2)
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)
    layer = heavy_hex_kicked_ising_layer(g, float(np.pi / 4), 0.4)
    eng = LatticeEngine(
        psi, chi=4, dtype=jnp.complex64, bp_schedule="color", factor_method="direct"
    )
    eng.evolve(layer, num_layers=2, cutoff=1e-12, bp_maxiter=10)
    p = tmp_path / "eng_color.npz"
    save_engine(eng, p)
    eng2 = load_engine(p)
    assert eng2.plan.bp_schedule == "color"
    assert eng2.factor_method == "direct"
    assert eng2.plan.edge_ids == eng.plan.edge_ids
    z1, z2 = eng.expect_1site("Z"), eng2.expect_1site("Z")
    for v in z1:
        assert np.isclose(z1[v], z2[v])


def test_version_guard(tmp_path, rng):
    g = tnqs.named_path_graph(3)
    psi = tnqs.random_tensornetworkstate(g, bond_dimension=2, rng=rng)
    p = tmp_path / "psi.npz"
    save_state(psi, p)
    import json

    import numpy as _np

    data = dict(_np.load(p, allow_pickle=False))
    hdr = json.loads(bytes(data["__meta__"].tobytes()).decode())
    hdr["version"] = 999
    data["__meta__"] = _np.frombuffer(json.dumps(hdr).encode(), dtype=_np.uint8)
    _np.savez(p, **data)
    with pytest.raises(ValueError, match="newer"):
        load_state(p)
