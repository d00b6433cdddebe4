"""Compiled-engine tests: the statically-shaped TPU tier must agree with the
flex tier (which is itself validated against exact contraction)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

import tnqs
from tnqs.engine import LatticeEngine
from tnqs.models import tfim_layer


@pytest.fixture(scope="module")
def tfim_setup():
    g = tnqs.named_grid((3, 3))
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex128)
    layer = tfim_layer(g, J=0.5, hx=1.0, dt=0.25, hz=0.8)
    return g, psi, layer


def test_engine_matches_flex_tfim(tfim_setup):
    g, psi, layer = tfim_setup
    nl = 3
    bpc = tnqs.BeliefPropagationCache(psi)
    errs_flex = None
    for _ in range(nl):
        bpc, errs_flex = tnqs.apply_gates(
            layer, bpc, apply_kwargs=dict(maxdim=4, cutoff=1e-10, normalize_tensors=True)
        )
    eng = LatticeEngine(psi, chi=4, dtype=jnp.complex128)
    eng.bp_update()
    errs = eng.evolve(layer, num_layers=nl, cutoff=1e-10, bp_maxiter=60)
    z_eng = eng.expect_1site("Z")
    for v in [(1, 1), (2, 2), (3, 2)]:
        z_flex = tnqs.expect(bpc, ("Z", v))
        assert abs(z_eng[v] - z_flex) < 1e-6, v
    assert abs(errs[-1].sum() - errs_flex.sum()) < 1e-8


def test_engine_state_roundtrip(tfim_setup):
    g, psi, layer = tfim_setup
    eng = LatticeEngine(psi, chi=4, dtype=jnp.complex128)
    eng.bp_update()
    eng.evolve(layer, num_layers=1, cutoff=1e-10)
    psi_out = eng.to_state()
    bpc = eng.to_bp_cache()
    # interop: flex BP on the engine's state + messages agrees with on-device
    z_flex = tnqs.expect(bpc, ("Z", (2, 2)))
    z_eng = eng.expect_1site("Z")[(2, 2)]
    assert abs(z_flex - z_eng) < 1e-8
    # flex evolution can continue from the engine state
    bpc2, errs = tnqs.apply_gates(layer, bpc, apply_kwargs=dict(maxdim=4, cutoff=1e-10))
    assert np.isfinite(errs).all()


def test_engine_bp_matches_flex_partition_function(rng):
    g = tnqs.named_grid((3, 3))
    psi = tnqs.random_tensornetworkstate(g, "S=1/2", bond_dimension=2, dtype=np.complex128, rng=rng)
    flex = tnqs.BeliefPropagationCache(psi).update(maxiter=60, tolerance=1e-12)
    z_flex = flex.partitionfunction()
    eng = LatticeEngine(psi, chi=2, dtype=jnp.complex128)
    eng.bp_update(maxiter=100, tolerance=1e-13)
    bpc = eng.to_bp_cache()
    z_eng = bpc.partitionfunction()
    assert abs(z_eng - z_flex) / abs(z_flex) < 1e-6


def test_engine_one_site_composition():
    # consecutive 1-site gates on the same vertex must compose
    g = tnqs.named_grid((2, 2))
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex128)
    circ = [("Rx", [v], 0.3) for v in g.vertices()] + [("Rz", [v], 0.7) for v in g.vertices()]
    eng = LatticeEngine(psi, chi=2, dtype=jnp.complex128)
    eng.bp_update()
    eng.evolve(circ, num_layers=1)
    psif, _ = tnqs.apply_gates(circ, psi, apply_kwargs={})
    z_eng = eng.expect_1site("Z")[(1, 1)]
    z_flex = tnqs.expect(psif, ("Z", (1, 1)), alg="bp")
    assert abs(z_eng - z_flex) < 1e-9


def test_engine_expect_2site_matches_flex(tfim_setup):
    g, psi, layer = tfim_setup
    eng = LatticeEngine(psi, chi=4, dtype=jnp.complex128)
    eng.bp_update(maxiter=20)
    eng.evolve(layer, num_layers=2, cutoff=1e-10, bp_maxiter=20)
    zz = eng.expect_2site("Z", "Z")
    xy = eng.expect_2site("X", "Y")
    bpc = eng.to_bp_cache()
    for e in g.edges():
        assert abs(zz[e] - tnqs.expect(bpc, ("ZZ", list(e)))) < 1e-10, e
        assert abs(xy[e] - tnqs.expect(bpc, ("XY", list(e)))) < 1e-10, e


def test_engine_imaginary_time_matches_flex():
    """Non-unitary (imaginary-time) gates: the compiled tier agrees with the
    flex tier to f32 truncation-path tolerance."""
    g = tnqs.named_grid((3, 3))
    tau = 0.1
    layer = [("Rx", [v], -2j * tau * 0.7) for v in g.vertices()]
    for grp in tnqs.edge_color(g):
        layer += [("Rzz", list(e), -2j * tau) for e in grp]
    psi = tnqs.tensornetworkstate(lambda v: [0.8, 0.6], g, "S=1/2", dtype=np.complex64)
    bpc = tnqs.BeliefPropagationCache(psi)
    for _ in range(4):
        bpc, _ = tnqs.apply_gates(
            layer, bpc, apply_kwargs=dict(maxdim=4, cutoff=1e-12, normalize_tensors=True)
        )
    eng = LatticeEngine(psi, chi=4, dtype=jnp.complex64)
    eng.bp_update(maxiter=20)
    eng.evolve(layer, num_layers=4, cutoff=1e-12, bp_maxiter=25)
    z_eng = eng.expect_1site("Z")
    for v in g.vertices():
        assert abs(z_eng[v] - tnqs.expect(bpc, ("Z", v))) < 1e-3, v


def test_engine_tree_with_leaves():
    """Degree-1 vertices (comb tree) through the compiled engine."""
    g = tnqs.named_comb_tree((3, 3))
    layer = [("Rx", [v], 0.3) for v in g.vertices()]
    for grp in tnqs.edge_color(g):
        layer += [("Rzz", list(e), 0.5) for e in grp]
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)
    bpc = tnqs.BeliefPropagationCache(psi)
    for _ in range(3):
        bpc, _ = tnqs.apply_gates(
            layer, bpc, apply_kwargs=dict(maxdim=4, cutoff=1e-12, normalize_tensors=True)
        )
    eng = LatticeEngine(psi, chi=4, dtype=jnp.complex64)
    eng.bp_update(maxiter=10)
    eng.evolve(layer, num_layers=3, cutoff=1e-12, bp_maxiter=10)
    z_eng = eng.expect_1site("Z")
    for v in g.vertices():
        assert abs(z_eng[v] - tnqs.expect(bpc, ("Z", v))) < 1e-5, v
