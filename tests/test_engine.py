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


def test_engine_operator_sites_match_flex():
    """Heisenberg-picture operator evolution (2-leg sites folded to d=4) on
    the engine must produce the same physical state as the flex tier
    (BASELINE workload 5; reference
    `examples/2dIsing_dynamics_Heisenbergpicture.jl`)."""
    from tnqs.gates import op
    from tnqs.models import operator_picture_layer

    g = tnqs.named_grid((2, 3))
    s = tnqs.siteinds("S=1/2", g, inds_per_site=2)
    psi_i = tnqs.identity_tensornetworkstate(g, s, dtype=np.complex64)
    vz = tnqs.center(g)[0]
    psi_i.set_preserve(vz, (psi_i[vz] * psi_i._adapt_like(op("Z", s[vz][0]))).noprime())
    psi_i = tnqs.normalize(psi_i, alg="bp")

    h, J, dt = -0.9, -1.1, 0.07
    named = [("Rz", [v], 2 * h * dt) for v in g.vertices()]
    for group in tnqs.edge_color(g, 4):
        named += [("Rxx", [u, v], 2 * J * dt) for (u, v) in group]

    # flex: ket leg gets U(-theta), bra leg U(+theta) (symmetric gates)
    flex_layer = []
    for (name, verts, theta) in named:
        if len(verts) == 1:
            flex_layer.append(
                op(name, s[verts[0]][0], -theta) * op(name, s[verts[0]][1], theta)
            )
        else:
            u, v = verts
            flex_layer.append(
                op(name, [s[u][0], s[v][0]], -theta)
                * op(name, [s[u][1], s[v][1]], theta)
            )
    bpc = tnqs.BeliefPropagationCache(psi_i.copy())
    apply_kwargs = dict(maxdim=8, cutoff=1e-12, normalize_tensors=True)
    for _ in range(2):
        bpc, _ = tnqs.apply_gates(flex_layer, bpc, apply_kwargs=apply_kwargs)
    psi_flex = bpc.network

    eng = LatticeEngine(psi_i.copy(), chi=8, dtype=jnp.complex64)
    assert eng.d == 4 and eng.site_legs == 2
    folded = operator_picture_layer(named, d0=2)
    eng.bp_update(maxiter=20)
    eng.evolve(folded, num_layers=2, cutoff=1e-12, bp_maxiter=20)
    psi_eng = eng.to_state()

    # same physical operator up to bond gauge + global phase: |<a|b>| ~ 1
    ov = tnqs.inner(psi_eng, psi_flex, alg="exact")
    na = tnqs.norm_sqr(psi_eng, alg="exact")
    nb = tnqs.norm_sqr(psi_flex, alg="exact")
    fid = abs(ov) / np.sqrt(abs(na) * abs(nb))
    assert abs(fid - 1.0) < 5e-5, fid


def test_evolve_ladder_matches_direct():
    """Rank-adaptive ladder (chi 2->4->8) must reproduce direct chi=8
    evolution exactly while layer ranks stay under each rung."""
    from tnqs.models import heavy_hex_kicked_ising_layer

    g = tnqs.heavy_hexagonal_lattice(2, 2)
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)
    layer = heavy_hex_kicked_ising_layer(g, float(np.pi / 5), 0.37)

    eng_a = LatticeEngine(psi, chi=8, dtype=jnp.complex64)
    eng_a.bp_update(maxiter=10)
    eng_a.evolve(layer, num_layers=3, cutoff=1e-12, bp_maxiter=10)
    za = eng_a.expect_1site("Z")

    eng_b = LatticeEngine(psi, chi=8, dtype=jnp.complex64)
    eng_b.bp_update(maxiter=10)
    eng_b, errs = eng_b.evolve_ladder(
        layer, num_layers=3, rungs=(2, 4), cutoff=1e-12, bp_maxiter=10
    )
    assert eng_b.chi == 8
    assert errs.shape[0] == 3
    zb = eng_b.expect_1site("Z")
    dz = max(abs(za[v] - zb[v]) for v in za)
    assert dz < 5e-5, dz


def test_layers_per_call_matches_sequential():
    """make_step(layers_per_call=N) (one dispatch, fori_loop body) must
    reproduce N sequential single-layer calls exactly."""
    import jax.numpy as jnp

    import tnqs
    from tnqs.engine import LatticeEngine
    from tnqs.models import tfim_layer

    g = tnqs.named_grid((3, 3))
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)
    layer = tfim_layer(g, J=0.5, hx=1.0, dt=0.3)
    eng1 = LatticeEngine(psi, chi=4, dtype=jnp.complex64)
    step1 = eng1.make_step(layer, cutoff=1e-10, bp_maxiter=8)
    T, M = eng1.T, eng1.M
    errs = []
    for _ in range(3):
        T, M, e = step1(T, M)
        errs.append(np.asarray(e))
    eng2 = LatticeEngine(psi, chi=4, dtype=jnp.complex64)
    step3 = eng2.make_step(layer, cutoff=1e-10, bp_maxiter=8, layers_per_call=3)
    T3, M3, e3 = step3(eng2.T, eng2.M)
    e3 = np.asarray(e3)
    assert e3.shape == (3, len(layer))
    np.testing.assert_allclose(e3, np.stack(errs), rtol=0, atol=1e-6)
    for k in T:
        np.testing.assert_allclose(
            np.asarray(T3[k]), np.asarray(T[k]), rtol=0, atol=1e-6
        )
    np.testing.assert_allclose(np.asarray(M3), np.asarray(M), rtol=0, atol=1e-6)


def test_engine_bond_entropies_match_flex(tfim_setup):
    """Compiled per-bond entropies (batched eigensolve over the on-device
    messages) against the flex tier's message-based bond entropy on the
    same converged cache — identical messages, identical spectra."""
    g, psi, layer = tfim_setup
    eng = LatticeEngine(psi, chi=4, dtype=jnp.complex128)
    eng.bp_update(maxiter=25)
    eng.evolve(layer, num_layers=2, cutoff=1e-10, bp_maxiter=25)
    s1 = eng.bond_entropies(alpha=1.0)
    s2 = eng.bond_entropies(alpha=2.0)
    bpc = eng.to_bp_cache()
    for e in g.edges():
        want1 = tnqs.renyi_entropy(bpc, e, alpha=1)
        want2 = tnqs.renyi_entropy(bpc, e, alpha=2)
        assert abs(s1[e] - want1) < 1e-8, (e, s1[e], want1)
        assert abs(s2[e] - want2) < 1e-8, (e, s2[e], want2)
        assert 0.0 <= s1[e] < np.log(4) + 1e-9  # chi=4 bond


def test_engine_freenergy_matches_flex(tfim_setup):
    """Compiled BP free energy / partition function against the flex cache
    built from the same state and messages."""
    g, psi, layer = tfim_setup
    eng = LatticeEngine(psi, chi=4, dtype=jnp.complex128)
    eng.bp_update(maxiter=25)
    eng.evolve(layer, num_layers=2, cutoff=1e-10, bp_maxiter=25)
    f_eng = eng.freenergy()
    z_eng = eng.partitionfunction()
    bpc = eng.to_bp_cache()
    f_flex = bpc.freenergy()
    assert abs(f_eng - f_flex) < 1e-8 * max(1.0, abs(f_flex))
    assert abs(z_eng - bpc.partitionfunction()) < 1e-8 * abs(z_eng)


def test_engine_normalize_rescale(tfim_setup):
    """After normalize(): every local BP scalar is 1, Z_BP = 1, and
    expectation values are unchanged (scalar invariance)."""
    g, psi, layer = tfim_setup
    eng = LatticeEngine(psi, chi=4, dtype=jnp.complex128)
    eng.bp_update(maxiter=25)
    eng.evolve(layer, num_layers=2, cutoff=1e-10, bp_maxiter=25)
    z_before = eng.expect_1site("Z")
    eng.normalize()
    assert abs(eng.freenergy()) < 1e-9
    assert abs(eng.partitionfunction() - 1.0) < 1e-9
    vs, es = eng._bp_scalars(eng.T, eng.M)
    import numpy as _np
    for k, q in vs.items():
        _np.testing.assert_allclose(_np.asarray(q), 1.0, atol=1e-10)
    _np.testing.assert_allclose(_np.asarray(es), 1.0, atol=1e-10)
    z_after = eng.expect_1site("Z")
    for v in g.vertices():
        assert abs(z_before[v] - z_after[v]) < 1e-9
    # flex cross-check: the exported state is BP-normalized too
    assert abs(tnqs.norm_sqr(eng.to_state(), alg="bp") - 1.0) < 1e-6


def test_engine_thermal_free_energy_matches_flex_and_htse():
    """Compiled imaginary-time thermal evolution: identity operator state
    (folded d=4 sites) + ket-leg Heisenberg gates + per-step freenergy/
    rescale accounting — the engine counterpart of the thermal example
    (reference `hexagonal_heisenbergmodel_thermalstate.jl`).  Compared
    step-for-step against the flex trajectory and against the 4th-order
    HTSE anchor."""
    from tnqs.models import (
        heisenberg_imaginary_time_gates,
        heisenberg_thermal_layer,
        htse_free_energy_density_4th,
    )

    J, dbeta, nsteps, chi = 1.0, 0.02, 6, 8
    g = tnqs.named_hexagonal_lattice_graph(2, 2, periodic=True)

    # flex trajectory
    s = tnqs.siteinds("S=1/2", g, inds_per_site=2)
    psi = tnqs.identity_tensornetworkstate(g, s, dtype=np.float64)
    bpc = tnqs.BeliefPropagationCache(psi).update()
    gates = heisenberg_imaginary_time_gates(g, s, J, dbeta)
    logz_flex = -bpc.freenergy()
    bpc.rescale_()
    for _ in range(nsteps):
        bpc, _ = tnqs.apply_gates(
            gates, bpc, apply_kwargs=dict(maxdim=chi, cutoff=1e-14, normalize_tensors=False)
        )
        logz_flex -= bpc.freenergy()
        bpc.rescale_()

    # engine trajectory
    psi_e = tnqs.identity_tensornetworkstate(g, s, dtype=np.float64)
    eng = LatticeEngine(psi_e, chi=chi, dtype=jnp.complex128)
    eng.bp_update(maxiter=30)
    layer = heisenberg_thermal_layer(g, J, dbeta)
    step = eng.make_step(layer, cutoff=1e-14, normalize=False, bp_maxiter=30)
    logz_eng = -eng.freenergy()
    eng.rescale()
    for _ in range(nsteps):
        eng.T, eng.M, _ = step(eng.T, eng.M)
        logz_eng -= eng.freenergy()
        eng.rescale()

    f_flex = np.real(logz_flex) / g.nv()
    f_eng = np.real(logz_eng) / g.nv()
    assert abs(f_eng - f_flex) < 1e-8, (f_eng, f_flex)
    beta = 2 * nsteps * dbeta
    f_htse = htse_free_energy_density_4th(J, beta)
    assert abs(f_eng - f_htse) < 5e-4, (f_eng, f_htse)


def test_engine_loopcorrected_z_matches_flex():
    """Compiled loop corrections (batched cycle transfer products) against
    the flex implementation on a random grid state, where the 4-cycle
    plaquette weights are LARGE (~5% of Z_BP) — a real test of the
    transfer algebra, not an agreement of zeros.  Also checks the
    physics: the loop-corrected Z is closer to the exact Z than BP."""
    rng = np.random.default_rng(7)
    g = tnqs.named_grid((3, 3))
    psi = tnqs.random_tensornetworkstate(
        g, "S=1/2", bond_dimension=3, dtype=np.complex128, rng=rng
    )
    eng = LatticeEngine(psi, chi=3, dtype=jnp.complex128)
    eng.bp_update(maxiter=60)
    z_eng = eng.loopcorrected_partitionfunction(4)
    z_bp = eng.partitionfunction()
    bpc = eng.to_bp_cache()
    z_flex = tnqs.loopcorrected_partitionfunction(bpc, 4)
    assert abs(z_eng - z_flex) < 1e-10 * abs(z_flex), (z_eng, z_flex)
    # correction is substantial on a random state
    assert abs(z_eng - z_bp) > 1e-3 * abs(z_bp)
    # tightening: loop-corrected Z beats BP against exact contraction
    z_ex = tnqs.norm_sqr(psi, alg="exact")
    assert abs(z_eng - z_ex) < 0.5 * abs(z_bp - z_ex)


def test_engine_loopcorrection_exact_on_ring():
    """Analytic anchor (no flex cross-check): on a single-cycle graph the
    loop expansion truncated at the full cycle is EXACT — Z_BP(1 + w_ring)
    equals the exact contraction to machine precision, while plain BP is
    off by ~1e-2 on a random state."""
    rng = np.random.default_rng(9)
    g = tnqs.named_ring_graph(6)
    psi = tnqs.random_tensornetworkstate(
        g, "S=1/2", bond_dimension=3, dtype=np.complex128, rng=rng
    )
    eng = LatticeEngine(psi, chi=3, dtype=np.complex128)
    eng.bp_update(maxiter=80)
    z_ex = complex(tnqs.norm_sqr(psi, alg="exact"))
    z_bp = eng.partitionfunction()
    z_loop = eng.loopcorrected_partitionfunction(6)
    assert abs(z_bp - z_ex) / abs(z_ex) > 1e-3      # BP alone is not exact
    assert abs(z_loop - z_ex) / abs(z_ex) < 1e-12   # BP + ring loop is
