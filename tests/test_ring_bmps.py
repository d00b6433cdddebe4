"""Compiled boundary-MPS on RING (periodic) column quotients — round-4
item 8 / round-3 missing #3.

The reference accepts ring quotient graphs (`boundarympscache.jl:69-81`,
`is_ring_graph`) — cylinder-class lattices: periodic across columns, each
column an open path.  The compiled tier handles them by initializing the
cut messages from the engine's BP bond environments as product MPSes and
relaxing with `ring_iters` Gauss-Seidel passes around the ring per
direction (zipup-class updates; the compiled counterpart of the
reference's quotient-BP outer loop).  Like BP on a loop, the converged
closure is exact only as correlations decay around the ring — the flex
FITTING tier (vertex-level planar BP, reference
`boundarympscache.jl:330-369`) converges to a tighter object and remains
the high-accuracy path; measured on the 6x3 cylinder below: compiled
zipup fixed point ~2e-3 from exact, flex fitting ~1e-6.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

import tnqs
from tnqs.bmps_engine import BMPSEngine, BMPSSampler
from tnqs.engine import LatticeEngine
from tnqs.models import tfim_layer


def _cylinder_engine(nx=6, ny=3, layers=2):
    g = tnqs.named_grid((nx, ny), periodic=(True, False))
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)
    eng = LatticeEngine(psi, chi=2, dtype=jnp.complex64)
    eng.bp_update(maxiter=10)
    if layers:
        eng.evolve(
            tfim_layer(g, J=0.5, hx=1.0, dt=0.3),
            num_layers=layers, cutoff=1e-10, bp_maxiter=10,
        )
    return g, eng


def test_named_grid_per_axis_periodic():
    g = tnqs.named_grid((4, 3), periodic=(True, False))
    edges = {frozenset(e) for e in g.edges()}
    assert frozenset({(4, 1), (1, 1)}) in edges  # x wraps
    assert frozenset({(1, 3), (1, 1)}) not in edges  # y does not
    with pytest.raises(ValueError, match="periodic"):
        tnqs.named_grid((4, 3), periodic=(True,))


def test_ring_plan_detected():
    g, eng = _cylinder_engine(layers=0)
    be = BMPSEngine(eng, rank=4)
    assert be.cplan.periodic
    assert len(be.cplan.cross) == 6  # nC cuts incl. the wrap cut
    # wrap cut oriented (last column, column 0)
    for (u, w) in be.cplan.cross[-1]:
        assert u[0] == 6 and w[0] == 1


def test_ring_bmps_product_state_exact():
    g, eng = _cylinder_engine(layers=0)
    z = BMPSEngine(eng, rank=4, ring_iters=2).expect_1site("Z")
    for v in g.vertices():
        assert abs(z[v].real - 1.0) < 1e-5, (v, z[v])


def test_ring_bmps_matches_exact_within_ring_envelope():
    g, eng = _cylinder_engine()
    psi_t = eng.to_state()
    z = BMPSEngine(eng, rank=16, ring_iters=4).expect_1site("Z")
    for v in list(g.vertices())[:6]:
        ze = float(np.real(tnqs.expect(psi_t, ("Z", v), alg="exact")))
        # zipup-class ring fixed point: winding-closure envelope (see module
        # docstring; measured ~2e-3 on this workload, gated at 3x)
        assert abs(z[v].real - ze) < 6e-3, (v, z[v].real, ze)


def test_ring_bmps_2site_and_rdm_run():
    g, eng = _cylinder_engine()
    pairs = [((1, 1), (1, 2))]
    zz = BMPSEngine(eng, rank=8, ring_iters=3).expect_2site("Z", "Z", pairs=pairs)
    assert np.isfinite(np.real(list(zz.values()))).all()
    rho = BMPSEngine(eng, rank=8, ring_iters=3).rdm([(1, 1)])
    assert abs(np.trace(rho) - 1.0) < 1e-6
    ze = float(np.real(tnqs.expect(eng.to_state(), ("Z", (1, 1)), alg="exact")))
    assert abs(float(np.real(rho[0, 0] - rho[1, 1])) - ze) < 6e-3


def test_ring_guards():
    g, eng = _cylinder_engine(layers=0)
    be = BMPSEngine(eng, rank=4)
    # doubled-q ring sampling is supported (tests below); the factored-q
    # mode and independent re-certification are the remaining flex-only
    # paths (the wrap-cut cap is a doubled-layer object)
    with pytest.raises(NotImplementedError, match="factored-q"):
        BMPSSampler(be, q_mode="factored")
    with pytest.raises(NotImplementedError, match="re-certification"):
        BMPSSampler(be).sample_certified(2)


def test_sharded_ring_expect_matches_unsharded():
    """Ring plans through the device-ring pipeline (round-4 verdict missing
    #2, last piece): the banded Gauss-Seidel relay converges to the same
    fixed-point class as the unsharded loop (each message winds
    `ring_iters` times; only the seeds differ), so per-vertex <Z> must
    agree within the winding-decay envelope — and both within the ring
    envelope of exact."""
    from tnqs.parallel.bmps_ring import ShardedBMPS
    from tnqs.parallel.mesh import make_mesh

    g, eng = _cylinder_engine()
    be = BMPSEngine(eng, rank=16, ring_iters=4)
    z0 = be.expect_1site("Z")
    psi_t = eng.to_state()
    for D in (2, 3):
        z = ShardedBMPS(be, make_mesh(D)).expect_1site("Z")
        assert set(z) == set(z0)
        for v in g.vertices():
            assert abs(z[v].real - z0[v].real) < 2e-3, (D, v, z[v], z0[v])
        for v in list(g.vertices())[:4]:
            ze = float(np.real(tnqs.expect(psi_t, ("Z", v), alg="exact")))
            assert abs(z[v].real - ze) < 6e-3, (D, v, z[v].real, ze)


def test_sharded_ring_sampler():
    """Data-parallel certified sampling on a ring plan: the sharded key
    batch must reproduce the unsharded draws bit-identically (same fold_in
    keys) with certificates at 1."""
    from tnqs.parallel.bmps_ring import ShardedSampler
    from tnqs.parallel.mesh import make_mesh

    g, eng = _cylinder_engine()
    sam = BMPSSampler(BMPSEngine(eng, rank=8, ring_iters=3), proj_rank=8)
    ref = sam.sample_directly_certified(4, seed=5)
    sam2 = BMPSSampler(BMPSEngine(eng, rank=8, ring_iters=3), proj_rank=8)
    out = ShardedSampler(sam2, make_mesh(2)).sample_directly_certified(4, seed=5)
    for a, b in zip(ref, out):
        assert a["bitstring"] == b["bitstring"]
        assert abs(a["poverq"] - b["poverq"]) < 1e-5 * max(1.0, abs(a["poverq"]))


def test_ring_sampler_product_state():
    """Product |↑...↑> on the cylinder: q(x) = delta_{x,0} and the direct
    certificate trace/ghost ratio is exactly 1 (the projected network IS
    the unprojected one when every site is deterministically ↑)."""
    g, eng = _cylinder_engine(layers=0)
    sam = BMPSSampler(BMPSEngine(eng, rank=4, ring_iters=2), proj_rank=4)
    out = sam.sample_directly_certified(4, seed=3)
    for o in out:
        assert abs(o["poverq"] - 1.0) < 1e-4
        assert all(b == 0 for b in o["bitstring"].values())


def test_ring_sampler_certificates_and_born_envelope():
    """Compiled ring sampling (round-4 verdict missing #2).  Two layers of
    validation against exact contraction of the bit-projected 6x3 state
    (reference sampler semantics: `/root/reference/src/sampling.jl:171-213`):

    1. Certificate consistency: ring certificates divide the per-sample
       trace by a ghost-reference scalar sharing the SAME wrap-cut caps
       (see `_build_norm`), so E_q[p/q] = 1 holds exactly and — because
       the drawing environments are the self-consistent ring fixed point —
       each individual p/q telescopes to 1 up to zip truncation.  A p/q
       away from 1 flags an under-ranked projected sweep, exactly like the
       line plan's constancy at N/Z_BP (`test_sampler_poverq_matches_exact_
       amplitudes`); independent re-certification stays flex-only on rings.
    2. Born-distribution envelope: the sampled measure q(x) equals the
       capped (ring-closure) amplitudes, not the exact Born distribution;
       measured at this config q(x)/p_Born(x) has mean within ~5% of 1
       and per-bitstring spread ~32% (amplitudes feel the winding error
       much more than averaged observables' ~2e-3).  Gated loose to pin
       the envelope class, not the exact values."""
    from tnqs.core.tensor import onehot
    from tnqs.networks import TensorNetwork

    g, eng = _cylinder_engine()
    st = eng.to_state()
    s = st.siteinds()
    nrm = abs(complex(tnqs.norm_sqr(st, alg="exact")))

    def p_exact(bitstring):
        proj = {}
        for v in st.vertices():
            P = st._adapt_like(onehot(s[v][0], bitstring[v]))
            proj[v] = st[v] * P
        amp = tnqs.contract_network(TensorNetwork(proj, st.graph.copy()), alg="exact")
        return abs(complex(amp)) ** 2

    sam = BMPSSampler(BMPSEngine(eng, rank=16, ring_iters=4), proj_rank=16)
    out = sam.sample_directly_certified(8, seed=7)
    pq = np.array([o["poverq"] for o in out])
    assert np.all(np.abs(pq - 1.0) < 1e-3), pq
    # q(x) vs Born: mean mass within the ring-closure envelope, and the
    # per-bitstring spread bounded (measured 0.955 / 0.32 at this config)
    ratios = np.array(
        [np.exp(o["logq"]) / (p_exact(o["bitstring"]) / nrm) for o in out]
    )
    assert abs(ratios.mean() - 1.0) < 0.15, ratios
    assert np.ptp(ratios) / ratios.mean() < 0.6, ratios


def test_ring_sampler_chunking_matches_full_vmap():
    g, eng = _cylinder_engine()
    sam = BMPSSampler(BMPSEngine(eng, rank=8, ring_iters=3), proj_rank=8)
    full = sam.sample_directly_certified(5, seed=11)
    chunked = sam.sample_directly_certified(5, seed=11, chunk=2)
    for a, b in zip(full, chunked):
        assert a["bitstring"] == b["bitstring"]
        assert abs(a["poverq"] - b["poverq"]) <= 1e-6 * abs(a["poverq"])


def test_line_plans_unchanged():
    """The ring additions must not disturb line-quotient behavior."""
    g = tnqs.named_grid((4, 3))
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)
    eng = LatticeEngine(psi, chi=2, dtype=jnp.complex64)
    eng.bp_update(maxiter=10)
    eng.evolve(tfim_layer(g, J=0.5, hx=1.0, dt=0.3), num_layers=2,
               cutoff=1e-10, bp_maxiter=10)
    be = BMPSEngine(eng, rank=64)  # cut width 4^3 = 64: sketch is exact-rank
    assert not be.cplan.periodic
    z = be.expect_1site("Z")
    psi_t = eng.to_state()
    for v in list(g.vertices())[:4]:
        ze = float(np.real(tnqs.expect(psi_t, ("Z", v), alg="exact")))
        # 4.4e-4 measured on this config BEFORE the ring changes (f32
        # sketch-whitening floor of the compiled sweep at chi=2/4x3) —
        # this test pins no-regression, not absolute accuracy
        assert abs(z[v].real - ze) < 1e-3, (v, z[v].real, ze)


def test_named_grid_periodic_ndarray():
    """Per-axis periodic flags as any non-str sequence (advisor r4: a
    numpy array previously hit an opaque truthiness error)."""
    g_arr = tnqs.named_grid((4, 3), periodic=np.array([True, False]))
    g_tup = tnqs.named_grid((4, 3), periodic=(True, False))
    assert {frozenset(e) for e in g_arr.edges()} == {
        frozenset(e) for e in g_tup.edges()
    }
    with pytest.raises(ValueError, match="periodic"):
        tnqs.named_grid((4, 3), periodic=np.array([True]))
    with pytest.raises(TypeError, match="periodic"):
        tnqs.named_grid((4, 3), periodic="yes")


def test_malformed_ring_rejected():
    """A stray long-range edge must NOT silently enable the approximate
    ring closure: the quotient has to be a genuine ring (every
    consecutive cut non-empty) or ColumnPlan.build errors (advisor r4)."""
    from tnqs.bmps_engine import BMPSEngine

    g = tnqs.NamedGraph([(c, 1) for c in range(1, 5)])
    g.add_edge((1, 1), (2, 1))
    g.add_edge((3, 1), (4, 1))
    g.add_edge((4, 1), (1, 1))  # spans nC-1 columns, but cut 1 is empty
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)
    eng = LatticeEngine(psi, chi=2, dtype=jnp.complex64)
    with pytest.raises(ValueError, match="not a ring"):
        BMPSEngine(eng, rank=2)


def test_ring_split_expect_matches_fused():
    """Ring plans through the split per-column programs (round-4 verdict
    missing #2): identical algebra to the fused sweep, so exact match."""
    g, eng = _cylinder_engine()
    be = BMPSEngine(eng, rank=4)
    zf = be.expect_1site("Z")
    zs = be.expect_1site("Z", split=True)
    for v in g.vertices():
        assert abs(zf[v] - zs[v]) < 5e-6


def test_ring_inner_fidelity_lognorm():
    """Compiled overlaps on ring plans (round-4 verdict missing #2) via the
    quotient-BP partition-function formula: sum of column scalars minus cut
    scalars after Gauss-Seidel relaxation.  Validated against exact
    contraction on the 6x3 cylinder."""
    g, ket = _cylinder_engine()
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)
    bra = LatticeEngine(psi, chi=2, dtype=jnp.complex64)
    bra.bp_update(maxiter=10)
    bra.evolve(
        tfim_layer(g, J=0.5, hx=1.0, dt=0.28),
        num_layers=2, cutoff=1e-10, bp_maxiter=10,
    )
    ket_s, bra_s = ket.to_state(), bra.to_state()
    ex = tnqs.inner(ket_s, bra_s, alg="exact")
    nk = tnqs.norm_sqr(ket_s, alg="exact")
    nb = tnqs.norm_sqr(bra_s, alg="exact")
    be = BMPSEngine(ket, rank=8)
    v = be.inner(bra)
    assert abs(v - ex) / abs(ex) < 1e-4
    assert abs(be.fidelity(bra) - abs(ex) ** 2 / np.real(nk * nb)) < 1e-4
    assert abs(be.lognorm() - float(np.log(np.real(nk)))) < 1e-4
