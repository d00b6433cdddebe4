"""Compiled boundary-MPS tier tests (`tnqs/bmps_engine.py`).

The compiled tier replaces the host-eager flex `BoundaryMPSCache` for the
measurement stage of the benchmark workloads (reference
`/root/reference/src/MessagePassing/boundarympscache.jl:330-450`); these
tests pin its accuracy against the exact contraction and its structural
assumptions (column plans) on the benchmark lattices.
"""

import numpy as np
import pytest

import tnqs
from tnqs.bmps_engine import BMPSEngine, ColumnPlan
from tnqs.engine import LatticeEngine


def _entangled_grid_state(maxdim=4, layers=2):
    g = tnqs.named_grid((4, 4))
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)
    bpc = tnqs.BeliefPropagationCache(psi)
    layer = [("Rzz", e, 0.3) for e in g.edges()] + [
        ("Rx", [v], 0.5) for v in g.vertices()
    ]
    ak = dict(cutoff=1e-12, maxdim=maxdim, normalize_tensors=True)
    for _ in range(layers):
        bpc, _ = tnqs.apply_gates(layer, bpc, apply_kwargs=ak)
    return g, bpc.network


def test_grid_expect_matches_exact():
    g, st = _entangled_grid_state()
    exact = {v: complex(tnqs.expect(st, ("Z", v), alg="exact")) for v in g.vertices()}
    eng = LatticeEngine(st, chi=4)
    be = BMPSEngine(eng, rank=8)
    z = be.expect_1site("Z")
    errs = [abs(z[v].real - exact[v].real) for v in g.vertices()]
    # f32 einsum noise dominates; the rank is generous for these bonds
    assert max(errs) < 2e-3
    assert float(np.mean(errs)) < 2e-4


def test_zip_factor_rounds_to_fitting_class_accuracy():
    """zip_factor > 1 (zip at an elevated internal rank, round the emitted
    chain back with `_round_chain`) must track the exact contraction far
    more closely than the greedy rank-limited zip at the SAME downstream
    rank — the compiled counterpart of the flex fitting update
    (`boundarympscache.jl:401-450`).  Measured on this fixture: max-err
    3.6e-4 (zip_factor=1) -> 1.7e-5 (zip_factor=2); sampler p/q rel-std
    8.3e-3 -> 8.2e-4 on the (4,5) TFIM probe (round-4 verdict item 3)."""
    import jax.numpy as jnp

    from tnqs.bmps_engine import BMPSSampler
    from tnqs.models import tfim_layer

    g = tnqs.named_grid((4, 4))
    layer = tfim_layer(g, 1.0, 0.8, 0.15)
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)
    eng = LatticeEngine(psi, chi=4, dtype=jnp.complex64)
    step = eng.make_step(layer, cutoff=1e-12, bp_maxiter=20)
    T, M = eng.T, eng.M
    for _ in range(4):
        T, M, _ = step(T, M)
    eng.T, eng.M = T, M
    st = eng.to_state()
    exact = {v: complex(tnqs.expect(st, ("Z", v), alg="exact")) for v in g.vertices()}
    errs = {}
    for zf in (1, 2):
        be = BMPSEngine(eng, rank=3, zip_factor=zf)
        z = be.expect_1site("Z")
        errs[zf] = max(abs(z[v].real - exact[v].real) for v in g.vertices())
    assert errs[2] < errs[1] / 3, errs

    # the certificate spread tightens the same way (norm messages feed q)
    stds = {}
    for zf in (1, 2):
        be = BMPSEngine(eng, rank=3, zip_factor=zf)
        sam = BMPSSampler(be, proj_rank=8, q_mode="factored")
        cert = sam.sample_directly_certified(40, seed=0, chunk=20)
        pq = np.array([c["poverq"] for c in cert])
        stds[zf] = float(pq.std() / pq.mean())
        assert abs(float(pq.mean()) - 1.0) < 0.05
    assert stds[2] < stds[1], stds


def test_rank_is_an_accuracy_knob():
    """A random state has no locality, so the MPS rank visibly gates accuracy
    (measured: max-err 0.29 at rank 1 -> 0.055 at rank 32 on this seed)."""
    from tnqs.networks import random_tensornetworkstate

    rng = np.random.default_rng(42)
    g = tnqs.named_grid((3, 3))
    st = random_tensornetworkstate(
        g, "S=1/2", bond_dimension=4, dtype=np.complex64, rng=rng
    )
    exact = {v: complex(tnqs.expect(st, ("Z", v), alg="exact")) for v in g.vertices()}
    eng = LatticeEngine(st, chi=4)
    errs = {}
    for rank in (1, 32):
        be = BMPSEngine(eng, rank=rank)
        z = be.expect_1site("Z")
        errs[rank] = max(abs(z[v].real - exact[v].real) for v in g.vertices())
    assert errs[32] < errs[1] / 3


@pytest.mark.parametrize(
    "maker,nv",
    [
        (lambda: tnqs.heavy_hexagonal_lattice(2, 2), 35),
        (tnqs.eagle_lattice, 127),
        (lambda: tnqs.named_grid((5, 7)), 35),
    ],
)
def test_column_plan_covers_benchmark_lattices(maker, nv):
    g = maker()
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)
    eng = LatticeEngine(psi, chi=2)
    cp = ColumnPlan.build(eng.plan)
    assert sum(len(c) for c in cp.columns) == nv
    n_cross = sum(len(es) for es in cp.cross)
    n_intra = sum(
        1 for (u, w) in g.edges() if cp.col_of[u] == cp.col_of[w]
    )
    assert n_cross + n_intra == len(list(g.edges()))


def test_sampler_product_state_is_deterministic():
    """On a product |↑...↑> state q(x) = p(x) = delta_{x,0}: every sample is
    the all-zero string with p/q exactly 1."""
    from tnqs.bmps_engine import BMPSSampler

    g = tnqs.named_grid((3, 3))
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)
    eng = LatticeEngine(psi, chi=2)
    eng.bp_update(maxiter=10)  # Z_BP convention needs converged messages
    sam = BMPSSampler(BMPSEngine(eng, rank=4), proj_rank=4)
    out = sam.sample_directly_certified(6, seed=3)
    for o in out:
        assert abs(o["poverq"] - 1.0) < 1e-5
        assert all(b == 0 for b in o["bitstring"].values())


def test_sampler_poverq_matches_exact_amplitudes():
    """At full MPS rank the certified p/q equals |<x|psi>|^2/q(x) from exact
    contraction, with p UN-normalized so E_q[p/q] = <psi|psi> (reference
    `get_one_sample` `/root/reference/src/sampling.jl:171-213` and the
    anchor `test_sampling.jl:43-44`)."""
    from tnqs.bmps_engine import BMPSSampler
    from tnqs.core.tensor import onehot
    from tnqs.networks import TensorNetwork

    g = tnqs.named_grid((3, 3))
    psi0 = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)
    bpc = tnqs.BeliefPropagationCache(psi0)
    layer = [("Rzz", e, 0.7) for e in g.edges()] + [
        ("Rx", [v], 0.6) for v in g.vertices()
    ]
    bpc, _ = tnqs.apply_gates(
        layer, bpc, apply_kwargs=dict(cutoff=1e-12, maxdim=2, normalize_tensors=True)
    )
    st = bpc.network
    s = st.siteinds()
    nrm = abs(complex(tnqs.norm_sqr(st, alg="exact")))

    def p_exact(bitstring):
        proj = {}
        for v in st.vertices():
            P = st._adapt_like(onehot(s[v][0], bitstring[v]))
            proj[v] = st[v] * P
        amp = tnqs.contract_network(TensorNetwork(proj, st.graph.copy()), alg="exact")
        return abs(complex(amp)) ** 2

    eng = LatticeEngine(st, chi=2)
    eng.bp_update(maxiter=30)
    # the certificate convention divides by the BP partition function
    # (= the reference's gauge_and_scale normalization)
    z_bp = abs(complex(tnqs.norm_sqr(st, alg="bp")))
    sam = BMPSSampler(BMPSEngine(eng, rank=8), proj_rank=8)
    out = sam.sample_directly_certified(10, seed=5)
    for o in out:
        want = p_exact(o["bitstring"]) / np.exp(o["logq"]) / z_bp
        assert abs(o["poverq"] - want) / want < 1e-3
    # importance-sampling consistency: E_q[p/q] = <psi|psi>/Z_BP
    pq = np.array([o["poverq"] for o in out])
    assert abs(pq.mean() - nrm / z_bp) / (nrm / z_bp) < 5e-2


def test_sampler_chunking_matches_full_vmap():
    """`chunk=` bounds live samples via lax.map grouping (the chi=64 HBM
    path); same keys => bit-identical draws and certificates vs the
    all-at-once vmap, including a group remainder (7 = 2*3 + 1)."""
    from tnqs.bmps_engine import BMPSSampler

    g = tnqs.named_grid((3, 3))
    psi0 = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)
    bpc = tnqs.BeliefPropagationCache(psi0)
    layer = [("Rzz", e, 0.7) for e in g.edges()] + [
        ("Rx", [v], 0.6) for v in g.vertices()
    ]
    bpc, _ = tnqs.apply_gates(
        layer, bpc, apply_kwargs=dict(cutoff=1e-12, maxdim=2, normalize_tensors=True)
    )
    eng = LatticeEngine(bpc.network, chi=2)
    eng.bp_update(maxiter=30)
    sam = BMPSSampler(BMPSEngine(eng, rank=8), proj_rank=8)
    full = sam.sample_directly_certified(7, seed=11)
    chunked = sam.sample_directly_certified(7, seed=11, chunk=3)
    for a, b in zip(full, chunked):
        assert a["bitstring"] == b["bitstring"]
        assert abs(a["poverq"] - b["poverq"]) <= 1e-6 * abs(a["poverq"])
        assert abs(a["logq"] - b["logq"]) < 1e-5


def test_heavyhex_matches_flex_boundarymps():
    """Engine BMPS == flex BMPS on a heavy-hex state with real entanglement."""
    g = tnqs.heavy_hexagonal_lattice(2, 2)
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)
    bpc = tnqs.BeliefPropagationCache(psi)
    layer = [("Rzz", e, 0.4) for e in g.edges()] + [
        ("Rx", [v], 0.7) for v in g.vertices()
    ]
    ak = dict(cutoff=1e-12, maxdim=4, normalize_tensors=True)
    for _ in range(2):
        bpc, _ = tnqs.apply_gates(layer, bpc, apply_kwargs=ak)
    st = bpc.network
    flex = tnqs.expect(
        st, [("Z", [v]) for v in g.vertices()], alg="boundarymps",
        mps_bond_dimension=16,
    )
    eng = LatticeEngine(st, chi=4)
    be = BMPSEngine(eng, rank=16)
    z = be.expect_1site("Z")
    errs = [abs(z[v].real - complex(f).real) for v, f in zip(g.vertices(), flex)]
    assert max(errs) < 2e-3


def test_zip_chunking_is_exact():
    """Sketch-axis chunking (the rank >= 64 at chi = 64 memory enabler) must
    not change values: forcing a tiny chunk budget reproduces the unchunked
    sweep bit-for-bit (same sketch, same algebra)."""
    import tnqs.bmps_engine as BE

    g = tnqs.named_grid((3, 3))
    psi = tnqs.random_tensornetworkstate(
        g, "S=1/2", bond_dimension=3, rng=np.random.default_rng(3), dtype=np.complex64
    )
    eng = LatticeEngine(psi, chi=3)
    # disable the deterministic exact-emit fast path in BOTH runs: the
    # per-lane budget also gates it (advisor r4), so the tiny-budget run
    # would otherwise flip exact -> sketch and the comparison would test
    # the wrong thing (sketch vs exact instead of chunked vs unchunked)
    old_limit = BE._EXACT_EMIT_LIMIT
    old = BE._EINSUM_BUDGET
    try:
        BE._EXACT_EMIT_LIMIT = 0
        z_ref = BMPSEngine(eng, rank=4, oversample=2).expect_1site("Z")
        BE._EINSUM_BUDGET = 64  # force chunk size ~1
        z_chunked = BMPSEngine(eng, rank=4, oversample=2).expect_1site("Z")
    finally:
        BE._EINSUM_BUDGET = old
        BE._EXACT_EMIT_LIMIT = old_limit
    for v in g.vertices():
        # same sketch, same algebra; chunked einsums may pick different
        # contraction paths, so agreement is at f32 reassociation level
        assert abs(z_ref[v] - z_chunked[v]) < 1e-3


def test_oversampled_sketch_tracks_exact_svd():
    """The oversampled randomized truncation must land near the optimal
    rank-k factorization (the round-3 certification-noise lever), where the
    exact-rank sketch has a visibly larger error."""
    import jax.numpy as jnp

    from tnqs.bmps_engine import _rand_trunc_factored

    rng = np.random.default_rng(11)
    m, n, k = 60, 50, 6
    # smoothly decaying spectrum (boundary-MPS-like)
    U, _ = np.linalg.qr(rng.standard_normal((m, m)))
    V, _ = np.linalg.qr(rng.standard_normal((n, n)))
    s = 0.7 ** np.arange(n)
    A = (U[:, :n] * s) @ V.T
    A = jnp.asarray(A.astype(np.complex64))
    opt = float(np.sqrt(np.sum(s[k:] ** 2)))  # optimal rank-k error

    def run(extra):
        om = jnp.asarray(rng.standard_normal((n, k + extra)).astype(np.complex64))
        Q, C, logn = _rand_trunc_factored(
            lambda Vv: A @ Vv, lambda W: A.conj().T @ W, om, (m,), keep=k
        )
        Ahat = jnp.einsum("mx,nx->mn", Q, C) * jnp.exp(logn)
        return float(jnp.linalg.norm(A - Ahat))

    err_plain = run(0)
    err_over = run(10)
    assert err_over < 1.1 * opt  # near-optimal with oversampling
    assert err_over <= err_plain


def test_expect_vertex_filter_matches_full():
    g = tnqs.named_grid((3, 3))
    psi = tnqs.random_tensornetworkstate(
        g, "S=1/2", bond_dimension=2, rng=np.random.default_rng(5), dtype=np.complex64
    )
    eng = LatticeEngine(psi, chi=2)
    be = BMPSEngine(eng, rank=8)
    z_all = be.expect_1site("Z")
    z_sub = be.expect_1site("Z", vertices=[(1, 2), (3, 1)])
    assert set(z_sub) == {(1, 2), (3, 1)}
    for v in z_sub:
        assert abs(z_sub[v] - z_all[v]) < 1e-6


def test_ladder_transfer_explicit_matches_generic():
    """The memory-aware explicit ladder orderings (chi=64 OOM fix) must
    reproduce the generic einsum contraction exactly, for both cross-bond
    sides and through the up-step axis swap."""
    import jax.numpy as jnp

    import tnqs.bmps_engine as BE

    rng = np.random.default_rng(0)

    def t(*sh):
        return jnp.asarray(
            (rng.standard_normal(sh) + 1j * rng.standard_normal(sh)).astype(np.complex64)
        )

    p, P, q, Q, chi, s = 3, 4, 5, 6, 7, 2
    old = BE._EINSUM_BUDGET
    try:
        BE._EINSUM_BUDGET = 1  # force the explicit ordering + chunking
        for case in ("r", "l"):
            l = 1 if case == "r" else 8
            r = 8 if case == "r" else 1
            G, Ml, Mr = t(p, P, chi, chi), t(p, l, l, q), t(P, r, r, Q)
            K, B = t(s, chi, chi, l, r), t(s, chi, chi, l, r)
            ref = jnp.einsum(
                "pPab,plmq,PrRQ,saAlr,sbBmR->qQAB", G, Ml, Mr, K, B, optimize=True
            )
            out = BE.BMPSEngine._ladder_transfer(G, Ml, Mr, K, B)
            scale = float(jnp.max(jnp.abs(ref)))
            assert float(jnp.max(jnp.abs(ref - out))) < 1e-5 * scale
            # up step = down step under the chain/bond axis swap
            D = t(q, Q, chi, chi)
            ref_up = jnp.einsum(
                "qQAB,plmq,PrRQ,saAlr,sbBmR->pPab", D, Ml, Mr, K, B, optimize=True
            )
            out_up = BE.BMPSEngine._ladder_transfer(
                D, jnp.transpose(Ml, (3, 1, 2, 0)), jnp.transpose(Mr, (3, 1, 2, 0)),
                jnp.transpose(K, (0, 2, 1, 3, 4)), jnp.transpose(B, (0, 2, 1, 3, 4)),
            )
            scale = float(jnp.max(jnp.abs(ref_up)))
            assert float(jnp.max(jnp.abs(ref_up - out_up))) < 1e-5 * scale
        # BOTH cross bonds (square-grid interior vertices): the blocked
        # two-cross path must match the generic contraction
        l = r = 8
        G, Ml, Mr = t(p, P, chi, chi), t(p, l, l, q), t(P, r, r, Q)
        K, B = t(s, chi, chi, l, r), t(s, chi, chi, l, r)
        ref = jnp.einsum(
            "pPab,plmq,PrRQ,saAlr,sbBmR->qQAB", G, Ml, Mr, K, B, optimize=True
        )
        out = BE.BMPSEngine._ladder_transfer(G, Ml, Mr, K, B)
        scale = float(jnp.max(jnp.abs(ref)))
        assert float(jnp.max(jnp.abs(ref - out))) < 1e-5 * scale
    finally:
        BE._EINSUM_BUDGET = old


@pytest.mark.parametrize(
    "maker",
    [
        lambda: tnqs.heavy_hexagonal_lattice(2, 2),  # one-cross vertices
        lambda: tnqs.named_grid((4, 4)),  # two-cross (grid interiors)
    ],
)
def test_ladder_explicit_path_in_expect(maker):
    """End-to-end: a tiny forced budget (explicit/blocked ladder + chunked
    zip) on an evolved state reproduces the default path to sketch noise —
    covering both the one-cross chain and the two-cross grid-interior
    blocked contraction inside a full expect program."""
    import tnqs.bmps_engine as BE

    g = maker()
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)
    bpc = tnqs.BeliefPropagationCache(psi)
    layer = [("Rzz", e, 0.4) for e in g.edges()] + [
        ("Rx", [v], 0.7) for v in g.vertices()
    ]
    for _ in range(2):
        bpc, _ = tnqs.apply_gates(
            layer, bpc, apply_kwargs=dict(cutoff=1e-12, maxdim=4, normalize_tensors=True)
        )
    eng = LatticeEngine(bpc.network, chi=4)
    z_ref = BMPSEngine(eng, rank=16).expect_1site("Z")
    old = BE._EINSUM_BUDGET
    try:
        BE._EINSUM_BUDGET = 256
        z_exp = BMPSEngine(eng, rank=16).expect_1site("Z")
    finally:
        BE._EINSUM_BUDGET = old
    for v in g.vertices():
        assert abs(z_ref[v] - z_exp[v]) < 2e-3


def test_expect_2site_matches_exact():
    """Compiled intra-column two-point functions (path_contract analog)
    against exact contraction on an entangled grid state."""
    g, st = _entangled_grid_state()
    eng = LatticeEngine(st, chi=4)
    be = BMPSEngine(eng, rank=10)
    zz = be.expect_2site("Z", "Z")
    assert len(zz) > 0
    for (v1, v2), val in zz.items():
        want = complex(
            tnqs.expect(st, ("ZZ", [v1, v2]), alg="exact")
        )
        assert abs(val.real - want.real) < 3e-3
    # non-adjacent same-column pair
    cp = be.cplan
    col = cp.columns[0]
    far = be.expect_2site("Z", "X", pairs=[(col[0], col[-1])])
    want = complex(tnqs.expect(st, (("Z", "X"), [col[0], col[-1]]), alg="exact"))
    assert abs(list(far.values())[0].real - want.real) < 3e-3
    # duplicates and BOTH orientations in one call: results keyed by the
    # caller's orientation, and the two orientations are distinct
    # observables (<Z_u X_w> vs <Z_w X_u>) when the operators differ
    u, w = col[0], col[-1]
    both = be.expect_2site("Z", "X", pairs=[(u, w), (w, u), (u, w)])
    assert set(both) == {(u, w), (w, u)}
    want_rev = complex(tnqs.expect(st, (("Z", "X"), [w, u]), alg="exact"))
    assert abs(both[(u, w)].real - want.real) < 3e-3
    assert abs(both[(w, u)].real - want_rev.real) < 3e-3
    # same-vertex pair inserts the operator product: <Z_v X_v> = i <Y_v>
    same = be.expect_2site("Z", "X", pairs=[(u, u)])
    want_y = complex(tnqs.expect(st, ("Y", [u]), alg="exact"))
    assert abs(same[(u, u)] - 1j * want_y) < 3e-3
    with pytest.raises(ValueError, match="spans columns"):
        be.expect_2site("Z", "Z", pairs=[(cp.columns[0][0], cp.columns[1][0])])


def test_rdm_matches_exact_and_flex():
    """Compiled path RDM (matrix-unit ladder walks) against the exact
    contraction and the flex tier on 1- and 2-site subsets, plus the
    entropy round trip (reference `rdm.jl:100-124`, `entanglement.jl`)."""
    from tnqs.measure import rdm_matrix, reduced_density_matrix, renyi_entropy_matrix

    g, st = _entangled_grid_state()
    eng = LatticeEngine(st, chi=4)
    be = BMPSEngine(eng, rank=10)
    cp = be.cplan
    col = cp.columns[1]

    # 1-site
    v = col[1]
    rho = be.rdm([v])
    want = rdm_matrix(reduced_density_matrix(st, [v], alg="exact"))
    want = want / np.trace(want)
    assert rho.shape == (2, 2)
    assert abs(np.trace(rho) - 1.0) < 1e-6
    assert np.abs(rho - want).max() < 2e-3

    # 2-site, non-adjacent within the column
    vs = [col[0], col[2]]
    rho2 = be.rdm(vs)
    want2 = rdm_matrix(reduced_density_matrix(st, vs, alg="exact"))
    want2 = want2 / np.trace(want2)
    assert rho2.shape == (4, 4)
    assert np.abs(rho2 - want2).max() < 3e-3
    # hermiticity + entropy round trip
    assert np.abs(rho2 - rho2.conj().T).max() < 2e-3
    s_engine = renyi_entropy_matrix(rho2, 2)
    s_exact = renyi_entropy_matrix(want2, 2)
    assert abs(s_engine - s_exact) < 5e-3

    with pytest.raises(ValueError, match="span columns"):
        be.rdm([cp.columns[0][0], cp.columns[1][0]])


def test_sample_certified_independent_matches_direct_and_exact():
    """Compiled independent certification (single-layer zip of <x|psi>,
    reference `certify_sample`, `sampling.jl:258-290`): at full rank the
    independent p/q equals both the draw-time estimate and the exact
    |<x|psi>|^2 / (Z_BP q(x))."""
    from tnqs.bmps_engine import BMPSSampler
    from tnqs.core.tensor import onehot
    from tnqs.networks import TensorNetwork

    g = tnqs.named_grid((3, 3))
    psi0 = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)
    bpc = tnqs.BeliefPropagationCache(psi0)
    layer = [("Rzz", e, 0.7) for e in g.edges()] + [
        ("Rx", [v], 0.6) for v in g.vertices()
    ]
    bpc, _ = tnqs.apply_gates(
        layer, bpc, apply_kwargs=dict(cutoff=1e-12, maxdim=2, normalize_tensors=True)
    )
    st = bpc.network
    s = st.siteinds()
    z_bp = abs(complex(tnqs.norm_sqr(st, alg="bp")))

    def p_exact(bitstring):
        proj = {}
        for v in st.vertices():
            P = st._adapt_like(onehot(s[v][0], bitstring[v]))
            proj[v] = st[v] * P
        amp = tnqs.contract_network(TensorNetwork(proj, st.graph.copy()), alg="exact")
        return abs(complex(amp)) ** 2

    eng = LatticeEngine(st, chi=2)
    eng.bp_update(maxiter=30)
    sam = BMPSSampler(BMPSEngine(eng, rank=8), proj_rank=8)
    out = sam.sample_certified(8, seed=5, cert_rank=8)
    for o in out:
        want = p_exact(o["bitstring"]) / np.exp(o["logq"]) / z_bp
        assert abs(o["poverq"] - want) / want < 1e-3
        # independent and direct certificates agree at full rank
        assert abs(o["poverq"] - o["poverq_direct"]) / want < 1e-3
    # chunked dispatch reproduces the same certificates
    chunked = sam.sample_certified(8, seed=5, cert_rank=8, chunk=3)
    for a, b in zip(out, chunked):
        assert a["bitstring"] == b["bitstring"]
        assert abs(a["poverq"] - b["poverq"]) <= 1e-5 * abs(a["poverq"])


def test_inner_and_fidelity_match_exact():
    """Compiled bilinear overlap (bra layer from a second state) against
    exact contraction (reference `inner.jl:71-76` boundary-MPS path)."""
    g = tnqs.named_grid((3, 3))
    psi0 = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)

    def evolve(theta, layers):
        bpc = tnqs.BeliefPropagationCache(psi0)
        layer = [("Rzz", e, theta) for e in g.edges()] + [
            ("Rx", [v], 0.5) for v in g.vertices()
        ]
        ak = dict(cutoff=1e-12, maxdim=4, normalize_tensors=True)
        for _ in range(layers):
            bpc, _ = tnqs.apply_gates(layer, bpc, apply_kwargs=ak)
        return bpc.network

    a, b = evolve(0.3, 2), evolve(0.45, 2)
    # flex/reference convention: inner(psi, phi) has psi as the KET, so
    # inner(b, a) = <a|b> — the engine's ket=b, bra=a orientation
    want = complex(tnqs.inner(b, a, alg="exact"))
    na = abs(complex(tnqs.norm_sqr(a, alg="exact")))
    nb = abs(complex(tnqs.norm_sqr(b, alg="exact")))
    f_want = abs(want) ** 2 / (na * nb)

    ea, eb = LatticeEngine(a, chi=4), LatticeEngine(b, chi=4)
    be = BMPSEngine(eb, rank=10)  # ket = b
    got = be.inner(ea)
    assert abs(got - want) / abs(want) < 2e-3
    f = be.fidelity(ea)
    assert abs(f - f_want) / f_want < 3e-3
    # self-fidelity is exactly 1 (same program, same sketches)
    assert abs(be.fidelity(eb) - 1.0) < 1e-4
    # norm estimate agrees with the exact norm
    log_kk, _ = be._log_inner(None)
    assert abs(np.exp(log_kk) - nb) / nb < 2e-3


def test_norm_sqr_and_lognorm():
    """Public BMPS norm estimate: converges toward exact with MPS rank."""
    rng = np.random.default_rng(1)
    g = tnqs.named_grid((3, 3))
    psi = tnqs.random_tensornetworkstate(
        g, "S=1/2", bond_dimension=2, dtype=np.complex128, rng=rng
    )
    eng = LatticeEngine(psi, chi=2, dtype=np.complex128)
    eng.bp_update(maxiter=40)
    want = float(np.real(tnqs.norm_sqr(psi, alg="exact")))
    err8 = abs(BMPSEngine(eng, rank=8).norm_sqr() - want) / want
    err24 = abs(BMPSEngine(eng, rank=24).norm_sqr() - want) / want
    assert err8 < 0.05
    assert err24 < err8
    assert err24 < 5e-3
    be = BMPSEngine(eng, rank=8)
    assert abs(np.exp(be.lognorm()) - be.norm_sqr()) < 1e-6 * be.norm_sqr()


def test_factored_q_sampler_matches_exact_amplitudes():
    """q_mode="factored": the projected left boundary is carried as a
    SINGLE-layer MPS and expanded to doubled ket x bra messages on demand
    (the bit-projected doubled boundary is exactly l (x) conj(l)), so
    factored rank r carries the information of doubled rank r^2.  The
    certificate must still satisfy p/q = |<x|psi>|^2 / (Z_BP q(x)) against
    exact contraction — q differs from the doubled sampler (different
    boundary truncations, independent sketch folds) but the IDENTITY holds
    for any proper q.  Reference: `/root/reference/src/sampling.jl:171-213`."""
    from tnqs.bmps_engine import BMPSSampler
    from tnqs.core.tensor import onehot
    from tnqs.networks import TensorNetwork

    g = tnqs.named_grid((3, 3))
    psi0 = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)
    bpc = tnqs.BeliefPropagationCache(psi0)
    layer = [("Rzz", e, 0.7) for e in g.edges()] + [
        ("Rx", [v], 0.6) for v in g.vertices()
    ]
    bpc, _ = tnqs.apply_gates(
        layer, bpc, apply_kwargs=dict(cutoff=1e-12, maxdim=2, normalize_tensors=True)
    )
    st = bpc.network
    s = st.siteinds()
    nrm = abs(complex(tnqs.norm_sqr(st, alg="exact")))

    def p_exact(bitstring):
        proj = {}
        for v in st.vertices():
            P = st._adapt_like(onehot(s[v][0], bitstring[v]))
            proj[v] = st[v] * P
        amp = tnqs.contract_network(TensorNetwork(proj, st.graph.copy()), alg="exact")
        return abs(complex(amp)) ** 2

    eng = LatticeEngine(st, chi=2)
    eng.bp_update(maxiter=30)
    z_bp = abs(complex(tnqs.norm_sqr(st, alg="bp")))
    sam = BMPSSampler(BMPSEngine(eng, rank=8), proj_rank=4, q_mode="factored")
    out = sam.sample_directly_certified(10, seed=5)
    for o in out:
        want = p_exact(o["bitstring"]) / np.exp(o["logq"]) / z_bp
        assert abs(o["poverq"] - want) / want < 1e-3
    pq = np.array([o["poverq"] for o in out])
    assert abs(pq.mean() - nrm / z_bp) / (nrm / z_bp) < 5e-2


def test_split_expect_matches_fused():
    """`expect_1site(split=True)` (per-column XLA programs — the
    compile-memory escape hatch for rank 24 + power iterations at chi=64,
    see `_expect_1site_split`) returns the same values as the fused
    whole-sweep program: identical blocks, identical sketch folds, only
    the program boundaries differ."""
    g, st = _entangled_grid_state()
    eng = LatticeEngine(st, chi=4)
    be = BMPSEngine(eng, rank=6, power_iters=1)
    a = be.expect_1site("Z")
    b = be.expect_1site("Z", split=True)
    assert max(abs(a[v] - b[v]) for v in a) < 1e-6
    # vertex filter goes through the same split path
    verts = [(1, 1), (3, 2)]
    c = be.expect_1site("Z", vertices=verts, split=True)
    assert set(c) == set(verts)
    assert max(abs(a[v] - c[v]) for v in verts) < 1e-6
