"""TPU factorization kernels vs LAPACK oracles (run on CPU; the Pallas
Jacobi kernel runs in interpreter mode here and compiled on TPU)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from tnqs.ops import cholesky_qr, gram_svd
from tnqs.ops.jacobi import jacobi_eigh


def _rand_c(rng, shape):
    return (rng.normal(size=shape) + 1j * rng.normal(size=shape)).astype(np.complex64)


@pytest.mark.parametrize("shape", [(4, 256, 64), (3, 4096, 128)])
def test_cholesky_qr_matches_qr(rng, shape):
    A = _rand_c(rng, shape)
    A[:, :, shape[-1] // 2 :] = 0  # rank deficiency like padded bonds
    Q, R = cholesky_qr(jnp.asarray(A))
    rec = np.asarray(jnp.einsum("bmr,brn->bmn", Q, R))
    assert np.max(np.abs(rec - A)) < 5e-5
    # orthonormal on the column space: Q^H Q is a projector-like identity
    # on the non-null directions
    G = np.asarray(jnp.einsum("bji,bjk->bik", Q.conj(), Q))
    n = shape[-1]
    live = slice(0, n // 2)
    assert np.max(np.abs(G[:, live, live] - np.eye(n // 2))) < 1e-4


@pytest.mark.parametrize("mn", [(128, 256), (128, 128), (256, 128), (64, 64)])
def test_gram_svd_matches_svd(rng, mn):
    m, n = mn
    A = _rand_c(rng, (3, m, n))
    A[:, :, -n // 4 :] = 0
    U, s, Vh = gram_svd(jnp.asarray(A))
    U2, s2, Vh2 = jnp.linalg.svd(jnp.asarray(A), full_matrices=False)
    # descending order, values match to ~sqrt(eps)*smax
    smax = float(np.max(np.asarray(s2)))
    assert np.all(np.diff(np.asarray(s), axis=1) <= 1e-4 * smax)
    assert np.max(np.abs(np.asarray(s) - np.asarray(s2))) < 5e-3 * smax
    rec = np.asarray(jnp.einsum("bmk,bk,bkn->bmn", U, s.astype(U.dtype), Vh))
    assert np.max(np.abs(rec - A)) < 5e-4 * smax


@pytest.mark.parametrize("n", [8, 64, 128])
def test_jacobi_eigh_interpret(rng, n):
    B = 2
    A = _rand_c(rng, (B, n, n))
    H = 0.5 * (A + np.swapaxes(A.conj(), -1, -2))
    w, V = jacobi_eigh(jnp.asarray(H), sweeps=10, interpret=True)
    w_ref = np.linalg.eigvalsh(H)
    scale = np.max(np.abs(w_ref))
    assert np.max(np.abs(np.asarray(w) - w_ref)) < 5e-4 * scale
    rec = np.asarray(jnp.einsum("bik,bk,bjk->bij", V, w.astype(V.dtype), V.conj()))
    assert np.max(np.abs(rec - H)) < 1e-3 * scale
    orth = np.asarray(jnp.einsum("bki,bkj->bij", V.conj(), V))
    # f32 accumulation over ~n(n-1)/2 rotations per sweep: ~2e-5 at n=128
    assert np.max(np.abs(orth - np.eye(n))) < 1e-4


def test_jacobi_eigh_degenerate(rng):
    # rank-1 + zero padding (the engine's message structure)
    n = 16
    H = np.zeros((2, n, n), np.complex64)
    for b in range(2):
        v = _rand_c(rng, (n,))
        v[n // 2 :] = 0
        H[b] = np.outer(v, v.conj())
    w, V = jacobi_eigh(jnp.asarray(H), sweeps=8, interpret=True)
    assert np.isfinite(np.asarray(w)).all()
    w_ref = np.linalg.eigvalsh(H)
    assert np.max(np.abs(np.asarray(w) - w_ref)) < 1e-4 * np.max(np.abs(w_ref))


def test_jacobi_odd_n_raises(rng):
    H = np.eye(5, dtype=np.complex64)[None]
    with pytest.raises(ValueError, match="even"):
        jacobi_eigh(jnp.asarray(H), interpret=True)


def test_engine_gram_matches_direct():
    import tnqs
    from tnqs.engine import LatticeEngine
    from tnqs.models import tfim_layer

    g = tnqs.named_grid((3, 3))
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)
    layer = tfim_layer(g, J=0.5, hx=1.0, dt=0.25)
    zs = {}
    for method in ["direct", "gram"]:
        eng = LatticeEngine(psi, chi=4, dtype=jnp.complex64, factor_method=method)
        eng.bp_update(maxiter=10)
        eng.evolve(layer, num_layers=3, cutoff=1e-10, bp_maxiter=10)
        zs[method] = eng.expect_1site("Z")
    for v in g.vertices():
        assert abs(zs["direct"][v] - zs["gram"][v]) < 1e-5, v


# ---------------------------------------------------------------------------
# fused Pallas BP sweep kernel (tnqs/ops/bp_sweep.py), interpreter mode
# ---------------------------------------------------------------------------


def test_bp_sweep_kernel_matches_xla_path():
    """Engine BP fixed point with the fused kernel (interpret mode) must
    match the XLA einsum path bit-for-f32 on a loopy heavy-hex graph."""
    import tnqs
    from tnqs.engine import LatticeEngine

    g = tnqs.heavy_hexagonal_lattice(2, 2)
    psi = tnqs.random_tensornetworkstate(
        g, "S=1/2", bond_dimension=3, dtype=np.complex64,
        rng=np.random.default_rng(11),
    )
    e_x = LatticeEngine(psi, chi=8, bp_kernel="xla")
    e_p = LatticeEngine(psi, chi=8, bp_kernel="interpret")
    e_x.bp_update(maxiter=10)
    e_p.bp_update(maxiter=10)
    err = np.max(np.abs(np.asarray(e_x.M) - np.asarray(e_p.M)))
    assert err < 5e-6


def test_bp_sweep_kernel_gating():
    from tnqs.ops.bp_sweep import supports_group

    # degree-1 groups and non-multiple-of-8 chi stay on the XLA path
    assert not supports_group(1, 64, 2, np.complex64)
    assert not supports_group(2, 12, 2, np.complex64)
    assert not supports_group(2, 64, 2, np.complex128)
    # degree-3 at chi=64 (the benchmark shape) is in budget
    assert supports_group(3, 64, 2, np.complex64)
    # degree-4 at chi=64 would blow VMEM; degree-4 at small chi is fine
    assert not supports_group(4, 64, 2, np.complex64)
    assert supports_group(4, 16, 2, np.complex64)


def test_subspace_eigh_matches_full_on_decaying_spectra():
    """Randomized subspace + Rayleigh-Ritz recovers the top-k eigenpairs of
    PSD batches with decaying spectra (the truncation regime) and reports
    the unresolved tail weight."""
    from tnqs.ops.factorizations import subspace_eigh

    rng = np.random.default_rng(0)
    B, n, k = 4, 96, 32
    A = rng.standard_normal((B, n, n)) + 1j * rng.standard_normal((B, n, n))
    decay = (0.75 ** np.arange(n))[None, :, None]
    G = (A * decay.swapaxes(1, 2)) @ (A * decay.swapaxes(1, 2)).conj().swapaxes(1, 2)
    G = jnp.asarray(G.astype(np.complex64))
    w_full, _ = jnp.linalg.eigh(G)
    w_sub, V, tail = subspace_eigh(k)(G)
    m = w_sub.shape[1]
    top_full = np.asarray(jnp.real(w_full))[:, ::-1][:, :k]
    top_sub = np.asarray(jnp.real(w_sub))[:, ::-1][:, :k]
    rel = np.abs(top_sub - top_full) / top_full[:, :1]
    assert rel.max() < 5e-5  # f32 eigensolve noise floor
    # residual of the kept eigenpairs
    GV = np.asarray(jnp.einsum("bij,bjm->bim", G, V))
    wV = np.asarray(V) * np.asarray(jnp.real(w_sub))[:, None, :]
    assert np.abs(GV - wV).max() / top_full.max() < 1e-4
    # tail accounts for the rest of the trace
    tr = np.asarray(jnp.real(jnp.einsum("bii->b", G)))
    assert np.allclose(
        np.asarray(tail) + np.asarray(jnp.real(w_sub)).sum(1), tr, rtol=1e-4
    )


def test_engine_subspace_truncation_matches_full():
    """The gram path with the subspace truncation eigensolver reproduces the
    full-eigh evolution to the f32 truncation floor (chi=32 makes the
    theta Grams 64-dim > chi+16, so the subspace path actually engages)."""
    import tnqs
    from tnqs.engine import LatticeEngine

    g = tnqs.named_grid((3, 3))
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)
    layer = [("Rx", [v], 0.5) for v in g.vertices()] + [
        ("Rzz", e, 0.7) for e in g.edges()
    ]
    outs = {}
    for method in ("full", "subspace"):
        eng = LatticeEngine(psi, chi=32, dtype=jnp.complex64, factor_method="gram")
        eng.trunc_method = method
        eng.bp_update(maxiter=10)
        errs = eng.evolve(layer, num_layers=2, cutoff=1e-10, bp_maxiter=10)
        outs[method] = (eng.expect_1site("Z"), errs)
    z_f, e_f = outs["full"]
    z_s, e_s = outs["subspace"]
    assert max(abs(z_f[v] - z_s[v]) for v in g.vertices()) < 1e-4
    assert np.max(np.abs(e_f - e_s)) < 1e-5


# ----------------------------------------------------------------------
# preconditioned one-sided Jacobi SVD (tnqs/ops/osj.py), interpreter mode
# ----------------------------------------------------------------------


def _spectrum_matrix(rng, n, spectrum):
    s = np.zeros(n)
    s[: len(spectrum)] = spectrum
    U, _ = np.linalg.qr(rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n)))
    V, _ = np.linalg.qr(rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n)))
    return (U * s[None, :]) @ V.conj().T


@pytest.mark.parametrize(
    "spectrum",
    [
        np.geomspace(1.0, 1e-2, 128),                     # saturated, gentle
        np.geomspace(1.0, 1e-4, 128),                     # saturated, wide
        np.geomspace(1.0, 1e-2, 16),                      # pre-saturation rank-16
        np.concatenate([np.geomspace(1.0, 1e-6, 64), np.zeros(64)]),  # hard rank cut
        np.concatenate([np.ones(64), np.full(64, 1e-6)]),  # two clusters
    ],
    ids=["gentle", "wide", "rank16", "rankcut", "clusters"],
)
def test_pjsvd_graded_accuracy(rng, spectrum):
    """pjsvd must stay LAPACK-f32-class on the truncated (top-chi) factors
    for every spectrum regime the engine produces — including the
    rank-deficient families that NaN'd full two-sided Jacobi solves."""
    from tnqs.ops.osj import pjsvd

    n, k = 128, 64
    A = np.stack([_spectrum_matrix(rng, n, spectrum) for _ in range(2)])
    A = A.astype(np.complex64)
    U, s, Vh = jax.jit(lambda x: pjsvd(x, interpret=True))(jnp.asarray(A))
    U, s, Vh = np.asarray(U), np.asarray(s), np.asarray(Vh)
    assert np.isfinite(U).all() and np.isfinite(s).all() and np.isfinite(Vh).all()
    U0, s0, Vh0 = np.linalg.svd(A.astype(np.complex128))
    rec = np.einsum("bij,bj,bjk->bik", U[:, :, :k], s[:, :k], Vh[:, :k, :])
    best = np.einsum("bij,bj,bjk->bik", U0[:, :, :k], s0[:, :k], Vh0[:, :k, :])
    recon = np.max(np.linalg.norm((rec - best).reshape(2, -1), axis=1) / s0[:, 0])
    assert recon < 3e-5, f"truncated reconstruction {recon:.2e}"
    s_err = np.max(np.abs(s - s0) / s0[:, :1])
    assert s_err < 1e-4, f"singular value error {s_err:.2e}"
    assert np.all(np.diff(s, axis=1) <= 1e-6)  # descending


def test_osj_svd_cold_start_small(rng):
    """Cold-started one-sided Jacobi converges at small n (the preconditioned
    path is for n ~ 128 where the f32 rotation cascade bites)."""
    from tnqs.ops.osj import osj_svd

    A = _rand_c(rng, (3, 32, 32))
    U, s, Vh = jax.jit(lambda x: osj_svd(x, sweeps=10, interpret=True))(
        jnp.asarray(A)
    )
    rec = np.einsum("bij,bj,bjk->bik", np.asarray(U), np.asarray(s), np.asarray(Vh))
    # the f32 rotation-cascade floor sits ~1.2e-5 at n=32 (sweep-count
    # independent) — the preconditioned path exists precisely to beat this
    assert np.max(np.abs(rec - A)) < 3e-5


def test_pjsvd_engine_dispatch(rng):
    """svd_impl="pjsvd" trajectories must match the XLA SVD path on CPU to
    the f32 truncation floor (both are graded/backward-stable)."""
    import tnqs
    from tnqs.engine import LatticeEngine
    from tnqs.models import heavy_hex_kicked_ising_layer

    g = tnqs.named_grid((3, 3))
    layer = heavy_hex_kicked_ising_layer(g, -0.6, 0.7)
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)
    zs = {}
    for impl in ("xla", "pjsvd"):
        eng = LatticeEngine(psi, chi=8, dtype=jnp.complex64)
        eng.trunc_method = "svd"
        eng.svd_impl = impl
        if impl == "pjsvd":
            # CPU run of the Pallas kernels via the interpreter
            from functools import partial
            from tnqs.ops import osj as _osj

            orig = _osj.pjsvd
            _osj.pjsvd = partial(orig, interpret=True)
            try:
                step = eng.make_step(layer, cutoff=1e-12, bp_maxiter=15)
                for _ in range(3):
                    eng.T, eng.M, _ = step(eng.T, eng.M)
            finally:
                _osj.pjsvd = orig
        else:
            step = eng.make_step(layer, cutoff=1e-12, bp_maxiter=15)
            for _ in range(3):
                eng.T, eng.M, _ = step(eng.T, eng.M)
        z = eng.expect_1site("Z")
        zs[impl] = np.array([float(np.real(z[v])) for v in sorted(z)])
    assert np.max(np.abs(zs["pjsvd"] - zs["xla"])) < 5e-4


def test_pjsvd_certified_gate(tmp_path):
    """`svd_impl="auto"` must never route to the Pallas kernel without a
    committed ON-CHIP parity artifact that clears the production bar
    (the flex-f32 control floor of the xla-SVD artifact)."""
    import json

    from tnqs.ops.osj import pjsvd_certified

    from tnqs.ops.osj import PJSVD_ROUTING

    ref = {"backend": "tpu", "f32_floor_per_layer": [1e-6, 5e-6]}
    # empty dir: no artifact -> not certified
    assert not pjsvd_certified(tmp_path)
    (tmp_path / "tpu_parity_chi64.json").write_text(json.dumps(ref))
    # candidate missing -> not certified
    assert not pjsvd_certified(tmp_path)
    # candidate over the floor -> not certified
    cand = {
        "backend": "tpu",
        "engine": {"pjsvd_routing": PJSVD_ROUTING},
        "dev_from_f64_per_layer": [1e-6, 6e-6],
    }
    (tmp_path / "tpu_parity_chi64_pjsvd.json").write_text(json.dumps(cand))
    assert not pjsvd_certified(tmp_path)
    # candidate at/below the floor -> certified
    cand["dev_from_f64_per_layer"] = [1e-6, 4e-6]
    (tmp_path / "tpu_parity_chi64_pjsvd.json").write_text(json.dumps(cand))
    assert pjsvd_certified(tmp_path)
    # a stale-routing candidate never certifies (the artifact must have
    # been produced by the CURRENT kernel dispatch)
    cand["engine"] = {"pjsvd_routing": "square-only-v1"}
    (tmp_path / "tpu_parity_chi64_pjsvd.json").write_text(json.dumps(cand))
    assert not pjsvd_certified(tmp_path)
    # a CPU-run candidate never certifies, however good its numbers
    cand["engine"] = {"pjsvd_routing": PJSVD_ROUTING}
    cand["backend"] = "cpu"
    (tmp_path / "tpu_parity_chi64_pjsvd.json").write_text(json.dumps(cand))
    assert not pjsvd_certified(tmp_path)


def test_svd_impl_auto_resolves_on_cpu():
    """On CPU, "auto" must resolve to the XLA SVD (the kernel is
    TPU-gated), and the env override must still win."""
    import tnqs
    from tnqs.engine import LatticeEngine

    g = tnqs.named_grid((2, 2))
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)
    eng = LatticeEngine(psi, chi=4, dtype=jnp.complex64)
    assert eng.svd_impl == "xla"
    import os

    os.environ["TNQS_SVD_IMPL"] = "pjsvd"
    try:
        eng2 = LatticeEngine(psi, chi=4, dtype=jnp.complex64)
        assert eng2.svd_impl == "pjsvd"
    finally:
        del os.environ["TNQS_SVD_IMPL"]


def _rect_spectrum_matrix(rng, M, n, spectrum):
    s = np.zeros(n)
    s[: min(len(spectrum), n)] = spectrum[:n]
    U, _ = np.linalg.qr(rng.normal(size=(M, n)) + 1j * rng.normal(size=(M, n)))
    V, _ = np.linalg.qr(rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n)))
    return (U * s[None, :]) @ V.conj().T


@pytest.mark.parametrize("Mn", [(256, 128), (128, 64)], ids=["256x128", "128x64"])
def test_pjsvd_rectangular_graded_accuracy(rng, Mn):
    """Tall thetas (the bulk heavy-hex classes: deg-2/deg-3 edges give
    [256, 128]) must hold the same truncated-factor accuracy as the square
    path — rotations act on columns, so the row count only changes tile
    height (round-4: square-only routing left the bulk classes on the XLA
    SVD, which was most of the direct-SVD premium in the layer profile)."""
    from tnqs.ops.osj import pjsvd

    M, n = Mn
    k = n // 2
    spectrum = np.geomspace(1.0, 1e-4, n)
    A = np.stack([_rect_spectrum_matrix(rng, M, n, spectrum) for _ in range(2)])
    A = A.astype(np.complex64)
    U, s, Vh = jax.jit(lambda x: pjsvd(x, interpret=True))(jnp.asarray(A))
    U, s, Vh = np.asarray(U), np.asarray(s), np.asarray(Vh)
    assert U.shape == (2, M, n) and Vh.shape == (2, n, n)
    assert np.isfinite(U).all() and np.isfinite(s).all() and np.isfinite(Vh).all()
    U0, s0, Vh0 = np.linalg.svd(A.astype(np.complex128), full_matrices=False)
    rec = np.einsum("bij,bj,bjk->bik", U[:, :, :k], s[:, :k], Vh[:, :k, :])
    best = np.einsum("bij,bj,bjk->bik", U0[:, :, :k], s0[:, :k], Vh0[:, :k, :])
    recon = np.max(np.linalg.norm((rec - best).reshape(2, -1), axis=1) / s0[:, 0])
    assert recon < 3e-5, f"truncated reconstruction {recon:.2e}"
    s_err = np.max(np.abs(s - s0) / s0[:, :1])
    assert s_err < 1e-4, f"singular value error {s_err:.2e}"


def test_pjsvd_wide_adjoint_identity(rng):
    """The engine routes wide thetas through the adjoint:
    svd(A) = (Vh_t^H, s, U_t^H) for svd(A^H).  Check the composed identity
    against numpy on a [2, 64, 128] batch."""
    from tnqs.ops.osj import pjsvd

    A = _rand_c(rng, (2, 64, 128)).astype(np.complex64)
    Ut, s, Vht = jax.jit(lambda x: pjsvd(x, interpret=True))(
        jnp.conj(jnp.swapaxes(jnp.asarray(A), -1, -2))
    )
    U = np.conj(np.swapaxes(np.asarray(Vht), -1, -2))
    Vh = np.conj(np.swapaxes(np.asarray(Ut), -1, -2))
    s = np.asarray(s)
    rec = np.einsum("bij,bj,bjk->bik", U[:, :, :64], s[:, :64], Vh[:, :64, :])
    assert np.max(np.abs(rec - A)) < 5e-5
