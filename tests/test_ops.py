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
