"""MXU-friendly batched factorizations for the compiled engine.

XLA lowers QR/SVD/eigh on TPU to iterative algorithms (blocked Householder,
QDWH) that spend most of their time off the MXU; at the engine's sizes
([B, 4096, 128] QR, [B, 128..256] SVD) they dominate the layer step.  These
replacements recast the work as dense matmuls:

* :func:`cholesky_qr` — shifted CholeskyQR2: Gram matmul + Cholesky +
  triangular solve, twice.  Orthogonality ~machine-eps after the second
  round; a trace-scaled shift keeps the Cholesky positive-definite for the
  rank-deficient inputs the padded engine produces (zero-padded bond
  columns).
* :func:`gram_svd` — SVD via the hermitian eigendecomposition of the Gram
  matrix on the smaller side.  Singular values below ~sqrt(eps)*smax lose
  relative accuracy — exactly the tail the engine truncates anyway.

Both are used by `tnqs.engine` when `factor_method="gram"` (the default on
TPU); `"direct"` keeps `jnp.linalg` (LAPACK on CPU, where it is both exact
and fast).  Reference for what these must reproduce: truncated
`factorize_svd` / QR simple-update semantics
(`/root/reference/src/Apply/simple_update.jl:47-60`).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

Array = jax.Array


def _eps_of(dtype) -> float:
    return float(np.finfo(np.zeros((), np.dtype(dtype)).real.dtype).eps)


def cholesky_qr(A: Array, rounds: int = 2) -> tuple[Array, Array]:
    """Thin QR of A [..., m, n] (m >= n) via shifted CholeskyQR^rounds.

    Returns (Q [..., m, n], R [..., n, n]) with A ~= Q @ R.  Handles
    rank-deficient A: the shift regularizes the Gram matrix, so Q picks an
    arbitrary orthonormal completion on the null space and R carries
    near-zero rows there (same contract as Householder QR up to phase)."""
    m, n = A.shape[-2], A.shape[-1]
    eps = _eps_of(A.dtype)
    R_total = None
    Q = A
    for it in range(rounds):
        G = jnp.einsum("...ji,...jk->...ik", jnp.conj(Q), Q)
        # Small trace-relative shift: keeps the Cholesky positive-definite on
        # the exactly-null directions the padded engine produces while
        # perturbing live singular values by O(eps)·||A||^2 only.  (The
        # literature's f64 shift constant ~11(mn+n²)u is ~0.7 at f32 for
        # m=4096 — unusably large.)
        tr = jnp.real(jnp.trace(G, axis1=-2, axis2=-1))[..., None, None]
        shift = (8.0 * eps) * tr + eps * eps
        G = G + shift.astype(G.dtype) * jnp.eye(n, dtype=G.dtype)
        L = jnp.linalg.cholesky(G)  # G = L L^H
        # Q <- Q L^{-H}: transpose to conj(L) X^T = Q^T (conj(L)^T = L^H)
        Qt = jax.scipy.linalg.solve_triangular(
            jnp.conj(L), jnp.swapaxes(Q, -1, -2), lower=True
        )
        Q = jnp.swapaxes(Qt, -1, -2)
        Rk = jnp.conj(jnp.swapaxes(L, -1, -2))  # upper triangular
        R_total = Rk if R_total is None else jnp.einsum("...ij,...jk->...ik", Rk, R_total)
    return Q, R_total


def gram_rfactor(G: Array) -> tuple[Array, Array, Array]:
    """R factor of a tall matrix X from its Gram matrix G = X^H X alone.

    Gram-space shifted CholeskyQR2: never touches X.  Round 1: L1 from the
    shifted Cholesky of G.  Round 2 measures the orthogonality defect of the
    implicit Q1 = X L1^{-H} directly in Gram space — G2 = L1^{-1} G L1^{-H}
    (= Q1^H Q1 in exact arithmetic) — and factors it, so
    R = L2^H L1^H gives X R^{-1} orthonormal to CholeskyQR2 accuracy while
    every operation here is [n, n]-sized.  The engine's two-site update uses
    this to build theta from R and to recombine as X @ (R^{-1} R_new)
    (:func:`apply_rinv`), which replaces the two [B, R_env, n] triangular
    solves and one extra [B, R_env, n] Gram of explicit CholeskyQR2 with
    small solves — R_env = chi^2 is 32x larger than n = d*chi at the
    benchmark shapes.

    Returns (R upper [., n, n], L1 lower, L2 lower).  Null columns of X are
    safe: their G block is exactly the shift, L1 = sqrt(shift) I and
    G2 = I there, so R carries ~sqrt(shift) rows that the downstream
    truncation discards (and X's exact-zero columns annihilate the large
    R^{-1} rows in the recombination)."""
    n = G.shape[-1]
    eps = _eps_of(G.dtype)
    eye = jnp.eye(n, dtype=G.dtype)

    def shifted_chol(H):
        tr = jnp.real(jnp.trace(H, axis1=-2, axis2=-1))[..., None, None]
        shift = (8.0 * eps) * tr + eps * eps
        return jnp.linalg.cholesky(H + shift.astype(H.dtype) * eye)

    L1 = shifted_chol(G)
    Y = jax.scipy.linalg.solve_triangular(L1, G, lower=True)  # L1^{-1} G
    G2 = jax.scipy.linalg.solve_triangular(
        L1, jnp.conj(jnp.swapaxes(Y, -1, -2)), lower=True
    )  # L1^{-1} G L1^{-H} (hermitian by construction up to rounding)
    G2 = 0.5 * (G2 + jnp.conj(jnp.swapaxes(G2, -1, -2)))
    L2 = shifted_chol(G2)
    R = jnp.einsum(
        "...ij,...jk->...ik",
        jnp.conj(jnp.swapaxes(L2, -1, -2)),
        jnp.conj(jnp.swapaxes(L1, -1, -2)),
    )
    return R, L1, L2


def apply_rinv(L1: Array, L2: Array, B: Array) -> Array:
    """Compute R^{-1} @ B for R = L2^H L1^H from :func:`gram_rfactor`:
    two small triangular solves (L2^H y = B, then L1^H x = y)."""
    y = jax.scipy.linalg.solve_triangular(L2, B, lower=True, trans=2)
    return jax.scipy.linalg.solve_triangular(L1, y, lower=True, trans=2)


def default_eigh(n: int):
    """Pick the eigh backend for n-dim hermitian batches: the Pallas Jacobi
    kernel on TPU for supported sizes (sub-32 matrices break Mosaic's
    sublane slicing and are cheap for QDWH anyway), XLA's QDWH otherwise."""
    if jax.default_backend() != "cpu" and n % 2 == 0 and 32 <= n <= 256:
        from .jacobi import jacobi_eigh

        return jacobi_eigh
    return jnp.linalg.eigh


def gram_svd(A: Array, eigh_fn=None) -> tuple[Array, Array, Array]:
    """Thin SVD of A [..., m, n] via eigh of the smaller-side Gram matrix.

    Returns (U [..., m, k], s [..., k], Vh [..., k, n]) with k = min(m, n),
    singular values descending.  `eigh_fn` defaults to `jnp.linalg.eigh`
    (ascending eigenvalues) and can be swapped for the Pallas Jacobi kernel."""
    m, n = A.shape[-2], A.shape[-1]
    if eigh_fn is None:
        eigh_fn = default_eigh(min(m, n))
    eps = _eps_of(A.dtype)
    if m <= n:
        G = jnp.einsum("...ik,...jk->...ij", A, jnp.conj(A))  # A A^H  [m,m]
        w, U = eigh_fn(G)
        w = jnp.real(w[..., ::-1])
        U = U[..., ::-1]
        s = jnp.sqrt(jnp.clip(w, 0.0, None))
        smax = s[..., :1]
        inv = jnp.where(s > (eps * 8.0) * smax, 1.0 / jnp.where(s > 0, s, 1.0), 0.0)
        Vh = inv[..., :, None].astype(A.dtype) * jnp.einsum(
            "...jm,...jn->...mn", jnp.conj(U), A
        )
        return U, s, Vh
    G = jnp.einsum("...ki,...kj->...ij", jnp.conj(A), A)  # A^H A  [n,n]
    w, V = eigh_fn(G)
    w = jnp.real(w[..., ::-1])
    V = V[..., ::-1]
    s = jnp.sqrt(jnp.clip(w, 0.0, None))
    smax = s[..., :1]
    inv = jnp.where(s > (eps * 8.0) * smax, 1.0 / jnp.where(s > 0, s, 1.0), 0.0)
    U = jnp.einsum("...mn,...nk->...mk", A, V) * inv[..., None, :].astype(A.dtype)
    Vh = jnp.conj(jnp.swapaxes(V, -1, -2))
    return U, s, Vh


def subspace_eigh(k: int, oversample: int = 8, iters: int = 2, seed: int = 23):
    """Top-(k+oversample) eigenpairs of hermitian-PSD batches by randomized
    subspace iteration + Rayleigh-Ritz.

    Returns a callable ``G [B, n, n] -> (w [B, m], V [B, n, m], tail [B])``
    with ``m = min(n, k + oversample)``, eigenvalues ASCENDING (the `eigh`
    convention, so callers flip exactly as for a full solve) and ``tail``
    the non-negative weight tr(G) - sum(w) missed by the subspace — callers
    fold it into truncation-error accounting.

    Motivation: the engine's two-site truncation needs only the top chi
    singular pairs of a (d*chi)^2 Gram matrix, but a full Jacobi solve at
    n=128 costs ~42 ms per color group on TPU (~43% of a benchmark layer).
    Subspace iteration replaces it with MXU matmuls plus one small
    (k+oversample)-dim solve.  The Rayleigh-Ritz values are exact for the
    projected operator, so the kept basis is optimal WITHIN the subspace;
    with PSD spectra decaying past chi (the truncation regime) two power
    iterations put the subspace error far below the f32 truncation floor
    (validated against the full solve in `tests/test_ops.py`)."""

    def solve(G: Array):
        B, n, _ = G.shape
        m = min(n, k + oversample)
        if m >= n:
            w, V = default_eigh(n)(G)
            return w, V, jnp.zeros((B,), dtype=jnp.float32)
        # the small Rayleigh-Ritz solve: Jacobi at m >= 64 (verified
        # against host truth on the chi=64 benchmark); QDWH below (the
        # 40-dim Jacobi kernel blows the fused step's scoped-vmem budget)
        small_eigh = default_eigh(m) if m >= 64 else jnp.linalg.eigh
        rng = np.random.default_rng(seed)
        om_re = rng.standard_normal((n, m)).astype(np.float32)
        om_im = rng.standard_normal((n, m)).astype(np.float32)
        omega = jax.lax.complex(jnp.asarray(om_re), jnp.asarray(om_im)).astype(
            G.dtype
        )
        Y = jnp.einsum("bij,jm->bim", G, omega)
        for _ in range(iters):
            Q, _ = cholesky_qr(Y)
            Y = jnp.einsum("bij,bjm->bim", G, Q)
        Q, _ = cholesky_qr(Y)
        H = jnp.einsum("bim,bij,bjl->bml", jnp.conj(Q), G, Q)
        H = 0.5 * (H + jnp.swapaxes(jnp.conj(H), -1, -2))
        w, S = small_eigh(H)
        V = jnp.einsum("bnm,bml->bnl", Q, S)
        tr = jnp.real(jnp.einsum("bii->b", G))
        tail = jnp.clip(tr - jnp.sum(jnp.real(w), axis=1), 0.0, None).astype(
            jnp.float32
        )
        return w, V, tail

    return solve
