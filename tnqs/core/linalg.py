"""Index-aware factorizations: truncated SVD, QR, hermitian eigendecomposition.

These are the numerical kernels the reference outsources to ITensors/LAPACK
(`factorize_svd`, `qr`, `eigen`; see `src/Apply/simple_update.jl:47-59`,
`src/utils.jl:18-35,94-108`).  They run on numpy (host) or JAX (device)
depending on the tensor backend; batched/jitted device versions live in
`tnqs.ops`.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from .index import Index
from .tensor import Tensor, _xp, is_jax

try:
    import jax.numpy as jnp
except Exception:  # pragma: no cover
    jnp = None


# ----------------------------------------------------------------------
# truncation rule (mirrors ITensors' relative-cutoff semantics)
# ----------------------------------------------------------------------

def truncation_rank(s: np.ndarray, maxdim=None, cutoff=None) -> tuple[int, float]:
    """Number of singular values to keep and the truncation error.

    `s` must be sorted descending.  The error is the discarded fraction of
    ``sum(s^2)`` — the convention of ITensors' `truncerr` that the reference
    reports per gate (`src/Apply/simple_update.jl:60`).
    """
    s = np.asarray(s, dtype=np.float64)
    p = s * s
    total = float(p.sum())
    n = len(s)
    keep = n
    if total > 0.0 and cutoff is not None:
        tail = np.cumsum(p[::-1])[::-1]  # tail[k] = sum(p[k:])
        keep = n
        for k in range(n - 1, 0, -1):
            if tail[k] <= cutoff * total:
                keep = k
            else:
                break
    if maxdim is not None:
        keep = min(keep, int(maxdim))
    keep = max(keep, 1)
    err = 0.0 if total == 0.0 else float(p[keep:].sum() / total)
    return keep, err


# ----------------------------------------------------------------------
# SVD
# ----------------------------------------------------------------------

def svd(
    t: Tensor,
    left_inds: Sequence[Index],
    maxdim=None,
    cutoff=None,
    tag: str = "Link",
):
    """Truncated SVD ``t = U S V``.

    Returns ``(U, S, V, err)`` with a fresh bond pair: ``U`` carries ``u``,
    ``V`` carries ``v``, ``S`` has indices ``(u, v)``.
    """
    left_inds = list(left_inds)
    right_inds = [i for i in t.inds if i not in left_inds]
    mat = t.matricize(left_inds, right_inds)
    xp = _xp(mat)
    U, s, Vh = xp.linalg.svd(mat, full_matrices=False)
    s_host = np.asarray(s)
    keep, err = truncation_rank(s_host, maxdim=maxdim, cutoff=cutoff)
    U, s, Vh = U[:, :keep], s[:keep], Vh[:keep, :]
    u = Index(keep, tag)
    v = Index(keep, tag)
    U_t = Tensor(U.reshape([i.dim for i in left_inds] + [keep]), left_inds + [u])
    S_t = Tensor(xp.diag(s.astype(mat.dtype)) if xp is np else jnp.diag(s.astype(mat.dtype)), [u, v])
    V_t = Tensor(Vh.reshape([keep] + [i.dim for i in right_inds]), [v] + right_inds)
    return U_t, S_t, V_t, err


def factorize_svd(
    t: Tensor,
    left_inds: Sequence[Index],
    maxdim=None,
    cutoff=None,
    ortho: str = "none",
    tag: str = "Link",
):
    """Two-factor truncated SVD split sharing a single new bond index.

    ``ortho="none"``: ``L = U sqrt(S)``, ``R = sqrt(S) V`` (Vidal-style split —
    what simple update uses, `src/Apply/simple_update.jl:53-59`).
    ``ortho="left"``: ``L = U``, ``R = S V``.  ``ortho="right"``: ``L = U S``,
    ``R = V``.

    Returns ``(L, R, s_matrix, err)`` where ``s_matrix`` is the diagonal
    singular-value matrix with indices ``(b, b')`` (``b`` the new shared
    bond) — exactly the object written back as the BP bond message after a
    gate (`src/Apply/apply_gates.jl:126-136`).
    """
    left_inds = list(left_inds)
    right_inds = [i for i in t.inds if i not in left_inds]
    mat = t.matricize(left_inds, right_inds)
    xp = _xp(mat)
    U, s, Vh = xp.linalg.svd(mat, full_matrices=False)
    s_host = np.asarray(s)
    keep, err = truncation_rank(s_host, maxdim=maxdim, cutoff=cutoff)
    U, s, Vh = U[:, :keep], s[:keep], Vh[:keep, :]
    s = s.astype(np.float64 if mat.dtype in (np.float64, np.complex128) else np.float32)
    if ortho == "none":
        rs = xp.sqrt(s)
        L, R = U * rs[None, :].astype(mat.dtype), rs[:, None].astype(mat.dtype) * Vh
    elif ortho == "left":
        L, R = U, s[:, None].astype(mat.dtype) * Vh
    elif ortho == "right":
        L, R = U * s[None, :].astype(mat.dtype), Vh
    else:
        raise ValueError(f"unknown ortho {ortho!r}")
    b = Index(keep, tag)
    L_t = Tensor(L.reshape([i.dim for i in left_inds] + [keep]), left_inds + [b])
    R_t = Tensor(R.reshape([keep] + [i.dim for i in right_inds]), [b] + right_inds)
    sdiag = xp.zeros((keep, keep), dtype=mat.dtype)
    if xp is np:
        np.fill_diagonal(sdiag, s)
    else:
        sdiag = jnp.diag(s.astype(mat.dtype))
    S_t = Tensor(sdiag, [b, b.prime()])
    return L_t, R_t, S_t, err


# ----------------------------------------------------------------------
# QR
# ----------------------------------------------------------------------

def qr(t: Tensor, left_inds: Sequence[Index], tag: str = "qr"):
    """Reduced QR of `t` with `left_inds` grouped on the Q side."""
    left_inds = list(left_inds)
    right_inds = [i for i in t.inds if i not in left_inds]
    mat = t.matricize(left_inds, right_inds)
    xp = _xp(mat)
    Q, R = xp.linalg.qr(mat, mode="reduced")
    k = Q.shape[1]
    b = Index(k, tag)
    Q_t = Tensor(Q.reshape([i.dim for i in left_inds] + [k]), left_inds + [b])
    R_t = Tensor(R.reshape([k] + [i.dim for i in right_inds]), [b] + right_inds)
    return Q_t, R_t


def factorize(t: Tensor, left_inds: Sequence[Index], ortho="left", maxdim=None, cutoff=None, tag="Link"):
    """General two-factor split ``t = L * R`` (reference `ITensors.factorize`).

    `L` always carries `left_inds` (plus the new bond).  Without truncation
    uses QR (cheaper); with `maxdim`/`cutoff` uses the truncated SVD.
    ``ortho="left"`` makes `L` orthonormal, ``ortho="right"`` makes `R`
    orthonormal (used by the boundary-MPS gauge walk,
    `src/MessagePassing/boundarympscache.jl:270-285,437-439`).
    """
    left_inds = list(left_inds)
    if maxdim is None and cutoff in (None, 0, 0.0):
        if ortho == "left":
            return qr(t, left_inds, tag=tag)
        if ortho != "right":
            raise ValueError(f"unknown ortho {ortho!r}")
        # right-orthogonal: QR on the right index group, then swap roles so
        # L = (left_inds, b) and R = (b, right_inds) with R R^dag = 1.
        right_inds = [i for i in t.inds if i not in left_inds]
        Q, R = qr(t, right_inds, tag=tag)
        return R, Q
    L, R, _, _ = factorize_svd(t, left_inds, maxdim=maxdim, cutoff=cutoff, ortho=ortho, tag=tag)
    return L, R


# ----------------------------------------------------------------------
# Hermitian eigendecomposition (with the reference's float64 escape hatch)
# ----------------------------------------------------------------------

def eigh_matrix(mat, safe: bool = True):
    """Hermitian eig of a 2D array; promotes 32-bit input to 64-bit if `safe`.

    Mirrors `safe_eigen` (`src/utils.jl:94-108`).
    """
    xp = _xp(mat)
    orig_dtype = mat.dtype
    work = mat
    if safe and orig_dtype in (np.float32, np.complex64):
        work = mat.astype(np.complex128 if orig_dtype == np.complex64 else np.float64)
    w, U = xp.linalg.eigh(work)
    return w, U, orig_dtype


def eigh(t: Tensor, safe: bool = True):
    """Hermitian eigendecomposition of a 2-index tensor ``m(l, l')``.

    Returns ``(w, U)`` where ``w`` is a 1D eigenvalue array (host numpy) and
    ``U`` is a Tensor with indices ``(l, e)`` such that
    ``m = U diag(w) U†`` with ``U†`` on ``(e, l')``.
    """
    if t.ndim != 2:
        raise ValueError("eigh expects a 2-index tensor")
    l = next(i for i in t.inds if i.plev == min(j.plev for j in t.inds))
    lp = next(i for i in t.inds if i != l)
    mat = t.matricize([l], [lp])
    w, U, orig_dtype = eigh_matrix(mat, safe=safe)
    e = Index(U.shape[1], "eig")
    U_t = Tensor(U.astype(orig_dtype), [l, e])
    return np.asarray(w), U_t, lp, e


def map_eigs(t: Tensor, f, safe: bool = True, hermitian_result: bool = True) -> Tensor:
    """Apply `f` elementwise to the eigenvalues of hermitian ``m(l, l')``."""
    w, U, lp, e = eigh(t, safe=safe)
    fw = np.asarray([f(x) for x in w])
    xp = _xp(U.data)
    dtype = t.data.dtype
    if np.iscomplexobj(fw) and not np.iscomplexobj(np.empty(0, dtype=dtype)):
        dtype = np.complex128 if np.dtype(dtype).itemsize == 8 else np.complex64
    mid = fw.astype(dtype)
    data = (U.data * xp.asarray(mid)[None, :]) @ xp.conj(U.data).T
    return Tensor(data.astype(dtype), [t.inds[t.axis(U.inds[0])], lp])


def pseudo_sqrt_inv_sqrt(m: Tensor, cutoff: float | None = None):
    """Pseudo square root and inverse square root of a hermitian 2-index tensor.

    Eigenvalues below `cutoff` are zeroed (reference
    `pseudo_sqrt_inv_sqrt`, `src/utils.jl:18-26`).  Returns
    ``(sqrt_m, inv_sqrt_m)`` with the same index structure as ``m``.
    """
    if cutoff is None:
        eps = np.finfo(np.float32 if m.data.dtype in (np.float32, np.complex64) else np.float64).eps
        cutoff = 10 * eps
    w, U, lp, e = eigh(m)
    w = np.real(w)
    ok = np.abs(w) >= cutoff
    sq = np.where(ok, np.sqrt(np.clip(w, 0.0, None)), 0.0)
    with np.errstate(divide="ignore"):
        isq = np.where(sq > 0, 1.0 / np.maximum(sq, 1e-300), 0.0)
    xp = _xp(U.data)
    dtype = m.data.dtype
    Ud = U.data
    sqrt_data = (Ud * xp.asarray(sq.astype(np.float64))[None, :].astype(dtype)) @ xp.conj(Ud).T
    isq_data = (Ud * xp.asarray(isq.astype(np.float64))[None, :].astype(dtype)) @ xp.conj(Ud).T
    l = U.inds[0]
    return (
        Tensor(sqrt_data.astype(dtype), [l, lp]),
        Tensor(isq_data.astype(dtype), [l, lp]),
    )


# ----------------------------------------------------------------------
# diagonal helpers (sign-fixing of singular-value messages, etc.)
# ----------------------------------------------------------------------

def map_diag(t: Tensor, f) -> Tensor:
    """Apply `f` to the diagonal of a 2-index tensor, keeping off-diagonals."""
    if t.ndim != 2:
        raise ValueError("map_diag expects a 2-index tensor")
    xp = _xp(t.data)
    d = xp.diagonal(t.data)
    new_d = xp.asarray(np.asarray([f(x) for x in np.asarray(d)]), dtype=t.data.dtype)
    data = t.data - xp.diag(d) + xp.diag(new_d)
    return Tensor(data, t.inds)
