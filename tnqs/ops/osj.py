"""Batched one-sided Jacobi SVD as a Pallas kernel.

The round-3 parity work (`docs/performance.md`, "closing the f32 parity
case") established that trajectory parity with the f64 oracle requires a
backward-stable factorization of the UNSQUARED theta — the Gram/eigh
routes put an absolute ~5e-6 noise floor on every singular direction that
the un-gauge's 1/sqrt(s_min) rows amplify to ~1e-3/layer.  XLA's direct
QDWH-SVD has the right structure but is latency-heavy at the engine's
[B, 128, 128] shapes (recursive spectral divide-and-conquer for the
eigendecomposition of the polar factor).

One-sided (Hestenes) Jacobi has the same gold-standard error grading —
plane rotations applied directly to the columns of theta, backward error
a small multiple of eps per rotation, singular values exact column norms
of the rotated matrix — with a TPU-shaped inner loop: the Brent–Luk
round-robin schedule applies m = n/2 independent rotations per round as
elementwise broadcasts over whole [B, n, m] column-half tiles, exactly the
scheme `tnqs.ops.jacobi` uses for the two-sided eigensolver.  Differences
from the two-sided kernel:

* the iterate is theta itself (4 f32 planes: real/imag x left/right column
  halves), not 8 Gram tiles; rotations apply from the RIGHT only (one
  colmix per round instead of rowmix+colmix);
* the 2x2 Gram entries driving each rotation (a = ||l||^2, b = ||r||^2,
  g = l^H r for the m live pairs) are columnwise reductions over the tiles,
  recomputed fresh each round — no drift accumulates in a separate Gram
  iterate (the reason the two-sided kernel needed Newton-Schulz repair);
* the rotation threshold is RELATIVE (skip when |g|^2 <= eps^2 * a * b,
  the classic Hestenes criterion): exactly-null column pairs (a = b = 0,
  the padded engine's dead bond directions) take the identity rotation, so
  the rank-deficient pre-saturation spectra that NaN'd full two-sided
  Jacobi solves (`scripts/repro_jacobi_nan.py`) are safe by construction;
* on exit U = A_cols / ||A_cols|| and s = ||A_cols|| need no inverse of
  anything the algorithm got wrong: a column's direction and its norm
  carry errors scaled by that column's own singular value (graded, like
  LAPACK's gesdd — see `scripts/probe_trunc_accuracy.py`).

Replaces the truncated-SVD semantics of the reference's simple update
(`/root/reference/src/Apply/simple_update.jl:47-60`) on the TPU fast path;
`tnqs.engine` dispatches to it for `trunc_method="svd"` at supported sizes.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAVE_PLTPU = False


def pjsvd_certified(golden_dir=None) -> bool:
    """True iff a committed ON-CHIP parity artifact certifies pjsvd.

    The gate: the 10-layer chi=64 Eagle trajectory run with
    ``--svd-impl pjsvd`` (`scripts/tpu_parity_check.py`) must track the
    flex-f64 oracle LAYER BY LAYER within the same cumulative-chaos bound
    the production XLA-SVD path is held to
    (`tests/test_f32_floor.py::test_production_engine_sits_at_the_f32_floor`):
    each layer's deviation <= max(3x the running-max flex-f32 control
    floor, 2e-5 abs), AND the trajectory max must not exceed the control
    floor's max (the original round-3 bar).  The per-layer clause closes
    the advisor's round-3 finding that a max-vs-max comparison hides
    early-layer excursions behind a floor that grows with layer.  Pallas
    kernels have a record of CPU-green/TPU-wrong behavior on this backend
    (docs/performance.md, "the NaN hunt"), so nothing routes to the kernel
    by default without this artifact.
    """
    import json
    import pathlib

    d = (
        pathlib.Path(golden_dir)
        if golden_dir is not None
        else pathlib.Path(__file__).resolve().parent.parent.parent
        / "tests"
        / "golden"
    )
    try:
        cand = json.loads((d / "tpu_parity_chi64_pjsvd.json").read_text())
        ref = json.loads((d / "tpu_parity_chi64.json").read_text())
        if cand.get("backend") != "tpu":
            return False
        # the artifact must have been produced by THIS routing (see
        # PJSVD_ROUTING): a square-only-era artifact cannot certify the
        # rectangular-class dispatch
        if cand.get("engine", {}).get("pjsvd_routing") != PJSVD_ROUTING:
            return False
        devs = np.asarray(cand["dev_from_f64_per_layer"], dtype=float)
        floors = np.asarray(ref["f32_floor_per_layer"], dtype=float)
        if devs.shape != floors.shape or devs.size == 0:
            return False
        bound = np.maximum(3.0 * np.maximum.accumulate(floors), 2e-5)
        return bool((devs <= bound).all() and devs.max() <= floors.max())
    except Exception:
        return False

Array = jax.Array

# Bump whenever the set of theta classes routed to the kernel (or the
# kernel algorithm itself) changes: `pjsvd_certified` requires the
# committed on-chip artifact to carry the SAME marker, so a stale artifact
# can never certify a routing it did not actually run.
PJSVD_ROUTING = "tall+wide-adjoint-v3-rect6"


def _rot_params_rel(a, b, gr, gi, eps):
    """Complex Jacobi rotation for the 2x2 Gram [[a, g], [conj(g), b]],
    with the relative Hestenes skip: identity when |g|^2 <= eps^2 * a * b.

    Inputs [Bc, m] f32.  Returns (c, sr, si) for J = [[c, -conj(s)], [s, c]]
    such that ([l, r] @ J) has orthogonal columns."""
    g2 = gr * gr + gi * gi
    safe = g2 > (eps * eps) * (a * b)
    absg = jnp.sqrt(jnp.where(safe, g2, 1.0))
    phr = jnp.where(safe, gr / absg, 1.0)
    phi = jnp.where(safe, gi / absg, 0.0)
    tau = (b - a) / (2.0 * jnp.where(safe, absg, 1.0))
    sgn = jnp.where(tau >= 0.0, 1.0, -1.0)
    t = -sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    sm = t * c
    sr = sm * phr
    si = -sm * phi
    c = jnp.where(safe, c, 1.0)
    sr = jnp.where(safe, sr, 0.0)
    si = jnp.where(safe, si, 0.0)
    return c, sr, si


def _make_osj_kernel(n: int, m: int, sweeps: int, eps: float):
    """Kernel refs: 4 A tiles [Bc, R, m] + 4 V tiles [Bc, n, m] in, same
    out.  `n` is the COLUMN count (rotation schedule length); the A tiles'
    row count R >= n only sets tile height — reductions run over axis 1
    and rotations mix columns, so square and tall iterates share one
    kernel body."""

    def kernel(
        ialr, iali, iarr, iari, ivlr, ivli, ivrr, ivri,
        oalr, oali, oarr, oari, ovlr, ovli, ovrr, ovri,
    ):
        def pcol(l, r):
            nl = jnp.concatenate([l[..., 0:1], r[..., 0:1], l[..., 1 : m - 1]], axis=2)
            nr = jnp.concatenate([r[..., 1:m], l[..., m - 1 : m]], axis=2)
            return nl, nr

        def round_body(_, carry):
            (alr, ali, arr_, ari, vlr, vli, vrr, vri) = carry
            a = jnp.sum(alr * alr + ali * ali, axis=1)
            b = jnp.sum(arr_ * arr_ + ari * ari, axis=1)
            gr = jnp.sum(alr * arr_ + ali * ari, axis=1)
            gi = jnp.sum(alr * ari - ali * arr_, axis=1)
            c, sr, si = _rot_params_rel(a, b, gr, gi, eps)

            cr = c[:, None, :]
            scr = sr[:, None, :]
            sci = si[:, None, :]

            def colmix(lr, li, rr, ri):
                # [l', r'] = [l, r] @ [[c, -conj(s)], [s, c]]
                nlr = lr * cr + (rr * scr - ri * sci)
                nli = li * cr + (rr * sci + ri * scr)
                nrr = -(lr * scr + li * sci) + rr * cr
                nri = -(li * scr - lr * sci) + ri * cr
                return nlr, nli, nrr, nri

            alr, ali, arr_, ari = colmix(alr, ali, arr_, ari)
            vlr, vli, vrr, vri = colmix(vlr, vli, vrr, vri)

            alr, arr_ = pcol(alr, arr_)
            ali, ari = pcol(ali, ari)
            vlr, vrr = pcol(vlr, vrr)
            vli, vri = pcol(vli, vri)
            return (alr, ali, arr_, ari, vlr, vli, vrr, vri)

        carry = (
            ialr[:], iali[:], iarr[:], iari[:],
            ivlr[:], ivli[:], ivrr[:], ivri[:],
        )
        # int32 bounds: x64 int64 bounds abort the Mosaic compiler
        carry = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(sweeps * (n - 1)), round_body, carry
        )
        (alr, ali, arr_, ari, vlr, vli, vrr, vri) = carry
        oalr[:] = alr
        oali[:] = ali
        oarr[:] = arr_
        oari[:] = ari
        ovlr[:] = vlr
        ovli[:] = vli
        ovrr[:] = vrr
        ovri[:] = vri

    return kernel


def _chunk_size(R: int, n: int, m: int) -> int:
    """Batch chunk per grid program: 4 A planes [Bc, R, m] + 4 V planes
    [Bc, n, m], each in/out/carry.  Budgeted against the HARDWARE tile
    footprint: Mosaic pads the lane (last) dim to 128 and the sublane dim
    to 8, so a [Bc, 32, 8] f32 tile really occupies [Bc, 32, 128] of VMEM
    — 16x the logical bytes.  Budgeting logical bytes OOMed the w2 chi=8
    evolve at exactly this ratio ("Used 149.65M of 128.00M vmem": Bc=398
    of [., 48, 8->128] tiles).  12 MB of padded tiles/program leaves the
    measured rotation-scratch headroom inside v5e's 128 MiB scoped VMEM,
    and reproduces the chi=64 chunking that the committed parity artifact
    and headline ran ([256,128] -> Bc=5)."""
    m_pad = -(-m // 128) * 128
    per_matrix_bytes = 12 * (-(-R // 8) * 8 + -(-n // 8) * 8) * m_pad * 4
    bc = max(1, (12 << 20) // per_matrix_bytes)
    return int(min(bc, 512))


@partial(jax.jit, static_argnames=("sweeps", "interpret"))
def osj_svd(A: Array, V0: Array | None = None, sweeps: int = 10, interpret: bool = False):
    """Thin SVD of batched A [..., R, n] (R >= n, n even) by one-sided
    Jacobi.  Returns (U [..., R, n], s [..., n] descending, Vh [..., n, n])
    with A ~= U @ diag(s) @ Vh — the `jnp.linalg.svd` contract.  Tall
    iterates cost only taller column tiles: rotations act on columns, so
    the schedule and the error analysis are row-count independent (the
    engine's heavy-hex theta classes are [256, 128]-shaped in the bulk).

    `V0` warm-starts the rotation accumulator: pass an ORTHONORMAL
    approximate right-singular basis and the pre-rotated iterate A @ V0 as
    `A`, and the sweeps only polish — the rotations are then tiny, so the
    f32 rotation-cascade rounding that plateaus a cold-started solve at
    ~8e-5 never accumulates (measured: Gram-eigh preconditioner + 1 sweep
    reaches ~1e-6, LAPACK-f32 class; see :func:`pjsvd`).  V0 must be
    orthonormal to f32 eps — the rotations are unitary and cannot repair a
    non-orthonormal basis.

    Null singular directions return zero U columns (NOT an arbitrary
    orthonormal completion): downstream truncation multiplies them by
    masked sqrt(s) = 0, and a zero column cannot inject noise."""
    batch_shape = A.shape[:-2]
    n = A.shape[-1]
    R = A.shape[-2]
    if R < n or n % 2 != 0:
        raise ValueError("osj_svd requires tall/square batched matrices with even column count")
    m = n // 2
    B = int(np.prod(batch_shape)) if batch_shape else 1
    if B == 0:
        return jnp.linalg.svd(A, full_matrices=False)
    Bc = _chunk_size(R, n, m)
    G = -(-B // Bc)
    Bp = G * Bc
    Ab = A.reshape(B, R, n)
    complex_in = jnp.iscomplexobj(A)
    ar = jnp.real(Ab).astype(jnp.float32)
    ai = jnp.imag(Ab).astype(jnp.float32) if complex_in else jnp.zeros_like(ar)
    # scale to ~unit spectral norm: the rotation threshold and the final
    # norm extraction then work mid-range in f32 (column norms of the raw
    # theta can underflow f32 squares at 1e-20-scale inputs)
    scale = jnp.sqrt(jnp.sum(ar * ar + ai * ai, axis=(1, 2), keepdims=True))
    scale = jnp.where(scale > 0, scale, 1.0)
    ar = ar / scale
    ai = ai / scale
    if V0 is None:
        eye = jnp.eye(n, dtype=jnp.float32)
        vr = jnp.broadcast_to(eye, (B, n, n))
        vi = jnp.zeros((B, n, n), jnp.float32)
    else:
        Vb = V0.reshape(B, n, n)
        vr = jnp.real(Vb).astype(jnp.float32)
        vi = (
            jnp.imag(Vb).astype(jnp.float32)
            if jnp.iscomplexobj(V0)
            else jnp.zeros_like(vr)
        )
    if Bp != B:
        pad = ((0, Bp - B), (0, 0), (0, 0))
        ar = jnp.pad(ar, pad)
        ai = jnp.pad(ai, pad)
        vr = jnp.pad(vr, pad)
        vi = jnp.pad(vi, pad)
    args = [
        ar[:, :, :m], ai[:, :, :m], ar[:, :, m:], ai[:, :, m:],
        vr[:, :, :m], vi[:, :, :m], vr[:, :, m:], vi[:, :, m:],
    ]

    eps = float(np.finfo(np.float32).eps)
    kern = _make_osj_kernel(n, m, sweeps, eps)

    def spec(rows):
        kwargs = {}
        if _HAVE_PLTPU and not interpret:
            kwargs["memory_space"] = pltpu.VMEM
        return pl.BlockSpec((Bc, rows, m), lambda i: (i, 0, 0), **kwargs)

    kwargs = {}
    if _HAVE_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024
        )
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kern,
            grid=(G,),
            in_specs=[spec(R)] * 4 + [spec(n)] * 4,
            out_specs=tuple([spec(R)] * 4 + [spec(n)] * 4),
            out_shape=tuple(
                [jax.ShapeDtypeStruct((Bp, R, m), jnp.float32)] * 4
                + [jax.ShapeDtypeStruct((Bp, n, m), jnp.float32)] * 4
            ),
            interpret=interpret,
            **kwargs,
        )(*args)

    ur = jnp.concatenate([outs[0], outs[2]], axis=2)[:B]
    ui = jnp.concatenate([outs[1], outs[3]], axis=2)[:B]
    vr = jnp.concatenate([outs[4], outs[6]], axis=2)[:B]
    vi = jnp.concatenate([outs[5], outs[7]], axis=2)[:B]
    s = jnp.sqrt(jnp.sum(ur * ur + ui * ui, axis=1))  # [B, n] column norms
    order = jnp.argsort(-s, axis=1)
    s = jnp.take_along_axis(s, order, axis=1)
    ur = jnp.take_along_axis(ur, order[:, None, :], axis=2)
    ui = jnp.take_along_axis(ui, order[:, None, :], axis=2)
    vr = jnp.take_along_axis(vr, order[:, None, :], axis=2)
    vi = jnp.take_along_axis(vi, order[:, None, :], axis=2)
    smax = s[:, :1]
    inv = jnp.where(s > (eps * 4.0) * smax, 1.0 / jnp.where(s > 0, s, 1.0), 0.0)
    if complex_in:
        U = jax.lax.complex(ur, ui).astype(A.dtype) * inv[:, None, :].astype(A.dtype)
        V = jax.lax.complex(vr, vi).astype(A.dtype)
    else:
        U = (ur * inv[:, None, :]).astype(A.dtype)
        V = vr.astype(A.dtype)
    Vh = jnp.conj(jnp.swapaxes(V, -1, -2))
    s_out = (s * scale.reshape(B, 1).astype(s.dtype)).astype(
        jnp.real(jnp.zeros((), A.dtype)).dtype
    )
    U = U.reshape(batch_shape + (R, n))
    Vh = Vh.reshape(batch_shape + (n, n))
    s_out = s_out.reshape(batch_shape + (n,))
    return U, s_out, Vh


@partial(jax.jit, static_argnames=("precond_sweeps", "polish_sweeps", "interpret"))
def pjsvd(
    A: Array,
    precond_sweeps: int = 8,
    polish_sweeps: int = 4,
    interpret: bool = False,
):
    """Preconditioned one-sided Jacobi SVD of batched square A [..., n, n].

    The parity-grade fast path: a cold-started one-sided Jacobi solve
    plateaus at ~8e-5 reconstruction error in f32 (the ~sweeps*(n-1)
    rotation cascade accumulates rounding), while the same polish started
    from an approximate orthonormal right-singular basis applies only
    TINY rotations and lands at ~1e-6 — LAPACK-f32 class, with gesdd-like
    graded errors because no step ever squares, inverts, or divides by a
    small singular value:

      1. G = A^H A                     (one exact-f32 MXU matmul)
      2. V0 = eigenbasis of G          (two-sided Pallas Jacobi; its
         ~1e-5 eigenvector noise and even its NaN pathologies on
         rank-deficient spectra are REPAIRED by step 4, so it runs few
         sweeps and only the Newton-Schulz orthonormalization of V —
         mandatory, rotations cannot fix a non-orthonormal basis)
      3. B0 = A @ V0                   (exact-f32 MXU matmul; recomputed
         from the ORIGINAL A, so step-2 forward drift does not propagate)
      4. one-sided Jacobi polish of (B0, V0) — 1-2 sweeps
      5. s = column norms of B, U = B/s, Vh = V^H

    The Gram squaring in step 1 is harmless: it only picks the
    PRECONDITIONER basis; every quantity that survives to the output is
    computed from unsquared columns of A @ (unitary).  Replaces
    `jnp.linalg.svd`'s QDWH + spectral divide-and-conquer on the engine's
    two-site theta truncation (`tnqs/engine.py`, trunc_method="svd"),
    reproducing the reference's truncated-SVD semantics
    (`/root/reference/src/Apply/simple_update.jl:47-60`)."""
    from .jacobi import jacobi_eigh

    G = jnp.einsum("...ki,...kj->...ij", jnp.conj(A), A)
    _, V0 = jacobi_eigh(G, sweeps=precond_sweeps, interpret=interpret)
    # Literal NaNs from the preconditioner (the documented two-sided-Jacobi
    # pathology on rank-deficient spectra) cannot be rotated away — mask
    # those matrices back to a cold start.  A cold polish is 8e-5-grade on
    # full-rank spectra but the NaN regime is LOW-rank, where few live
    # column pairs converge quickly and accurately.
    n = A.shape[-1]
    finite = jnp.isfinite(jnp.real(V0)) & jnp.isfinite(jnp.imag(V0)) if jnp.iscomplexobj(V0) else jnp.isfinite(V0)
    ok = jnp.all(finite, axis=(-2, -1))[..., None, None]
    V0 = jnp.where(ok, jnp.where(finite, V0, 0), jnp.eye(n, dtype=V0.dtype))
    B0 = jnp.einsum("...ij,...jk->...ik", A, V0)
    return osj_svd(B0, V0, sweeps=polish_sweeps, interpret=interpret)
