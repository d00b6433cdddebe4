"""Batched hermitian eigensolver: cyclic parallel Jacobi as a Pallas kernel.

XLA lowers `eigh` on TPU to QDWH + spectral divide-and-conquer — accurate,
but latency-heavy for the engine's shapes (batches of 64..256-dim hermitian
matrices: bond environments and Gram matrices of two-site updates).  This
kernel instead runs the classic Brent–Luk parallel Jacobi scheme entirely in
VMEM.

Design points:

* 2x2 block-pair layout: four [m, m] tiles per matrix (n = 2m); pair *i* is
  (row i of the top half, row i of the bottom half), so all m rotations of a
  round apply as elementwise broadcasts over whole tiles — no gathers;
* the rotation *schedule* is data-independent, so the whole batch rides as a
  leading tile axis ([Bc, m, m]) and one program sweeps every matrix of its
  chunk simultaneously: `sweeps*(n-1)` sequential rounds TOTAL per chunk,
  not per matrix (a TPU TensorCore runs grid programs sequentially, so
  per-matrix grids pay the round latency B times);
* the grid chunks the batch only to respect VMEM (chunk size chosen so the
  working set stays ~4MB);
* the round-robin tournament permutation between rounds is a static
  slice/concat of tile rows/columns; n-1 rounds visit every pair exactly
  once and return the layout to the identity at the end of each sweep;
* complex values ride as separate real/imag f32 planes; rotations are
  complex Givens `J = [[c, -s̄],[s, c]]` with the stable small-root tangent;
* `sweeps=8` reaches ~f32 accuracy for n <= 256 (validated vs numpy).

`jacobi_eigh` matches `jnp.linalg.eigh`'s contract (ascending eigenvalues)
and is the default `eigh_fn` for `tnqs.ops.gram_svd` on TPU.

Mosaic/tunnel gotchas encoded here: the kernel runs under
`jax.enable_x64(False)` because x64 turns grid index-map constants into
int64, which SIGABRTs the Mosaic compiler; loop bounds are explicit int32;
reshapes never split or fuse the lane dimension.
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

Array = jax.Array


def _rot_params(a, b, gr, gi, eps):
    """Stable complex-Jacobi rotation annihilating gamma = H[p, q].

    Inputs [Bc, m].  Returns (c, sr, si): J = [[c, -conj(s)], [s, c]]
    diagonalizes [[a, g], [conj(g), b]]."""
    absg = jnp.sqrt(gr * gr + gi * gi)
    safe = absg > eps
    ga = jnp.where(safe, absg, 1.0)
    phr = jnp.where(safe, gr / ga, 1.0)
    phi = jnp.where(safe, gi / ga, 0.0)
    tau = (b - a) / (2.0 * ga)
    sgn = jnp.where(tau >= 0.0, 1.0, -1.0)
    t = -sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))  # small root of t^2-2τt-1
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    sm = t * c
    sr = sm * phr
    si = -sm * phi
    c = jnp.where(safe, c, 1.0)
    sr = jnp.where(safe, sr, 0.0)
    si = jnp.where(safe, si, 0.0)
    return c, sr, si


def _make_kernel(m: int, sweeps: int, eps: float):
    """Kernel refs: 8 H tiles [Bc, m, m], 4 W tiles [Bc, n, m],
    2 eval tiles [Bc, 1, m]."""
    n = 2 * m

    def kernel(
        i00r, i00i, i01r, i01i, i10r, i10i, i11r, i11i, iw0r, iw0i, iw1r, iw1i,
        o00r, o00i, o01r, o01i, o10r, o10i, o11r, o11i, ow0r, ow0i, ow1r, ow1i,
        ev_top, ev_bot,
    ):
        ii = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
        dmask = (ii == jj)[None]

        def blockdiag(x):  # [Bc, m, m] -> [Bc, m]
            return jnp.sum(jnp.where(dmask, x, 0.0), axis=2)

        def prow(t, bm):
            nt = jnp.concatenate([t[:, 0:1], bm[:, 0:1], t[:, 1 : m - 1]], axis=1)
            nb = jnp.concatenate([bm[:, 1:m], t[:, m - 1 : m]], axis=1)
            return nt, nb

        def pcol(l, r):
            nl = jnp.concatenate([l[..., 0:1], r[..., 0:1], l[..., 1 : m - 1]], axis=2)
            nr = jnp.concatenate([r[..., 1:m], l[..., m - 1 : m]], axis=2)
            return nl, nr

        def round_body(_, carry):
            (h00r, h00i, h01r, h01i, h10r, h10i, h11r, h11i, w0r, w0i, w1r, w1i) = carry
            a = blockdiag(h00r)
            b = blockdiag(h11r)
            gr = blockdiag(h01r)
            gi = blockdiag(h01i)
            c, sr, si = _rot_params(a, b, gr, gi, eps)

            cc = c[:, :, None]
            srr = sr[:, :, None]
            sii = si[:, :, None]

            def rowmix(tr, ti, br, bi):
                # top' = c*top + conj(s)*bot ; bot' = -s*top + c*bot
                ntr = cc * tr + (srr * br + sii * bi)
                nti = cc * ti + (srr * bi - sii * br)
                nbr = -(srr * tr - sii * ti) + cc * br
                nbi = -(srr * ti + sii * tr) + cc * bi
                return ntr, nti, nbr, nbi

            h00r, h00i, h10r, h10i = rowmix(h00r, h00i, h10r, h10i)
            h01r, h01i, h11r, h11i = rowmix(h01r, h01i, h11r, h11i)

            cr = c[:, None, :]
            scr = sr[:, None, :]
            sci = si[:, None, :]

            def colmix(lr, li, rr, ri):
                # left' = c*left + s*right ; right' = -conj(s)*left + c*right
                nlr = lr * cr + (rr * scr - ri * sci)
                nli = li * cr + (rr * sci + ri * scr)
                nrr = -(lr * scr + li * sci) + rr * cr
                nri = -(li * scr - lr * sci) + ri * cr
                return nlr, nli, nrr, nri

            h00r, h00i, h01r, h01i = colmix(h00r, h00i, h01r, h01i)
            h10r, h10i, h11r, h11i = colmix(h10r, h10i, h11r, h11i)
            w0r, w0i, w1r, w1i = colmix(w0r, w0i, w1r, w1i)

            h00r, h10r = prow(h00r, h10r)
            h00i, h10i = prow(h00i, h10i)
            h01r, h11r = prow(h01r, h11r)
            h01i, h11i = prow(h01i, h11i)
            h00r, h01r = pcol(h00r, h01r)
            h00i, h01i = pcol(h00i, h01i)
            h10r, h11r = pcol(h10r, h11r)
            h10i, h11i = pcol(h10i, h11i)
            w0r, w1r = pcol(w0r, w1r)
            w0i, w1i = pcol(w0i, w1i)
            return (h00r, h00i, h01r, h01i, h10r, h10i, h11r, h11i, w0r, w0i, w1r, w1i)

        carry = (
            i00r[:], i00i[:], i01r[:], i01i[:],
            i10r[:], i10i[:], i11r[:], i11i[:],
            iw0r[:], iw0i[:], iw1r[:], iw1i[:],
        )

        # int32 bounds: python-int/x64 int64 bounds abort the Mosaic compiler
        carry = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(sweeps * (n - 1)), round_body, carry
        )
        (h00r, h00i, h01r, h01i, h10r, h10i, h11r, h11i, w0r, w0i, w1r, w1i) = carry
        o00r[:] = h00r
        o00i[:] = h00i
        o01r[:] = h01r
        o01i[:] = h01i
        o10r[:] = h10r
        o10i[:] = h10i
        o11r[:] = h11r
        o11i[:] = h11i
        ow0r[:] = w0r
        ow0i[:] = w0i
        ow1r[:] = w1r
        ow1i[:] = w1i
        ev_top[:] = blockdiag(h00r)[:, None, :]
        ev_bot[:] = blockdiag(h11r)[:, None, :]

    return kernel


def _chunk_size(m: int, n: int) -> int:
    """Batch chunk per grid program.

    The kernel's cost is `sweeps*(n-1)` SEQUENTIAL rotation rounds per grid
    program and grid programs also run sequentially, so the batch must ride
    in as few chunks as possible — chunking the benchmark's [96, 64, 64]
    env eigensolve to Bc=2 (the old 1 MB budget) cost 24x the rounds and
    ~23 ms/call.  Pallas double-buffers every in/out block and the loop
    carry lives alongside (~5x raw tile bytes per program); v5e has 128 MiB
    of VMEM (the 16 MB scoped default is raised via CompilerParams), so
    budget ~7 MB of tiles (the measured scoped footprint is ~15x the tile
    budget: 8.3 MB of tiles compiled to a 120.4 MB request): the benchmark
    batches run in 2-3 programs instead of 24.
    """
    per_matrix_bytes = (12 * m * m + 8 * n * m) * 4
    bc = max(1, (7 << 20) // per_matrix_bytes)
    return int(min(bc, 512))


@partial(jax.jit, static_argnames=("sweeps", "interpret", "refine"))
def jacobi_eigh(H: Array, sweeps: int = 12, interpret: bool = False, refine: bool = True):
    """Eigendecomposition of batched hermitian H [..., n, n] (n even).

    Returns (w ascending [..., n], V [..., n, n]) with
    H ~= V @ diag(w) @ V^H — the `jnp.linalg.eigh` contract.

    `refine` re-orthonormalizes the accumulated rotation product and
    recomputes the eigenvalues as Rayleigh quotients.  The kernel's V is the
    product of ~sweeps*(n-1) f32 rotation rounds; the accumulated
    orthogonality drift (~4e-5 at n=128) dominated the eigenpair residual
    (1e-4 vs LAPACK-f32's 3e-7) and — through sqrt(s)/1/s amplification in
    the engine's truncation algebra — blew the chi=64 Eagle parity run to
    3e-2 per layer the moment saturated full-rank grams appeared (round-3
    diagnosis; `scripts/repro_jacobi_nan.py`).  Two CholeskyQR rounds plus
    one Rayleigh diagonal are MXU matmuls, negligible next to the
    sequential rotation rounds.  `sweeps` default is 12: clustered spectra
    (e.g. saturated theta grams with a truncation shoulder) still have
    ~1e-3-level off-diagonal mass at 8 sweeps and need ~12 to converge;
    past convergence extra sweeps are rotation-free and add no drift."""
    batch_shape = H.shape[:-2]
    n = H.shape[-1]
    if n % 2 != 0:
        raise ValueError("jacobi_eigh requires even n")
    m = n // 2
    B = int(np.prod(batch_shape)) if batch_shape else 1
    if B == 0:
        return jnp.linalg.eigh(H)
    Bc = _chunk_size(m, n)
    G = -(-B // Bc)
    Bp = G * Bc
    Hb = H.reshape(B, n, n)
    Hb = 0.5 * (Hb + jnp.swapaxes(Hb, -1, -2).conj())
    complex_in = jnp.iscomplexobj(H)
    hr = jnp.real(Hb).astype(jnp.float32)
    hi = jnp.imag(Hb).astype(jnp.float32) if complex_in else jnp.zeros_like(hr)
    if Bp != B:
        pad = ((0, Bp - B), (0, 0), (0, 0))
        hr = jnp.pad(hr, pad)
        hi = jnp.pad(hi, pad)
    args = []
    for blk in ((slice(0, m), slice(0, m)), (slice(0, m), slice(m, n)),
                (slice(m, n), slice(0, m)), (slice(m, n), slice(m, n))):
        args.append(hr[:, blk[0], blk[1]])
        args.append(hi[:, blk[0], blk[1]])
    eye = jnp.eye(n, dtype=jnp.float32)
    wz = jnp.zeros((Bp, n, m), jnp.float32)
    args += [
        jnp.broadcast_to(eye[:, :m], (Bp, n, m)), wz,
        jnp.broadcast_to(eye[:, m:], (Bp, n, m)), wz,
    ]

    eps = float(np.finfo(np.float32).eps)
    kern = _make_kernel(m, sweeps, eps)

    def spec(shape):
        kwargs = {}
        if _HAVE_PLTPU and not interpret:
            kwargs["memory_space"] = pltpu.VMEM
        return pl.BlockSpec((Bc,) + shape, lambda i: (i,) + (0,) * len(shape), **kwargs)

    hspec = spec((m, m))
    wspec = spec((n, m))
    espec = spec((1, m))
    kwargs = {}
    if _HAVE_PLTPU and not interpret:
        # the 16 MB scoped-VMEM default would force small batch chunks and
        # multiply the sequential rotation rounds; v5e has 128 MiB
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024
        )
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kern,
            grid=(G,),
            in_specs=[hspec] * 8 + [wspec] * 4,
            out_specs=tuple([hspec] * 8 + [wspec] * 4 + [espec, espec]),
            out_shape=tuple(
                [jax.ShapeDtypeStruct((Bp, m, m), jnp.float32)] * 8
                + [jax.ShapeDtypeStruct((Bp, n, m), jnp.float32)] * 4
                + [jax.ShapeDtypeStruct((Bp, 1, m), jnp.float32)] * 2
            ),
            interpret=interpret,
            **kwargs,
        )(*args)

    wr = jnp.concatenate([outs[8], outs[10]], axis=2)[:B]
    wi = jnp.concatenate([outs[9], outs[11]], axis=2)[:B]
    w = jnp.concatenate([outs[12][:, 0, :], outs[13][:, 0, :]], axis=1)[:B]
    if complex_in:
        V = jax.lax.complex(wr, wi).astype(H.dtype)
    else:
        V = wr.astype(H.dtype)
    if refine:
        # Newton–Schulz re-orthonormalization of the rotation product, then
        # Rayleigh-quotient eigenvalues for the corrected basis.  V is
        # within ~1e-4 of orthonormal, so one polar step V(3I - V^H V)/2
        # contracts the defect quadratically to the f32 rounding floor —
        # two MXU matmuls, no Cholesky (cholesky_qr's trace-relative shift
        # is ~8*eps*n ~ 1e-4 on a near-identity Gram, which would
        # re-introduce the very defect being removed).
        for _ in range(2):
            Gv = jnp.einsum("bji,bjk->bik", jnp.conj(V), V)
            V = 0.5 * (3.0 * V - jnp.einsum("bij,bjk->bik", V, Gv))
        Y = jnp.einsum("bij,bjk->bik", Hb, V)
        w = jnp.real(jnp.sum(jnp.conj(V) * Y, axis=1)).astype(jnp.float32)
    order = jnp.argsort(w, axis=1)
    w = jnp.take_along_axis(w, order, axis=1)
    V = jnp.take_along_axis(V, order[:, None, :], axis=2)
    w = w.reshape(batch_shape + (n,))
    V = V.reshape(batch_shape + (n, n))
    return w, V
