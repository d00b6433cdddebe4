"""Batched hermitian eigensolver: cyclic parallel Jacobi as a Pallas kernel.

XLA lowers `eigh` on TPU to QDWH + spectral divide-and-conquer — accurate,
but latency-heavy for the engine's shapes (batches of 64..256-dim hermitian
matrices: bond environments and Gram matrices of two-site updates).  This
kernel instead runs the classic Brent–Luk parallel Jacobi scheme entirely in
VMEM, one matrix per grid program:

* the matrix is kept in 2x2 block-pair layout: four [m, m] tiles (n = 2m);
  pair *i* is (row i of the top half, row i of the bottom half), so all m
  rotations of a round apply as *elementwise broadcasts* over whole tiles —
  no gathers, pure VPU work;
* one round annihilates the m pair elements `H01[i, i]`; the round-robin
  tournament permutation between rounds is a static slice/concat of tile
  rows/columns; n-1 rounds visit every index pair exactly once (one sweep),
  and the permutation returns to the identity at the end of each sweep;
* complex values ride as separate real/imag f32 planes (TPU-native layout);
  rotations are complex Givens `J = [[c, -s̄],[s, c]]` with the stable
  small-root tangent formula;
* off-diagonal mass decays quadratically: `sweeps=10` reaches ~f32 accuracy
  for n <= 256 (validated against numpy in the test suite).

`jacobi_eigh` returns eigenvalues ascending and the eigenvector matrix,
matching `jnp.linalg.eigh`'s contract, and is the default `eigh_fn` for
`tnqs.ops.gram_svd` on TPU.
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

    a, b: real diagonals [m]; returns (c, sr, si): c real, s complex with
    J = [[c, -conj(s)], [s, c]] diagonalizing [[a, g], [conj(g), b]]."""
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


def _diag(x):
    m = x.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    return jnp.sum(jnp.where(rows == cols, x, 0.0), axis=1)


def _make_kernel(m: int, n_rows: int, sweeps: int, eps: float):
    """Kernel over refs: 8 H tiles [m, m], 4 W tiles [n_rows, m], evals [1, n]."""

    def kernel(
        i00r, i00i, i01r, i01i, i10r, i10i, i11r, i11i, iw0r, iw0i, iw1r, iw1i,
        o00r, o00i, o01r, o01i, o10r, o10i, o11r, o11i, ow0r, ow0i, ow1r, ow1i,
        evals,
    ):
        n = 2 * m

        def round_body(_, carry):
            (h00r, h00i, h01r, h01i, h10r, h10i, h11r, h11i, w0r, w0i, w1r, w1i) = carry
            a = _diag(h00r)
            b = _diag(h11r)
            gr = _diag(h01r)
            gi = _diag(h01i)
            c, sr, si = _rot_params(a, b, gr, gi, eps)

            cc = c[:, None]
            srr = sr[:, None]
            sii = si[:, None]

            def rowmix(tr, ti, br, bi):
                # top' = c*top + conj(s)*bot ; bot' = -s*top + c*bot
                ntr = cc * tr + (srr * br + sii * bi)
                nti = cc * ti + (srr * bi - sii * br)
                nbr = -(srr * tr - sii * ti) + cc * br
                nbi = -(srr * ti + sii * tr) + cc * bi
                return ntr, nti, nbr, nbi

            h00r, h00i, h10r, h10i = rowmix(h00r, h00i, h10r, h10i)
            h01r, h01i, h11r, h11i = rowmix(h01r, h01i, h11r, h11i)

            cr = c[None, :]
            scr = sr[None, :]
            sci = si[None, :]

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

            # tournament permutation (rows and columns move identically)
            def prow(t, bm):
                nt = jnp.concatenate([t[0:1], bm[0:1], t[1 : m - 1]], axis=0)
                nb = jnp.concatenate([bm[1:m], t[m - 1 : m]], axis=0)
                return nt, nb

            def pcol(l, r):
                nl = jnp.concatenate([l[:, 0:1], r[:, 0:1], l[:, 1 : m - 1]], axis=1)
                nr = jnp.concatenate([r[:, 1:m], l[:, m - 1 : m]], axis=1)
                return nl, nr

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
            i00r[0], i00i[0], i01r[0], i01i[0],
            i10r[0], i10i[0], i11r[0], i11i[0],
            iw0r[0], iw0i[0], iw1r[0], iw1i[0],
        )
        # int32 bounds: under jax_enable_x64 a python-int bound makes the
        # loop index int64, which Mosaic cannot lower (compiler SIGABRT)
        carry = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(sweeps * (n - 1)), round_body, carry
        )
        (h00r, h00i, h01r, h01i, h10r, h10i, h11r, h11i, w0r, w0i, w1r, w1i) = carry
        o00r[0] = h00r
        o00i[0] = h00i
        o01r[0] = h01r
        o01i[0] = h01i
        o10r[0] = h10r
        o10i[0] = h10i
        o11r[0] = h11r
        o11i[0] = h11i
        ow0r[0] = w0r
        ow0i[0] = w0i
        ow1r[0] = w1r
        ow1i[0] = w1i
        evals[0, 0, :] = jnp.concatenate([_diag(h00r), _diag(h11r)])

    return kernel


@partial(jax.jit, static_argnames=("sweeps", "interpret"))
def jacobi_eigh(H: Array, sweeps: int = 10, interpret: bool = False):
    """Eigendecomposition of batched hermitian H [..., n, n] (n even).

    Returns (w ascending [..., n], V [..., n, n]) with
    H ~= V @ diag(w) @ V^H — the `jnp.linalg.eigh` contract."""
    batch_shape = H.shape[:-2]
    n = H.shape[-1]
    if n % 2 != 0:
        raise ValueError("jacobi_eigh requires even n")
    m = n // 2
    B = int(np.prod(batch_shape)) if batch_shape else 1
    if B == 0:
        return jnp.linalg.eigh(H)
    Hb = H.reshape(B, n, n)
    Hb = 0.5 * (Hb + jnp.swapaxes(Hb, -1, -2).conj())
    complex_in = jnp.iscomplexobj(H)
    hr = jnp.real(Hb).astype(jnp.float32)
    hi = jnp.imag(Hb).astype(jnp.float32) if complex_in else jnp.zeros_like(hr)
    tiles = {
        "00": (hr[:, :m, :m], hi[:, :m, :m]),
        "01": (hr[:, :m, m:], hi[:, :m, m:]),
        "10": (hr[:, m:, :m], hi[:, m:, :m]),
        "11": (hr[:, m:, m:], hi[:, m:, m:]),
    }
    eye = jnp.eye(n, dtype=jnp.float32)
    w0r = jnp.broadcast_to(eye[:, :m], (B, n, m))
    w1r = jnp.broadcast_to(eye[:, m:], (B, n, m))
    wz = jnp.zeros((B, n, m), jnp.float32)

    eps = float(np.finfo(np.float32).eps)
    kern = _make_kernel(m, n, sweeps, eps)

    def spec(shape):
        kwargs = {}
        if _HAVE_PLTPU and not interpret:
            kwargs["memory_space"] = pltpu.VMEM
        return pl.BlockSpec((1,) + shape, lambda i: (i,) + (0,) * len(shape), **kwargs)

    hspec = spec((m, m))
    wspec = spec((n, m))
    espec = spec((1, n))
    # disable_x64 around the kernel: under jax_enable_x64 the grid index-map
    # constants become int64, which the Mosaic compiler cannot lower (observed
    # as a compiler-process SIGABRT); every dtype here is explicit f32/int32
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kern,
            grid=(B,),
            in_specs=[hspec] * 8 + [wspec] * 4,
            out_specs=tuple([hspec] * 8 + [wspec] * 4 + [espec]),
            out_shape=tuple(
                [jax.ShapeDtypeStruct((B, m, m), jnp.float32)] * 8
                + [jax.ShapeDtypeStruct((B, n, m), jnp.float32)] * 4
                + [jax.ShapeDtypeStruct((B, 1, n), jnp.float32)]
            ),
            interpret=interpret,
        )(
            tiles["00"][0], tiles["00"][1], tiles["01"][0], tiles["01"][1],
            tiles["10"][0], tiles["10"][1], tiles["11"][0], tiles["11"][1],
            w0r, wz, w1r, wz,
        )
    wr0, wi0, wr1, wi1 = outs[8], outs[9], outs[10], outs[11]
    w = outs[12][:, 0, :]
    if complex_in:
        V = jax.lax.complex(
            jnp.concatenate([wr0, wr1], axis=2), jnp.concatenate([wi0, wi1], axis=2)
        ).astype(H.dtype)
    else:
        V = jnp.concatenate([wr0, wr1], axis=2).astype(H.dtype)
    order = jnp.argsort(w, axis=1)
    w = jnp.take_along_axis(w, order, axis=1)
    V = jnp.take_along_axis(V, order[:, None, :], axis=2)
    w = w.reshape(batch_shape + (n,))
    V = V.reshape(batch_shape + (n, n))
    return w, V
