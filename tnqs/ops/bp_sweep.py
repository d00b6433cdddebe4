"""Fused Pallas kernel for batched BP message updates.

The BP sweep is the engine's hot spot (~70% of a Trotter layer at chi=64,
roughly half compute / half HBM traffic — see `docs/performance.md`).  The
XLA path in `LatticeEngine._bp_new_messages` evaluates, per (stage, degree,
slot) group, a chain of einsums

    gather T rows -> absorb env message 1 -> absorb env message 2 -> ...
    -> contract with conj(T) over site+env axes -> new message

and XLA materializes every intermediate in HBM (TPU matmuls don't fuse into
each other), so each outgoing message re-reads its ~chi^k site tensor several
times.  This kernel fuses the whole chain: one grid step pulls a ket chunk
and the bra tensor into VMEM, performs all absorbs and the final bra
contraction in VMEM, and writes only a [o_chunk, chi] slab of the message —
site tensors cross HBM once per operand per outgoing message.

This is the TPU-native replacement for the reference's per-edge
`updated_message` contraction (`/root/reference/src/MessagePassing/
abstractbeliefpropagationcache.jl:162-190`), batched over an entire
wavefront-stage group.

Mosaic constraints encoded here (superset of the list in
`tnqs/ops/jacobi.py`, learned the hard way):

* complex values ride as separate real/imag f32 planes (no complex dtype);
* every matmul is a strict 2D `dot_general`, either contracting the lane
  (minor-most) axis against dim 0 of a [chi, chi] matrix, or K-major
  (contracting dim 0 of both operands) for the final bra product — Mosaic
  rejects multi-contracting-dim dots ("lhs contracting dims must be of
  size 1");
* reshapes only ever fuse LEADING axes; the lane axis is never split or
  fused (einsum's own lowering violates this: "unsupported shape cast");
* axis reordering uses adjacent `swapaxes` steps only;
* the ket/bra operands arrive PRE-PERMUTED from XLA (ket `[o, e_rev...]`,
  bra `[e..., O]`) so the kernel body is independent of the outgoing slot;
* Mosaic stack-allocates every chain temporary, so the free `o` axis is a
  grid dimension chunked to keep the whole chain ~2 MB (full-chi blocks
  OOM scoped VMEM at 45 MB for degree 3 at chi=64).  The grid runs o
  innermost so the bra block (whose index only depends on row and site) is
  fetched once per (row, site) and cached across o chunks;
* per-site partials are separate output slabs summed in XLA afterwards —
  cross-step output accumulation would need consecutive revisits, which the
  (row, site, o) order can't provide;
* the call is wrapped in `jax.enable_x64(False)`.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

try:  # pragma: no cover - exercised only on TPU
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAVE_PLTPU = False

Array = jax.Array

# Bra plane elements per (row, site) block; degree-3 at chi=64 is 64^3 =
# 262144 elements = 1 MB/plane, the largest block the VMEM budget tolerates
# once Pallas double-buffers it.
_MAX_BLOCK_ELEMS = 1 << 18
# Ket chunk budget (elements): o_chunk * chi^(k-1) <= this.  Mosaic
# stack-allocates the absorb-chain temporaries, so the budget controls the
# scoped-VMEM peak (~46 MB for a full-chi degree-3 chunk at chi=64, inside
# the raised 100 MB limit); grid steps cost ~2-4 us each on this backend, so
# bigger chunks win until VMEM pushes back.
_KET_CHUNK_ELEMS = 1 << 18


def supports_group(k: int, chi: int, d: int, dtype) -> bool:
    """Whether the fused kernel can run this (degree, chi) group."""
    if not _HAVE_PLTPU:
        return False
    if np.dtype(dtype) != np.complex64:
        return False
    if k < 2:
        return False  # k=1 has no absorbs; the XLA einsum is already minimal
    if chi % 8 != 0:
        # sublane alignment: interior axes land on sublanes; odd chi would
        # force Mosaic into degenerate padding
        return False
    if chi ** (k - 1) > _KET_CHUNK_ELEMS:
        return False  # even a single-o ket chunk would blow the budget
    return chi**k <= _MAX_BLOCK_ELEMS


def _o_chunk(k: int, chi: int) -> int:
    """Largest divisor of chi with o_chunk * chi^(k-1) <= the chunk budget."""
    cap = max(1, _KET_CHUNK_ELEMS // (chi ** (k - 1)))
    best = 1
    for div in range(1, chi + 1):
        if chi % div == 0 and div <= cap:
            best = div
    return best


def plane_layouts(planes_r: Array, planes_i: Array, k: int, t: int):
    """Pre-permute bucket planes [n, d, chi x k] for outgoing slot `t`.

    Returns (ket_r, ket_i, bra_r, bra_i):
    ket layout [n, d, o, e_{k-2}, ..., e_0] (env slots DESCENDING so the
    first absorbed env axis is the lane axis), bra layout
    [n, d, e_0, ..., e_{k-2}, O] (env slots ASCENDING, out axis last) —
    exactly the shapes the kernel's swap-free final K-major dot wants.
    `e_col` is the col-th entry of the group's `other_slots`.
    """
    other = [j for j in range(k) if j != t]
    ket_axes = (0, 1, 2 + t) + tuple(2 + j for j in reversed(other))
    bra_axes = (0, 1) + tuple(2 + j for j in other) + (2 + t,)
    return (
        jnp.transpose(planes_r, ket_axes),
        jnp.transpose(planes_i, ket_axes),
        jnp.transpose(planes_r, bra_axes),
        jnp.transpose(planes_i, bra_axes),
    )


def _make_kernel(k: int, chi: int, mode: str):
    """Kernel for degree `k`.

    Refs: ket_r, ket_i [1, 1, o_chunk, chi x (k-1)] in layout
    [o, e_{k-2}, ..., e_0]; bra_r, bra_i [1, 1, chi x k] in layout
    [e_0, ..., e_{k-2}, O]; minr, mini [1, k-1, chi, chi] (column col =
    message entering env slot col); outputs outr, outi [1, 1, o_chunk, chi]
    (per-site partials, summed over the site axis by the caller).

    Complex products use the BLOCKED-REAL embedding: stacking real/imag
    along the contraction axis turns each complex absorb into ONE
    [R, 2chi] @ [2chi, 2chi] matmul (a full 128-wide MXU tile at chi=64,
    4x the utilization of four 64-wide plane matmuls, at identical FLOPs)
    whose output carries real/imag blocked along the fresh lane axis.

    `mode`: "highest" = exact-f32 MXU passes (Precision.HIGHEST; Mosaic
    rejects HIGH); "bf16_3x" = manual 3-pass split-bfloat16 (hi*hi + hi*lo
    + lo*hi, f32 accumulation) — the engine's validated `bp_precision
    = "high"` contract, ~2x the HIGHEST pass count.
    """

    def dot2(a, b, dims):
        if mode == "highest":
            return lax.dot_general(a, b, dims, precision=lax.Precision.HIGHEST)
        ah = a.astype(jnp.bfloat16)
        al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        bh = b.astype(jnp.bfloat16)
        bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
        # explicit DEFAULT: the package's global "highest" matmul precision
        # would otherwise tag these bf16 dots fp32 ("Bad lhs type" in Mosaic)
        d = lambda x, y: lax.dot_general(
            x,
            y,
            dims,
            preferred_element_type=jnp.float32,
            precision=lax.Precision.DEFAULT,
        )
        return d(ah, bh) + (d(ah, bl) + d(al, bh))

    def kernel(kr_ref, ki_ref, br_ref, bi_ref, minr_ref, mini_ref, outr_ref, outi_ref):
        Ar = kr_ref[0, 0]
        Ai = ki_ref[0, 0]
        # symbolic axis order, tracked in Python (static)
        order = ["o"] + [f"e{c}" for c in reversed(range(k - 1))]

        def move_last(Xr, Xi, sym):
            p = order.index(sym)
            while p < len(order) - 1:
                Xr = jnp.swapaxes(Xr, p, p + 1)
                Xi = jnp.swapaxes(Xi, p, p + 1)
                order[p], order[p + 1] = order[p + 1], order[p]
                p += 1
            return Xr, Xi

        for col in range(k - 1):
            Ar, Ai = move_last(Ar, Ai, f"e{col}")
            Mr = minr_ref[0, col]
            Mi = mini_ref[0, col]
            # blocked-real embedding of the message matrix: [2chi, 2chi]
            G = jnp.concatenate(
                [
                    jnp.concatenate([Mr, Mi], axis=1),
                    jnp.concatenate([-Mi, Mr], axis=1),
                ],
                axis=0,
            )
            S = jnp.concatenate([Ar, Ai], axis=-1)  # [..., 2chi]
            sh = S.shape
            Y = dot2(
                S.reshape((-1, 2 * chi)), G, (((1,), (0,)), ((), ()))
            ).reshape(sh)
            Ar = Y[..., :chi]
            Ai = Y[..., chi:]
            order[-1] = f"y{col}"
        Ar, Ai = move_last(Ar, Ai, "o")
        # order is now [y0, ..., y_{k-2}, o]; bra arrives as [e0, ..., O].
        # Final product, K-major with planes stacked along the contraction
        # rows: [Ar; Ai]^T @ [[Br, -Bi], [Bi, Br]] = [mr, mi].
        A_stk = jnp.concatenate(
            [Ar.reshape((-1, Ar.shape[-1])), Ai.reshape((-1, Ai.shape[-1]))], axis=0
        )
        B2r = br_ref[0, 0].reshape((-1, chi))
        B2i = bi_ref[0, 0].reshape((-1, chi))
        W = jnp.concatenate(
            [
                jnp.concatenate([B2r, -B2i], axis=1),
                jnp.concatenate([B2i, B2r], axis=1),
            ],
            axis=0,
        )
        C = dot2(A_stk, W, (((0,), (0,)), ((), ())))  # [o_chunk, 2chi]
        outr_ref[0, 0] = C[:, :chi]
        outi_ref[0, 0] = C[:, chi:]

    return kernel


@partial(
    jax.jit,
    static_argnames=("lo", "k", "interpret", "mode"),
)
def bp_sweep_group(
    ket_r: Array,
    ket_i: Array,
    bra_r: Array,
    bra_i: Array,
    Minr: Array,
    Mini: Array,
    lo: int,
    k: int,
    interpret: bool = False,
    mode: str = "highest",
):
    """Un-normalized outgoing BP messages for one contiguous group.

    ket_*/bra_*: full degree-k bucket planes [n_k, d, chi x k] (f32) in the
    layouts produced by :func:`plane_layouts` for this group's out slot.
    Minr/Mini: pre-gathered incoming messages [B, k-1, chi, chi] (f32),
    column order matching the group's `other_slots`.
    Rows lo..lo+B-1 of the bucket emit one message each.

    Returns (mr, mi): [B, chi, chi] f32 (caller sum-normalizes/combines).
    """
    B = Minr.shape[0]
    d = ket_r.shape[1]
    chi = ket_r.shape[-1]
    o_chunk = _o_chunk(k, chi)
    n_o = chi // o_chunk
    kern = _make_kernel(k, chi, mode)

    def vspec(block, index_map):
        kwargs = {}
        if _HAVE_PLTPU and not interpret:
            kwargs["memory_space"] = pltpu.VMEM
        return pl.BlockSpec(block, index_map, **kwargs)

    ket_block = (1, 1, o_chunk) + (chi,) * (k - 1)
    ket_map = lambda i, s, o: (lo + i, s, o) + (0,) * (k - 1)
    bra_block = (1, 1) + (chi,) * k
    bra_map = lambda i, s, o: (lo + i, s) + (0,) * k
    m_block = (1, max(k - 1, 1), chi, chi)
    m_map = lambda i, s, o: (i, 0, 0, 0)
    o_block = (1, 1, o_chunk, chi)
    o_map = lambda i, s, o: (i, s, o, 0)

    kwargs = {}
    if _HAVE_PLTPU and not interpret:
        # the 16 MB scoped-VMEM default is conservative; v5e has 128 MiB of
        # VMEM and the fused chain's stack peaks ~28 MB at degree 3, chi=64
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    with jax.enable_x64(False):
        outr, outi = pl.pallas_call(
            kern,
            grid=(B, d, n_o),
            in_specs=[
                vspec(ket_block, ket_map),
                vspec(ket_block, ket_map),
                vspec(bra_block, bra_map),
                vspec(bra_block, bra_map),
                vspec(m_block, m_map),
                vspec(m_block, m_map),
            ],
            out_specs=(vspec(o_block, o_map), vspec(o_block, o_map)),
            out_shape=(
                jax.ShapeDtypeStruct((B, d, chi, chi), jnp.float32),
                jax.ShapeDtypeStruct((B, d, chi, chi), jnp.float32),
            ),
            interpret=interpret,
            **kwargs,
        )(ket_r, ket_i, bra_r, bra_i, Minr, Mini)
    # per-site partials -> full message (cheap XLA reduction over d)
    return outr.sum(axis=1), outi.sum(axis=1)
