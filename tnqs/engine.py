"""Compiled TPU evolution engine: statically-shaped, batched, jitted.

This is the TPU-native execution tier that the reference has no counterpart
for.  Where the flex tier (`tnqs.apply`, `tnqs.bp`) interprets a circuit
gate-by-gate with dynamically-shaped host tensors, the engine compiles a
whole Trotter layer — all edge-color gate groups plus the interleaved BP
refreshes — into one XLA program over padded dense arrays:

* site tensors are stacked per vertex degree: ``T[k]`` has shape
  ``[n_k, d, chi, ..., chi]`` (k bond axes, zero-padded to the bond cap);
* BP messages are one array ``M[2E, chi, chi]`` keyed by directed edge id;
* a BP sweep is a staged Gauss-Seidel update batched within each
  (stage, degree, slot) group — stages follow a BFS-depth wavefront by
  default (one sweep equals a sequential forest-cover sweep, exact on
  trees) — iterated under `lax.while_loop` on the mean message fidelity:
  the same fixed point as the reference's sequential sweeps
  (`src/MessagePassing/abstractbeliefpropagationcache.jl:204-218`);
* a 2-site gate group (one edge-color class, all gates commuting) is a
  single batched kernel: batched hermitian eig of the bond environments,
  sqrt-gauging, batched QR reduction, gate contraction on the MXU, batched
  truncated SVD with static shapes (cutoff handled by masking, never by
  reshaping), and singular-value message writeback — the batched version of
  `src/Apply/simple_update.jl:21-77`.

States convert losslessly to/from the flex tier (`from_state` / `to_state`)
so boundary-MPS measurement and sampling compose with compiled evolution.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .core.index import Index
from .core.tensor import Tensor
from .graphs import NamedGraph, reverse_edge
from .networks import TensorNetworkState
from .gates import gate_matrix
from .utils.transfer import device_get as _device_get, device_put as _device_put

Array = jax.Array


# ----------------------------------------------------------------------
# static plan: everything derived from the graph alone
# ----------------------------------------------------------------------

@dataclass
class LatticePlan:
    """Static structure of a graph for the compiled engine."""

    graph: NamedGraph
    vertices: list
    degrees: dict  # vertex -> degree
    neighbor_order: dict  # vertex -> list of neighbors (bond axis order)
    buckets: dict  # degree k -> list of vertices
    bucket_pos: dict  # vertex -> (k, position in bucket)
    edge_ids: dict  # directed edge tuple -> int
    num_edges: int
    bp_groups: list  # [(k, t, src_pos [B], out_eids [B], in_eids [B, k-1], in_slots [k-1])]
    bp_schedule: str = "wavefront"  # schedule the orderings above were built for

    @staticmethod
    def build(graph: NamedGraph, bp_schedule: str = "wavefront") -> "LatticePlan":
        """`bp_schedule` controls the sweep staging:

        - "wavefront": directed edges staged by BFS depth from a central
          root — leaf-to-root then root-to-leaf, same-depth (loop) edges by
          bipartite color in between.  One sweep equals a sequential
          forest-cover sweep (exact on trees in a single iteration,
          reference `beliefpropagationcache.jl:27-29`), at the price of
          ~2*diameter smaller batched stages.
        - "color": two Gauss-Seidel stages by bipartite source color —
          maximal batches, more iterations to converge.
        """
        vertices = graph.vertices()
        neighbor_order = {v: graph.neighbors(v) for v in vertices}
        degrees = {v: len(neighbor_order[v]) for v in vertices}
        buckets: dict = {}
        bucket_pos: dict = {}
        for v in vertices:
            k = degrees[v]
            buckets.setdefault(k, []).append(v)
            bucket_pos[v] = (k, len(buckets[k]) - 1)
        edge_ids: dict = {}
        for v in vertices:
            for u in neighbor_order[v]:
                edge_ids[(v, u)] = len(edge_ids)
        # Stage the sweep by bipartite source color when possible: a fully
        # synchronous (Jacobi) update ping-pongs on bipartite graphs (every
        # lattice here), stalling the convergence check; updating color-0
        # sources then color-1 sources (Gauss-Seidel in two stages) restores
        # the sequential sweep's geometric convergence while staying batched.
        color = {vertices[0]: 0}
        stack = [vertices[0]]
        bipartite = True
        while stack:
            u = stack.pop()
            for w in neighbor_order[u]:
                if w not in color:
                    color[w] = 1 - color[u]
                    stack.append(w)
                elif color[w] == color[u]:
                    bipartite = False
        for v in vertices:  # disconnected safety
            if v not in color:
                color[v] = 0
        if not bipartite:
            color = {v: 0 for v in vertices}

        # stage assignment per directed edge
        if bp_schedule == "wavefront":
            from .graphs import center as _graph_center

            try:
                root = _graph_center(graph)[0]
            except Exception:
                root = vertices[0]
            depth = {root: 0}
            frontier = [root]
            while frontier:
                nxt = []
                for u in frontier:
                    for w in neighbor_order[u]:
                        if w not in depth:
                            depth[w] = depth[u] + 1
                            nxt.append(w)
                frontier = nxt
            for v in vertices:
                depth.setdefault(v, 0)
            dmax = max(depth.values())

            def stage_of(u, v):
                du, dv = depth[u], depth[v]
                if du > dv:  # toward the root: deepest sources first
                    return dmax - du
                if du == dv:  # loop ties, between the two phases
                    return dmax + color[u]
                return dmax + 2 + du  # away from the root

            bucket_key = lambda v: (depth[v], color[v])
        elif bp_schedule == "color":

            def stage_of(u, v):
                return color[u]

            bucket_key = lambda v: (color[v],)
        else:
            raise ValueError(f"unknown bp_schedule {bp_schedule!r}")

        # Order buckets so every (stage, degree, slot) BP group reads a
        # CONTIGUOUS bucket range and writes a CONTIGUOUS message range:
        # the sweep then uses static slices instead of gathers/scatters
        # over the large padded arrays.
        buckets = {k: sorted(vs, key=bucket_key) for k, vs in buckets.items()}
        bucket_pos = {}
        for k, vs in buckets.items():
            for i, v in enumerate(vs):
                bucket_pos[v] = (k, i)

        stage = {e: stage_of(*e) for e in edge_ids}
        ordered_edges = sorted(
            edge_ids.keys(),
            key=lambda e: (
                stage[e],
                degrees[e[0]],
                neighbor_order[e[0]].index(e[1]),
                bucket_pos[e[0]][1],
            ),
        )
        edge_ids = {e: i for i, e in enumerate(ordered_edges)}

        # BP sweep groups: by (stage, deg(src), slot of edge at src)
        groups: dict = {}
        for (u, v), eid in edge_ids.items():
            k = degrees[u]
            t = neighbor_order[u].index(v)
            groups.setdefault((stage[(u, v)], k, t), []).append((u, v, eid))
        bp_groups = []
        for (cu, k, t), items in sorted(groups.items()):
            src_pos = np.array([bucket_pos[u][1] for (u, v, eid) in items], dtype=np.int32)
            out_eids = np.array([eid for (u, v, eid) in items], dtype=np.int32)
            other_slots = [j for j in range(k) if j != t]
            in_eids = np.array(
                [
                    [edge_ids[(neighbor_order[u][j], u)] for j in other_slots]
                    for (u, v, eid) in items
                ],
                dtype=np.int32,
            ).reshape(len(items), k - 1)
            bp_groups.append((cu, k, t, src_pos, out_eids, in_eids, other_slots))
        return LatticePlan(
            graph=graph,
            vertices=vertices,
            degrees=degrees,
            neighbor_order=neighbor_order,
            buckets=buckets,
            bucket_pos=bucket_pos,
            edge_ids=edge_ids,
            num_edges=len(edge_ids),
            bp_groups=bp_groups,
            bp_schedule=bp_schedule,
        )


# ----------------------------------------------------------------------
# compiled circuit representation
# ----------------------------------------------------------------------

@dataclass
class OneSiteGroup:
    # per degree bucket: positions [B] and gate matrices [B, d, d]
    per_bucket: dict  # k -> (positions, gates)


@dataclass
class TwoSiteGroup:
    # per (ku, kv) class
    classes: list  # of _TwoSiteClass


@dataclass
class _TwoSiteClass:
    ku: int
    kv: int
    u_pos: np.ndarray  # [B]
    v_pos: np.ndarray  # [B]
    slot_u: np.ndarray  # [B] bond axis of u facing v
    slot_v: np.ndarray  # [B]
    env_u_eids: np.ndarray  # [B, ku-1] incoming message ids at u (excl. v->u)
    env_v_eids: np.ndarray  # [B, kv-1]
    eid_uv: np.ndarray  # [B]
    eid_vu: np.ndarray  # [B]
    gates: np.ndarray  # [B, d, d, d, d] (rows primed: out_u, out_v, in_u, in_v)
    gate_index: np.ndarray  # [B] position of each gate in the original circuit


def compile_circuit(plan: LatticePlan, circuit: Sequence, d: int = 2) -> list:
    """Partition a circuit (list of ``(name, verts[, param])``) into batched
    one-site groups and two-site matching groups, preserving order semantics:
    consecutive one-site gates merge; consecutive two-site gates merge while
    they remain vertex-disjoint (the edge-color structure users already
    build, `docs/src/gates.md:20-28`)."""
    groups: list = []
    current = None  # ("one", dict) or ("two", list, used_vertex_set)
    gate_counter = 0
    for gate in circuit:
        name, verts = gate[0], list(gate[1])
        param = gate[2] if len(gate) > 2 else None
        # raw matrices pass through (operator-picture folded gates,
        # `tnqs.models.operator_picture_layer`); names hit the registry
        mat = np.asarray(name) if isinstance(name, np.ndarray) else gate_matrix(name, param)
        if len(verts) == 1:
            if current is None or current[0] != "one":
                if current is not None:
                    groups.append(current)
                current = ("one", [])
            current[1].append((verts[0], mat, gate_counter))
        elif len(verts) == 2:
            if (
                current is None
                or current[0] != "two"
                or (verts[0] in current[2] or verts[1] in current[2])
            ):
                if current is not None:
                    groups.append(current)
                current = ("two", [], set())
            current[1].append((verts[0], verts[1], mat, gate_counter))
            current[2].update(verts)
        else:
            raise ValueError("engine supports 1- and 2-site gates")
        gate_counter += 1
    if current is not None:
        groups.append(current)

    compiled = []
    for g in groups:
        if g[0] == "one":
            # compose successive gates acting on the same vertex (a scatter
            # with duplicate positions would otherwise drop all but one)
            merged: dict = {}
            for (v, mat, gi) in g[1]:
                if v in merged:
                    prev_mat, prev_gi = merged[v]
                    merged[v] = (mat @ prev_mat, prev_gi)
                else:
                    merged[v] = (mat, gi)
            per_bucket: dict = {}
            for v, (mat, gi) in merged.items():
                k, pos = plan.bucket_pos[v]
                per_bucket.setdefault(k, []).append((pos, mat, gi))
            out = {}
            for k, items in per_bucket.items():
                out[k] = (
                    np.array([p for p, _, _ in items], dtype=np.int32),
                    np.stack([m for _, m, _ in items]).astype(np.complex128),
                    np.array([gi for _, _, gi in items], dtype=np.int32),
                )
            compiled.append(OneSiteGroup(out))
        else:
            classes: dict = {}
            for (u, v, mat, gi) in g[1]:
                ku, up = plan.bucket_pos[u]
                kv, vp = plan.bucket_pos[v]
                su = plan.neighbor_order[u].index(v)
                sv = plan.neighbor_order[v].index(u)
                env_u = [
                    plan.edge_ids[(plan.neighbor_order[u][j], u)]
                    for j in range(ku)
                    if j != su
                ]
                env_v = [
                    plan.edge_ids[(plan.neighbor_order[v][j], v)]
                    for j in range(kv)
                    if j != sv
                ]
                classes.setdefault((ku, kv), []).append(
                    (up, vp, su, sv, env_u, env_v, plan.edge_ids[(u, v)], plan.edge_ids[(v, u)], mat, gi)
                )
            cls_list = []
            for (ku, kv), items in sorted(classes.items()):
                cls_list.append(
                    _TwoSiteClass(
                        ku=ku,
                        kv=kv,
                        u_pos=np.array([it[0] for it in items], dtype=np.int32),
                        v_pos=np.array([it[1] for it in items], dtype=np.int32),
                        slot_u=np.array([it[2] for it in items], dtype=np.int32),
                        slot_v=np.array([it[3] for it in items], dtype=np.int32),
                        env_u_eids=np.array([it[4] for it in items], dtype=np.int32).reshape(len(items), ku - 1),
                        env_v_eids=np.array([it[5] for it in items], dtype=np.int32).reshape(len(items), kv - 1),
                        eid_uv=np.array([it[6] for it in items], dtype=np.int32),
                        eid_vu=np.array([it[7] for it in items], dtype=np.int32),
                        gates=np.stack([it[8].reshape(d, d, d, d) for it in items]).astype(np.complex128),
                        gate_index=np.array([it[9] for it in items], dtype=np.int32),
                    )
                )
            compiled.append(TwoSiteGroup(cls_list))
    return compiled


def build_program(plan: LatticePlan, compiled: list) -> list:
    """Interleave compiled gate groups with BP refreshes.

    Simulates the flex driver's affected-vertex rule at compile time
    (`/root/reference/src/Apply/apply_gates.jl:64-91`): a BP refresh
    precedes a 2-site group iff any of its vertices were touched since the
    last refresh.  Shared by the single-device step (`make_step`) and the
    halo-sharded step (`tnqs/parallel/halo_step.py`)."""
    program: list = []
    affected: set = set()
    for gidx, g in enumerate(compiled):
        if isinstance(g, OneSiteGroup):
            program.append(("one", g, gidx))
            for k, (pos, _, _) in g.per_bucket.items():
                for p in pos:
                    affected.add(plan.buckets[k][int(p)])
        else:
            verts = set()
            for cls in g.classes:
                for up, vp in zip(cls.u_pos, cls.v_pos):
                    verts.add(plan.buckets[cls.ku][int(up)])
                    verts.add(plan.buckets[cls.kv][int(vp)])
            if affected & verts:
                program.append(("bp",))
                affected = set()
            program.append(("two", g, gidx))
            affected |= verts
    return program


# ----------------------------------------------------------------------
# kernels (all shapes static; called inside jit)
# ----------------------------------------------------------------------

def _absorb_message(A: Array, M: Array, axis: int, precision=None) -> Array:
    """Contract the ket bond `axis` of batched tensor A with message M.

    A: [B, ..., chi@axis, ...]; M: [B, chi, chi] as (ket, out)."""
    A = jnp.moveaxis(A, axis, -1)
    A = (
        jnp.einsum("...i,Bij->...j", A, M, precision=precision)
        if A.ndim == 2
        else jnp.einsum("B...i,Bij->B...j", A, M, precision=precision)
    )
    return jnp.moveaxis(A, -1, axis)


def _pseudo_sqrt_roots(E: Array, cutoff: float, eigh_fn=None):
    """Batched pseudo sqrt / inv-sqrt of hermitized env messages.

    E: [..., chi, chi] -> (W, Winv) with eigenvalues below `cutoff` zeroed
    (mirrors `pseudo_sqrt_inv_sqrt`, `src/utils.jl:18-26`)."""
    H = 0.5 * (E + jnp.swapaxes(E, -1, -2).conj())
    if eigh_fn is None:
        eigh_fn = jnp.linalg.eigh
    w, U = eigh_fn(H)
    w = jnp.real(w)
    ok = jnp.abs(w) >= cutoff
    sq = jnp.where(ok, jnp.sqrt(jnp.clip(w, 0.0, None)), 0.0)
    isq = jnp.where(ok & (sq > 0), 1.0 / jnp.where(sq > 0, sq, 1.0), 0.0)
    Uc = U.conj()
    W = jnp.einsum("...ik,...k,...jk->...ij", U, sq.astype(U.dtype), Uc)
    Winv = jnp.einsum("...ik,...k,...jk->...ij", U, isq.astype(U.dtype), Uc)
    return W, Winv


def _truncate_mask(s: Array, chi: int, cutoff: float, tail_extra: Array | None = None):
    """Static-shape truncation: given singular values [B, K] (descending),
    return (s_padded [B, chi], mask [B, chi], err [B]) following the
    reference's relative-cutoff semantics (`truncation_rank`).

    `tail_extra` [B] adds spectral weight known to lie BELOW the provided
    values (the subspace eigensolver's unresolved tail) to both the total
    and every cumulative tail, keeping cutoff decisions and reported
    truncation errors exact."""
    B, K = s.shape
    p = s * s
    total = jnp.sum(p, axis=1, keepdims=True)
    # tail[k] = sum_{j >= k} p_j
    tail = jnp.cumsum(p[:, ::-1], axis=1)[:, ::-1]
    if tail_extra is not None:
        te = tail_extra.astype(p.dtype)[:, None]
        total = total + te
        tail = tail + te
    total = jnp.where(total > 0, total, 1.0)
    # n* = smallest k with tail[k] <= cutoff * total (keep k singular values)
    drop_ok = tail <= cutoff * total  # [B, K] monotone along axis 1
    nstar = K - jnp.sum(drop_ok, axis=1)  # number to keep by cutoff alone
    nstar = jnp.clip(nstar, 1, chi)
    idx = jnp.arange(chi)[None, :]
    if K >= chi:
        s_pad = s[:, :chi]
    else:
        s_pad = jnp.pad(s, ((0, 0), (0, chi - K)))
    mask = idx < nstar[:, None]
    # err = discarded fraction: tail at the first dropped position
    beyond = (
        jnp.zeros((B, 1), dtype=tail.dtype)
        if tail_extra is None
        else tail_extra.astype(tail.dtype)[:, None]
    )
    tail_full = jnp.concatenate([tail, beyond], axis=1)
    err = jnp.take_along_axis(tail_full, nstar[:, None], axis=1)[:, 0] / total[:, 0]
    return s_pad * mask, mask, err


def _cholesky_gauge_roots(E: Array, eps: float):
    """Batched non-hermitian gauge roots from Cholesky.

    The simple-update bond gauge only needs ANY factor W with W @ W^H = E
    (the environment weighting of the truncation norm is `A W W^H A^H`;
    the specific square root cancels exactly through the un-gauge).  The
    lower Cholesky factor of the (regularized) hermitized environment is
    ~7x cheaper on TPU than the hermitian pseudo-sqrt's eigendecomposition
    (4.4 vs 30 ms on the benchmark's [96, 64, 64] batch).

    The un-gauge convention in `_unreduce` contracts `conj(Winv)` as
    `A . conj(Winv)^T`, so identity requires Winv = conj(L^{-1})^T.

    Regularization delta ~ eps * tr(E)/chi keeps padded/null directions
    SPD.  Their `Winv` rows would be ~1/sqrt(delta) (~1e4 at f32): that is
    NOT harmless — the recombined update is only zero there to eigensolve
    accuracy, and the TPU Jacobi kernel's ~3e-6 residual times 1e4 injects
    ~1e-2 of garbage per layer into the dead bond directions, which
    compounds to NaN within 3 layers while bonds are still saturating
    (diagnosed on the chi=64 Eagle benchmark; CPU LAPACK's ~1e-7 residual
    kept the same amplification below the truncation floor).  Null
    directions are therefore ZEROED in Winv (pseudo-inverse semantics,
    matching the reference's spectral-cutoff pseudo-sqrt): environments
    are s-diagonal messages, so the Cholesky diagonal localizes them
    exactly.
    """
    H = 0.5 * (E + jnp.swapaxes(E, -1, -2).conj())
    chi = H.shape[-1]
    diag_scale = jnp.real(jnp.einsum("...ii->...", H)) / chi
    delta = jnp.maximum(jnp.abs(diag_scale) * (32.0 * eps), 1e-30)
    eye = jnp.eye(chi, dtype=H.dtype)
    A = H + delta[..., None, None] * eye
    L = jnp.linalg.cholesky(A)
    eye_b = jnp.broadcast_to(eye, A.shape)
    Linv = jax.scipy.linalg.solve_triangular(L, eye_b, lower=True)
    # null detection: live directions have L[j,j]^2 >> delta; regularized
    # null directions sit at L[j,j]^2 ~ delta
    diagL2 = jnp.abs(jnp.diagonal(L, axis1=-2, axis2=-1)) ** 2
    keep = (diagL2 > (64.0 * delta)[..., None]).astype(Linv.dtype)
    Winv = jnp.conj(jnp.swapaxes(Linv * keep[..., :, None], -1, -2))
    return L.astype(E.dtype), Winv.astype(E.dtype)


def _svd_fallback(mat: Array):
    """Batched SVD; TPU-safe for complex via jnp.linalg.svd."""
    return jnp.linalg.svd(mat, full_matrices=False)


class _BandRows:
    """Row indices for one band of a halo-sharded step.

    Wraps a static [D, B] per-band row table: `rows` is the traced band
    selection (for gathers), while the static per-band inverse permutation
    keeps `_scatter_rows` on its exact single-pass gather+select form even
    though the band index is traced.  Rows listed in `drop_rows` (padding
    sentinels like the clean-zero ghost row) are excluded from the inverse,
    so their updates are discarded instead of written."""

    def __init__(self, rows_tbl: np.ndarray, n_rows: int, b_idx, drop_rows=()):
        self._tbl = np.asarray(rows_tbl, dtype=np.int32)
        D, B = self._tbl.shape
        inv = np.full((D, n_rows), -1, dtype=np.int32)
        drop = set(int(r) for r in drop_rows)
        for b in range(D):
            for i, r in enumerate(self._tbl[b]):
                r = int(r)
                if 0 <= r < n_rows and r not in drop and inv[b, r] < 0:
                    inv[b, r] = i
        self._inv = inv
        self.rows = jnp.asarray(self._tbl)[b_idx]
        self.b_idx = b_idx

    def __len__(self):
        return self._tbl.shape[1]


def _rows_of(pos):
    return pos.rows if isinstance(pos, _BandRows) else pos


def _scatter_rows(Tk: Array, pos, updates: Array) -> Array:
    """Write `updates` [B, ...] into rows `pos` of `Tk` [n, ...].

    The positions are STATIC (plan data), so the scatter inverts into a
    static row gather + select — exact and single-pass, where XLA's
    `at[pos].set` scatter blows the 16MB scoped-VMEM limit on 24MB update
    rows at chi=64 and a one-hot matmul pays the multi-pass f32 precision
    tax.  Positions must be unique.  A `_BandRows` pos keeps the same form
    with the band-selected static inverse."""
    n = Tk.shape[0]
    if isinstance(pos, _BandRows):
        inv = jnp.asarray(pos._inv)[pos.b_idx]
        gathered = updates[jnp.clip(inv, 0, None)]
        sel = (inv >= 0).reshape((n,) + (1,) * (Tk.ndim - 1))
        return jnp.where(sel, gathered, Tk)
    pos = np.asarray(pos)
    inv = np.full((n,), -1, dtype=np.int32)
    inv[pos] = np.arange(len(pos), dtype=np.int32)
    gathered = updates[jnp.asarray(np.clip(inv, 0, None))]
    sel = jnp.asarray((inv >= 0).reshape((n,) + (1,) * (Tk.ndim - 1)))
    return jnp.where(sel, gathered, Tk)


# ----------------------------------------------------------------------
# the engine
# ----------------------------------------------------------------------

class LatticeEngine:
    """Compiled simple-update evolution for a fixed graph at a fixed bond cap.

    Build from a `TensorNetworkState` (bonds are zero-padded to `chi`), call
    :meth:`make_step` once per circuit layer shape (compiled once), then
    iterate; convert back with :meth:`to_state` for boundary-MPS measurement
    and sampling, or measure single-site observables on-device with
    :meth:`expect_1site`.
    """

    def __init__(self, psi: TensorNetworkState, chi: int, dtype=jnp.complex64, device=None, factor_method: str = "auto", bp_schedule: str = "auto", bp_kernel: str = "auto"):
        if bp_schedule == "auto":
            # TPU: "color" — 2 Gauss-Seidel stages, ~12 big fused-kernel
            # launches per sweep, and ~30x faster XLA+Mosaic compiles than
            # the 80-group wavefront staging (measured: 8 s vs 235 s per
            # fixed-point program on Eagle-127 at chi=64, with color even
            # faster per sweep, 3.9 vs 4.7 ms — docs/performance.md).
            # CPU: "wavefront" — exact-on-trees single sweeps; XLA:CPU
            # compiles the many small stages cheaply.
            bp_schedule = "color" if jax.default_backend() == "tpu" else "wavefront"
        self.plan = LatticePlan.build(psi.graph, bp_schedule=bp_schedule)
        self.chi = int(chi)
        self.dtype = dtype
        if factor_method == "auto":
            # LAPACK QR/SVD is exact and fast on CPU; on TPU the iterative
            # XLA lowerings dominate the step, so use the MXU matmul forms
            factor_method = "direct" if jax.default_backend() == "cpu" else "gram"
        if factor_method not in ("direct", "gram"):
            raise ValueError(f"unknown factor_method {factor_method!r}")
        self.factor_method = factor_method
        # BP sweep backend: the fused Pallas kernel (`tnqs/ops/bp_sweep.py`)
        # reads each site tensor from HBM once per outgoing message, where
        # the XLA einsum chain materializes every absorb intermediate.
        # "auto" = Pallas on TPU for complex64, XLA otherwise; "interpret"
        # runs the kernel through the Pallas interpreter (CPU testing).
        if bp_kernel not in ("auto", "pallas", "xla", "interpret"):
            raise ValueError(f"unknown bp_kernel {bp_kernel!r}")
        if bp_kernel == "auto":
            bp_kernel = "pallas" if jax.default_backend() == "tpu" else "xla"
        self.bp_kernel = bp_kernel
        # Environment gauge factor for the batched (gram) two-site path:
        # "cholesky" = lower-triangular W with W W^H = E_reg (~7x cheaper
        # than the hermitian pseudo-sqrt's eigensolve on TPU; the gauge
        # cancels exactly, see `_cholesky_gauge_roots`); "eigh" = the
        # reference's pseudo-sqrt with spectral cutoff
        # (`/root/reference/src/utils.jl:18-26`), kept on the direct path
        # and for the f64 golden trajectories.
        self.env_gauge = "cholesky" if self.factor_method == "gram" else "eigh"
        # Tall-side reduction on the gram path: "cholqr2" = explicit
        # shifted CholeskyQR2 (two [B, R_env, n] triangular solves per
        # side); "gram_nofactor" = Q-free Gram-space R factor with
        # X @ (R^{-1} R_new) recombination (`gram_rfactor`) — fewer large
        # ops but its Gram-space second round is f32-unstable on
        # near-null directions (lambda ~ shift amplifies rounding by
        # 1/shift), so it is experimental/opt-in.
        import os as _os

        self.reduce_method = _os.environ.get("TNQS_REDUCE", "cholqr2")
        # Two-site truncation solver:
        # "svd" = direct (unsquared) jnp.linalg.svd of theta — the
        #   PRODUCTION TPU path.  The Gram routes square kappa(theta), so
        #   their absolute f32 eigh noise (~5e-6 on TPU for EVERY available
        #   backend — XLA QDWH and the Pallas Jacobi alike, measured by
        #   `scripts/probe_eigh_backends.py`; C128 is not a TPU type, so
        #   there is no f64 escape hatch) lands on the small singular
        #   directions and is then amplified by the 1/sqrt(s_min) un-gauge
        #   factors to ~1e-3/layer.  The direct SVD keeps errors graded the
        #   way the flex tier's LAPACK gesdd does: the committed chi=64
        #   Eagle parity artifact (`tests/golden/tpu_parity_chi64.json`)
        #   tracks flex-f64 to 1.4e-6 over 10 layers — BELOW the flex-f32
        #   control floor (5.3e-6).
        # "subspace" = randomized subspace iteration to the top chi+8 Gram
        #   pairs (MXU matmuls + one small Rayleigh-Ritz solve) — the fast
        #   mode (~1.5x layer throughput), accurate to the measured ~2e-3 /
        #   10-layer envelope (`tpu_parity_chi64_subspace.json`): gapless
        #   saturated spectra defeat subspace capture, so use it when
        #   throughput matters more than trajectory parity.
        # "full" = exact batched eigh of the Gram (CPU default: LAPACK).
        if jax.default_backend() == "tpu" and self.factor_method == "gram":
            default_trunc = "svd"
        else:
            default_trunc = "full"
        self.trunc_method = _os.environ.get("TNQS_TRUNC", "") or default_trunc
        if self.trunc_method not in ("svd", "subspace", "full"):
            raise ValueError(f"unknown trunc_method {self.trunc_method!r}")
        # Backend for trunc_method="svd": "pjsvd" = the preconditioned
        # one-sided Jacobi Pallas kernel (`tnqs.ops.osj.pjsvd`) — same
        # graded/backward-stable error structure as a direct SVD (nothing
        # squares or divides by a small singular value on the output path)
        # at a fraction of the cost of XLA's QDWH + spectral
        # divide-and-conquer; "xla" = jnp.linalg.svd.  "auto" resolves to
        # pjsvd on TPU IFF a committed on-chip 10-layer parity artifact
        # certifies the kernel at the production bar
        # (`tnqs.ops.osj.pjsvd_certified`; artifact written by
        # `scripts/tpu_parity_check.py --trunc svd --svd-impl pjsvd`,
        # gate = the flex-f32 control floor), and to xla everywhere else:
        # pjsvd matches the XLA trajectory on CPU (`tests/test_ops.py`)
        # but Pallas kernels have a record of CPU-green/TPU-wrong behavior
        # on this backend (docs/performance.md, "the NaN hunt"), so
        # nothing routes to the kernel without chip evidence.
        # TNQS_SVD_IMPL overrides.
        self.svd_impl = _os.environ.get("TNQS_SVD_IMPL", "") or "auto"
        if self.svd_impl not in ("auto", "pjsvd", "xla"):
            raise ValueError(f"unknown svd_impl {self.svd_impl!r}")
        if self.svd_impl == "auto":
            if jax.default_backend() == "tpu":
                from .ops.osj import pjsvd_certified

                self.svd_impl = "pjsvd" if pjsvd_certified() else "xla"
            else:
                self.svd_impl = "xla"
        # Precision of the BP message sweeps, the step's FLOPs hot spot
        # (~70% at chi=64).  None inherits the global policy (highest);
        # "high" (bf16_3x) is ~3x faster per sweep — validated to stay
        # within the 1e-5 observable tolerance on the oracle checks.
        self.bp_precision = None
        sinds = psi.siteinds()
        dims = {s.dim for v in psi.vertices() for s in sinds[v]}
        if len(dims) != 1:
            raise ValueError("engine requires a uniform site dimension")
        counts = {len(sinds[v]) for v in psi.vertices()}
        if len(counts) != 1:
            raise ValueError("engine requires a uniform site-index count per vertex")
        # Multi-leg sites (operator states, `inds_per_site=2`: Heisenberg-
        # picture and thermal workloads) fold into one site axis of dim
        # d0^legs; gates then act on the folded axis (see
        # `tnqs.models.operator_picture_layer`).  Mirrors the reference's
        # operator TNS (`tensornetworkstate_constructors.jl:21-41`).
        self.site_legs = counts.pop()
        d0 = dims.pop()
        self.d = d0**self.site_legs
        self._site_indices = {v: list(sinds[v]) for v in psi.vertices()}
        self._site_index = {v: self._site_indices[v][0] for v in psi.vertices()}
        self.T = self._pack_state(psi)
        self.M = self._initial_messages()
        self._step_cache: dict = {}
        # via numpy: creating a 0-d complex device array is itself an
        # unimplemented op on tunneled backends
        self.real_dtype = np.zeros((), np.dtype(dtype)).real.dtype
        self.sqrt_cutoff = float(10 * jnp.finfo(self.real_dtype).eps)

    # -- state packing --------------------------------------------------
    def _pack_state(self, psi: TensorNetworkState) -> dict:
        chi, d = self.chi, self.d
        plan = self.plan
        T = {}
        for k, verts in plan.buckets.items():
            arr = np.zeros((len(verts), d) + (chi,) * k, dtype=np.dtype(self.dtype))
            for p, v in enumerate(verts):
                t = psi[v]
                order = list(self._site_indices[v]) + [
                    psi.virtualind((v, u)) for u in plan.neighbor_order[v]
                ]
                data = np.asarray(t.permute(order).data)
                # fold the (adjacent, leading) site legs into one axis
                data = data.reshape((d,) + data.shape[self.site_legs :])
                slices = (slice(0, d),) + tuple(
                    slice(0, i.dim) for i in order[self.site_legs :]
                )
                arr[(p,) + slices] = data
            T[k] = _device_put(arr)
        return T

    def _initial_messages(self) -> Array:
        chi = self.chi
        eye = np.eye(chi, dtype=np.dtype(self.dtype)) / chi
        return _device_put(np.broadcast_to(eye, (self.plan.num_edges, chi, chi)).copy())

    def to_state(self) -> TensorNetworkState:
        """Unpack into a flex-tier TensorNetworkState (bonds stay chi-padded;
        zero pads are numerically inert)."""
        plan = self.plan
        bond_index = {}
        for (u, v) in plan.graph.edges():
            bond_index[frozenset((u, v))] = Index(self.chi, "Link")
        tensors = {}
        site_inds = {}
        T_host = {k: _device_get(arr) for k, arr in self.T.items()}
        for v in plan.vertices:
            k, pos = plan.bucket_pos[v]
            ss = self._site_indices[v]
            inds = list(ss) + [
                bond_index[frozenset((v, u))] for u in plan.neighbor_order[v]
            ]
            data = T_host[k][pos]
            if self.site_legs > 1:  # unfold the site axis back into legs
                data = data.reshape(tuple(i.dim for i in ss) + data.shape[1:])
            tensors[v] = Tensor(data, inds)
            site_inds[v] = list(ss)
        return TensorNetworkState(tensors, plan.graph.copy(), site_inds)

    def to_bp_cache(self):
        """Flex BP cache carrying over the engine's converged messages."""
        from .bp import BeliefPropagationCache

        psi = self.to_state()
        bpc = BeliefPropagationCache(psi)
        M_host = _device_get(self.M)
        for (u, v), eid in self.plan.edge_ids.items():
            b = psi.virtualind((u, v))
            bpc.set_message((u, v), Tensor(M_host[eid], [b, b.prime()]))
        return bpc

    # -- BP sweep -------------------------------------------------------
    def _bp_planes(self, T: dict) -> dict | None:
        """Pre-permuted real/imag f32 plane layouts for every (degree, slot)
        the fused Pallas BP kernel can handle, or None when the kernel is
        disabled.  Computed once per fixed-point call (T is loop-invariant
        during BP) so the conversions amortize over all iterations/stages."""
        if self.bp_kernel == "xla":
            return None
        from .ops.bp_sweep import plane_layouts, supports_group

        planes = {}
        for k, arr in T.items():
            if k >= 2 and supports_group(k, self.chi, self.d, self.dtype):
                pr = jnp.real(arr).astype(jnp.float32)
                pi = jnp.imag(arr).astype(jnp.float32)
                for t in range(k):
                    planes[(k, t)] = plane_layouts(pr, pi, k, t)
        return planes or None

    def _bp_new_messages(self, T: dict, M: Array, planes: dict | None = None) -> Array:
        """One BP iteration: batched within each (color, degree, slot) group,
        staged over bipartite source colors (Gauss-Seidel between stages)."""
        plan = self.plan
        prec = self.bp_precision
        stages = sorted({g[0] for g in plan.bp_groups})
        for stage in stages:
            out = M
            for (cu, k, t, src_pos, out_eids, in_eids, other_slots) in plan.bp_groups:
                if cu != stage:
                    continue
                # contiguous-by-construction bucket ranges: slice, not gather
                lo, hi = int(src_pos[0]), int(src_pos[-1]) + 1
                contiguous = hi - lo == len(src_pos)
                if planes is not None and (k, t) in planes and contiguous:
                    from .ops.bp_sweep import bp_sweep_group

                    # Mosaic rejects Precision.HIGH; the kernel implements
                    # the "high" contract as a manual 3-pass bf16 split
                    kmode = "bf16_3x" if prec == "high" else "highest"
                    Min = M[in_eids]  # [B, k-1, chi, chi]
                    mr, mi = bp_sweep_group(
                        *planes[(k, t)],
                        jnp.real(Min).astype(jnp.float32),
                        jnp.imag(Min).astype(jnp.float32),
                        lo=lo,
                        k=k,
                        interpret=self.bp_kernel == "interpret",
                        mode=kmode,
                    )
                    m_new = lax.complex(mr, mi).astype(M.dtype)
                else:
                    if contiguous:
                        A = lax.slice_in_dim(T[k], lo, hi, axis=0)
                    else:  # irregular fallback
                        A = T[k][src_pos]
                    Asrc = A
                    for col, j in enumerate(other_slots):
                        Mj = M[in_eids[:, col]]
                        A = _absorb_message(A, Mj, axis=2 + j, precision=prec)
                    # contract with conj(T) over site + all bra axes except slot t
                    Tc = jnp.conj(Asrc)
                    a_sub = ["B", "s"] + [chr(ord("a") + j) for j in range(k)]
                    b_sub = ["B", "s"] + [chr(ord("a") + j) for j in range(k)]
                    a_sub[2 + t] = "i"
                    b_sub[2 + t] = "j"
                    expr = f"{''.join(a_sub)},{''.join(b_sub)}->Bij"
                    m_new = jnp.einsum(expr, A, Tc, precision=prec)
                # sum-normalize (reference `updated_message`,
                # `abstractbeliefpropagationcache.jl:183-187`)
                norm = jnp.sum(m_new, axis=(1, 2), keepdims=True)
                safe = jnp.where(jnp.abs(norm) > 0, norm, 1.0)
                m_new = m_new / safe
                elo, ehi = int(out_eids[0]), int(out_eids[-1]) + 1
                if ehi - elo == len(out_eids):
                    out = lax.dynamic_update_slice_in_dim(out, m_new, elo, axis=0)
                else:  # irregular fallback
                    out = out.at[out_eids].set(m_new)
            M = out  # stage barrier: later colors read updated messages
        return M

    def bp_update(self, maxiter: int = 30, tolerance: float | None = None):
        """Run synchronous BP to convergence (jitted while_loop)."""
        if tolerance is None:
            tolerance = float(default_engine_tolerance(self.dtype))
        self.M = self._bp_fixed_point(self.T, self.M, maxiter, tolerance)
        return self

    @partial(jax.jit, static_argnums=(0, 3, 5))
    def _bp_fixed_point(self, T: dict, M: Array, maxiter: int, tolerance: float, use_kernel: bool = True) -> Array:
        """`use_kernel=False` skips the fused-Pallas path: the kernel needs
        pre-permuted real/imag plane copies of every site tensor (~19 ms of
        strided HBM transposes at the benchmark shapes) that only amortize
        over many sweep iterations.  In-step refreshes run 2-3 iterations
        from a near-fixed point, where the XLA einsum sweep (~6.5 ms/iter,
        no conversion) is strictly faster — measured in
        `scripts/microbench_gate.py`; the step compiles with kernel-free
        refreshes (`make_step`) while standalone convergence
        (:meth:`bp_update`) keeps the kernel."""
        def diff(Ma, Mb):
            na = jnp.linalg.norm(Ma.reshape(Ma.shape[0], -1), axis=1)
            nb = jnp.linalg.norm(Mb.reshape(Mb.shape[0], -1), axis=1)
            dot = jnp.sum(jnp.conj(Ma) * Mb, axis=(1, 2))
            denom = jnp.where(na * nb > 0, na * nb, 1.0)
            f = jnp.abs(dot / denom) ** 2
            return jnp.mean(1.0 - f)

        planes = self._bp_planes(T) if use_kernel else None

        def cond(carry):
            M_cur, it, eps = carry
            return (it < maxiter) & (eps > tolerance)

        def body(carry):
            M_cur, it, _ = carry
            M_new = self._bp_new_messages(T, M_cur, planes)
            return (M_new, it + 1, diff(M_cur, M_new))

        M1 = self._bp_new_messages(T, M, planes)
        M_final, _, _ = lax.while_loop(cond, body, (M1, jnp.asarray(1), diff(M, M1)))
        return M_final

    # -- gate kernels ---------------------------------------------------
    def _gather_permuted(self, T: dict, k: int, pos: Array, slot: Array):
        """Gather bucket-k tensors at `pos` with bond axis `slot` moved last.

        Implemented as a static sum over the <=k possible slot values (slots
        are per-edge data, but the permutation must be static): tensors with
        slot j get jnp.moveaxis(.., 1+j, -1), selected by a mask."""
        A = T[k][_rows_of(pos)]  # [B, d, chi x k]
        out = None
        for j in range(k):
            Aj = jnp.moveaxis(A, 2 + j, A.ndim - 1)
            sel = (slot == j).astype(A.dtype)
            sel = sel.reshape((-1,) + (1,) * (A.ndim - 1))
            out = Aj * sel if out is None else out + Aj * sel
        return out  # [B, d, chi x (k-1), chi_active]

    def _scatter_permuted(self, T: dict, k: int, pos: Array, slot: Array, A_new: Array) -> dict:
        """Inverse of `_gather_permuted`: move the last axis back to slot and
        scatter into the bucket."""
        out = None
        for j in range(k):
            Aj = jnp.moveaxis(A_new, A_new.ndim - 1, 2 + j)
            sel = (slot == j).astype(A_new.dtype).reshape((-1,) + (1,) * (A_new.ndim - 1))
            out = Aj * sel if out is None else out + Aj * sel
        T = dict(T)
        T[k] = _scatter_rows(T[k], pos, out)
        return T

    def _reduced(self, A: Array, envs: Array, k: int):
        """Gauge + QR-reduce one side: A [B, d, chi x (k-1), chi_active],
        envs [B, k-1, chi, chi].  Returns (Q [B, R, r], Rfac [B, r, d*chi],
        Winv [B, k-1, chi, chi])."""
        eigh_fn = None
        if self.factor_method == "gram":
            from .ops.factorizations import default_eigh

            eigh_fn = default_eigh(self.chi)
        W, Winv = _pseudo_sqrt_roots(envs, self.sqrt_cutoff, eigh_fn=eigh_fn)
        Q, Rfac = self._reduce_with(A, W, k)
        return Q, Rfac, Winv

    def _reduce_with(self, A: Array, W: Array, k: int):
        """QR-reduce one gauged side given precomputed env sqrts."""
        A = self._gauged_matrix(A, W, k)
        R_env, n = A.shape[1], A.shape[2]
        if R_env <= n:
            # wide case: QR reduces nothing (r = R_env already); skip it
            Q = jnp.broadcast_to(jnp.eye(R_env, dtype=A.dtype), (A.shape[0], R_env, R_env))
            Rfac = A
        elif self.factor_method == "gram":
            from .ops.factorizations import cholesky_qr

            Q, Rfac = cholesky_qr(A)
        else:
            Q, Rfac = jnp.linalg.qr(A)
        return Q, Rfac

    def _gauged_matrix(self, A: Array, W: Array, k: int) -> Array:
        """Absorb the env gauge roots and matricize: [B, d, chi x (k-1),
        chi_active] -> [B, R_env, d*chi] with R_env = chi^(k-1)."""
        B = A.shape[0]
        chi, d = self.chi, self.d
        for j in range(k - 1):
            A = _absorb_message(A, W[:, j], axis=2 + j)
        # [B, d, e1..e_{k-1}, a] -> [B, e..., d, a] -> [B, R, d*a]
        perm = (0,) + tuple(range(2, k + 1)) + (1, k + 1)
        A = jnp.transpose(A, perm)
        return A.reshape(B, chi ** (k - 1), d * chi)

    def _unreduce(self, Q: Array, R_new: Array, Winv: Array, k: int):
        """Recombine Q [B, R_env, r] with R_new [B, r, d*chi], un-gauge, and
        restore the [B, d, chi x (k-1), chi_active] layout."""
        return self._restore(jnp.einsum("BRr,Brx->BRx", Q, R_new), Winv, k)

    def _restore(self, Aflat: Array, Winv: Array, k: int):
        """Un-gauge a recombined flat side [B, R_env, d*chi] and restore the
        [B, d, chi x (k-1), chi_active] layout."""
        B = Aflat.shape[0]
        chi, d = self.chi, self.d
        A = Aflat.reshape((B,) + (chi,) * (k - 1) + (d, chi))
        perm = (0, k) + tuple(range(1, k)) + (k + 1,)
        A = jnp.transpose(A, perm)  # [B, d, e..., a]
        for j in range(k - 1):
            # ungauge: contract bra-side with conj(Winv)
            A = jnp.moveaxis(A, 2 + j, -1)
            A = jnp.einsum("B...j,Bij->B...i", A, jnp.conj(Winv[:, j]))
            A = jnp.moveaxis(A, -1, 2 + j)
        return A

    def _apply_two_site_class(self, T: dict, M: Array, errors: Array, cls: _TwoSiteClass, cutoff: float, normalize: bool, gates: Array | None = None):
        chi, d = self.chi, self.d
        ku, kv = cls.ku, cls.kv
        Bn = len(cls.u_pos)
        Au = self._gather_permuted(T, ku, cls.u_pos, cls.slot_u)
        Av = self._gather_permuted(T, kv, cls.v_pos, cls.slot_v)
        env_u = M[cls.env_u_eids] if ku > 1 else jnp.zeros((Bn, 0, chi, chi), M.dtype)
        env_v = M[cls.env_v_eids] if kv > 1 else jnp.zeros((Bn, 0, chi, chi), M.dtype)
        Qu, Ru, Winv_u = self._reduced(Au, env_u, ku)
        Qv, Rv, Winv_v = self._reduced(Av, env_v, kv)
        ru = Ru.shape[1]
        rv = Rv.shape[1]
        Ru = Ru.reshape(Bn, ru, d, chi)
        Rv = Rv.reshape(Bn, rv, d, chi)
        theta = jnp.einsum("Bxda,Byea->Bxdye", Ru, Rv)
        if gates is None:
            gates = jnp.asarray(cls.gates, dtype=M.dtype)
        else:
            gates = gates.astype(M.dtype)
        theta = jnp.einsum("Bxdye,Bpqde->Bxpyq", theta, gates)
        theta_mat = theta.reshape(Bn, ru * d, rv * d)
        if self.factor_method == "gram":
            from .ops.factorizations import gram_svd

            U, s, Vh = gram_svd(theta_mat)
        else:
            U, s, Vh = _svd_fallback(theta_mat)
        recomb_u = lambda Rn: jnp.einsum("BRr,Brx->BRx", Qu, Rn)
        recomb_v = lambda Rn: jnp.einsum("BRr,Brx->BRx", Qv, Rn)
        return self._finish_two_site(
            T, M, errors, cls, U, s, Vh, recomb_u, recomb_v, Winv_u, Winv_v, ru, rv, Bn,
            cutoff, normalize,
        )

    def _apply_two_site_group(self, T: dict, M: Array, errors: Array, classes, gates_list, cutoff: float, normalize: bool):
        """Apply one edge-color gate group with per-group batched
        eigensolves: all bond environments (every class and side) go through
        ONE pseudo-sqrt kernel call, and all same-size Gram matrices of the
        truncated SVDs through ONE more — the Jacobi kernel's round latency
        is paid per call, so consolidation across classes is the difference
        between 6 and 2 launches per group.

        Gathering every class's environments from the pre-group M here is
        EQUIVALENT to the direct path's sequential per-class application: a
        group's gates are vertex-disjoint (edge-color batching,
        `compile_circuit`), so a class only ever writes the messages on its
        own gate bonds, which cannot appear among another class's incoming
        environments (those enter at that class's own vertices).  Verified
        by `tests/test_ops.py::test_engine_gram_matches_direct`."""
        chi, d = self.chi, self.d
        from .ops.factorizations import cholesky_qr, default_eigh

        eps = float(np.finfo(self.real_dtype).eps)

        # phase 1: gather sides + collect env matrices
        env_bank = []
        env_slices = []
        pos = 0
        gathered = []
        for cls in classes:
            Au = self._gather_permuted(T, cls.ku, cls.u_pos, cls.slot_u)
            Av = self._gather_permuted(T, cls.kv, cls.v_pos, cls.slot_v)
            Bn = len(cls.u_pos)
            sl = []
            for (k, eids) in ((cls.ku, cls.env_u_eids), (cls.kv, cls.env_v_eids)):
                if k > 1:
                    e = M[eids].reshape(-1, chi, chi)
                    env_bank.append(e)
                    sl.append((pos, e.shape[0], k))
                    pos += e.shape[0]
                else:
                    sl.append(None)
            gathered.append((cls, Au, Av, Bn, sl))

        W_all = Winv_all = None
        if env_bank:
            E_all = jnp.concatenate(env_bank, axis=0)
            if self.env_gauge == "cholesky":
                W_all, Winv_all = _cholesky_gauge_roots(E_all, eps)
            else:
                W_all, Winv_all = _pseudo_sqrt_roots(
                    E_all, self.sqrt_cutoff, eigh_fn=default_eigh(chi)
                )

        # phase 2: per class, gauge + matricize both sides.  Tall sides
        # (R_env = chi^(k-1) > d*chi) take the Q-FREE reduction: their R
        # factor comes from the Gram matrix alone (`gram_rfactor`, banked
        # across classes/sides into ONE Cholesky chain), theta is built
        # from R, and phase 4 recombines as X @ (R^{-1} R_new) — the only
        # [B, R_env, d*chi]-sized operations left are one Gram matmul and
        # one recombination matmul per side (explicit CholeskyQR2 paid two
        # extra R_env-sized triangular solves and a second R_env-sized
        # Gram per side).  Wide sides (degree-2 vertices) need no
        # reduction at all: R = X.
        from .ops.factorizations import apply_rinv, cholesky_qr, gram_rfactor

        n_red = d * chi
        sides = []  # per class: (cls, side_u, side_v, Winv_u, Winv_v, Bn)
        x_bank = []  # (key, Gram) of Q-free tall sides, all [B_i, n, n]
        for ci, (cls, Au, Av, Bn, sl) in enumerate(gathered):
            def env_w(slot, k):
                if slot is None:
                    return (
                        jnp.zeros((Bn, 0, chi, chi), M.dtype),
                        jnp.zeros((Bn, 0, chi, chi), M.dtype),
                    )
                start, count, kk = slot
                return (
                    W_all[start : start + count].reshape(Bn, k - 1, chi, chi),
                    Winv_all[start : start + count].reshape(Bn, k - 1, chi, chi),
                )

            Wu, Winv_u = env_w(sl[0], cls.ku)
            Wv, Winv_v = env_w(sl[1], cls.kv)
            Xu = self._gauged_matrix(Au, Wu, cls.ku)
            Xv = self._gauged_matrix(Av, Wv, cls.kv)

            def make_side(X):
                if X.shape[1] <= n_red:
                    # wide: R = X, recombination is the identity
                    return ("wide", X)
                if self.reduce_method == "gram_nofactor":
                    # Gram is [B, n, n] regardless of R_env, so all tall
                    # sides bank into ONE small Cholesky chain; R and the
                    # recombination solves are filled in after the bank
                    x_bank.append((id(X), jnp.einsum("bji,bjk->bik", jnp.conj(X), X)))
                    return ("bank", X)
                Q, R = cholesky_qr(X)
                return ("q", (Q, R))

            sides.append((cls, make_side(Xu), make_side(Xv), Winv_u, Winv_v, Bn))

        rfac_of: dict = {}  # id(X) -> (R, L1, L2)
        if x_bank:
            G_all = jnp.concatenate([G for (_, G) in x_bank], axis=0)
            R_all, L1_all, L2_all = gram_rfactor(G_all)
            ofs = 0
            for key, G in x_bank:
                b = G.shape[0]
                rfac_of[key] = (
                    R_all[ofs : ofs + b],
                    L1_all[ofs : ofs + b],
                    L2_all[ofs : ofs + b],
                )
                ofs += b

        def resolve(side):
            """-> (R [B, r, n], recomb: R_new [B, r, n] -> Aflat [B, R_env, n])."""
            kind, data = side
            if kind == "wide":
                return data, lambda Rn: Rn
            if kind == "q":
                Q, R = data
                return R, lambda Rn, Q=Q: jnp.einsum("BRr,Brx->BRx", Q, Rn)
            X = data
            R, L1, L2 = rfac_of[id(X)]
            return R, lambda Rn, X=X, L1=L1, L2=L2: jnp.einsum(
                "BRn,Bnx->BRx", X, apply_rinv(L1, L2, Rn)
            )

        mids = []
        gram_bank: dict = {}  # n -> list of (index into mids, G)
        for ci, (cls, side_u, side_v, Winv_u, Winv_v, Bn) in enumerate(sides):
            Ru, recomb_u = resolve(side_u)
            Rv, recomb_v = resolve(side_v)
            ru, rv = Ru.shape[1], Rv.shape[1]
            # theta[(x p), (y q)] = gate[p,q,d,e] Ru[x,(d a)] Rv[y,(e a)]:
            # fold the (tiny) gate into Rv first, then ONE MXU-shaped
            # matmul contracting (d, a) — [B, ru, d*chi] x
            # [B, d*chi, d*rv*d].  The naive chain (theta via two einsums
            # with d=2 mid-axes) is layout-hostile on TPU (~16 ms per
            # group at the benchmark shapes, the largest single piece of
            # the two-site update — `scripts/microbench_gate.py`).
            gate4 = gates_list[ci].astype(M.dtype)  # [B, p, q, d, e]
            Rv5 = jnp.einsum("Bpqde,Byea->Bdapyq", gate4, Rv.reshape(Bn, rv, d, chi))
            Rv5 = Rv5.reshape(Bn, d * chi, d * rv * d)
            th = jnp.einsum("Bxk,Bkz->Bxz", Ru.reshape(Bn, ru, d * chi), Rv5)
            theta_mat = th.reshape(Bn, ru * d, rv * d)  # rows (x p), cols (y q)
            m_, n_ = ru * d, rv * d
            small = min(m_, n_)
            if self.trunc_method != "svd":
                if m_ <= n_:
                    G = jnp.einsum("bik,bjk->bij", theta_mat, jnp.conj(theta_mat))
                else:
                    G = jnp.einsum("bki,bkj->bij", jnp.conj(theta_mat), theta_mat)
                gram_bank.setdefault(small, []).append((ci, G))
            mids.append(
                (cls, theta_mat, recomb_u, recomb_v, Winv_u, Winv_v, ru, rv, Bn)
            )

        # phase 3: ONE eigensolve per Gram size.  Large Grams (n > chi+16)
        # go through the randomized subspace solver — only the top chi+8
        # pairs survive truncation anyway, and the full Jacobi solve at
        # n=128 dominates the gate group on TPU.
        from .ops.factorizations import subspace_eigh

        eig_results: dict = {}
        for n_small, items in gram_bank.items():
            Gs = jnp.concatenate([G for (_, G) in items], axis=0)
            # Beyond speed, the subspace route is the CORRECTNESS path on
            # TPU for large grams: the full 128-dim Pallas Jacobi solve on
            # pre-saturation (rank-deficient) theta spectra emits isolated
            # NaNs that corrupt the state within a few layers, while the
            # subspace result matched host-flex truth to 3e-4 on the
            # chi=64 Eagle benchmark (`docs/performance.md`).
            if self.trunc_method == "subspace" and n_small > chi + 16:
                w, V, tail = subspace_eigh(chi)(Gs)
            else:
                w, V = default_eigh(n_small)(Gs)
                tail = None
            ofs = 0
            for (ci, G) in items:
                b = G.shape[0]
                eig_results[ci] = (
                    w[ofs : ofs + b],
                    V[ofs : ofs + b],
                    None if tail is None else tail[ofs : ofs + b],
                )
                ofs += b

        # phase 3b (direct path): ONE SVD dispatch per theta shape — same
        # dedup the Gram bank does for eigh; per-item results are identical
        # (batched SVD is elementwise over the batch), but same-shape gate
        # classes stop paying separate dispatch + compilation units
        svd_results: dict = {}
        if self.trunc_method == "svd":
            svd_bank: dict = {}
            for ci, (cls, theta_mat, *_rest) in enumerate(mids):
                svd_bank.setdefault(theta_mat.shape[1:], []).append(
                    (ci, theta_mat)
                )
            for (m_, n_), items in svd_bank.items():
                Ts = jnp.concatenate([t for (_, t) in items], axis=0)
                # the Jacobi kernel covers tall/square iterates with an
                # even column count; wide thetas go through the adjoint
                # (the bulk heavy-hex classes are [128, 256]/[256, 128] —
                # square-only routing left them on the XLA SVD, which the
                # round-4 profile showed was most of the direct-SVD
                # premium: 578 vs 553 ms/layer with only the square
                # classes routed)
                # >= 64: (a) degree-1 boundary vertices (Eagle) give
                # [2, 256] thetas whose 2x2 Gram breaks the kernel's
                # column round-robin at m=1; (b) small classes (chi <= 16,
                # e.g. the w2 chi=8 [32, 16]/[16, 16] thetas) pad their
                # m <= 8 column tiles to 128 lanes — <= 6% lane
                # utilization AND a Mosaic scoped-VMEM footprint that
                # OOMed the w2 evolve compile ("149.65M of 128.00M vmem",
                # r4) even after padded-byte chunk budgeting.  Tiny
                # classes cost nothing on the XLA SVD, whose trajectory
                # parity is independently gated (tests/golden/
                # tpu_parity_chi64.json).  NOTE this does not change the
                # class set the committed pjsvd artifact certifies: the
                # chi=64 trajectory's routed classes ([256, 128]-family,
                # min dim 128) all clear the gate; classes removed here
                # fall back to the parity-proven XLA path, so
                # PJSVD_ROUTING is unchanged.
                use_pjsvd = (
                    self.svd_impl == "pjsvd"
                    and min(m_, n_) % 2 == 0
                    and min(m_, n_) >= 64
                )
                if use_pjsvd:
                    from .ops.osj import pjsvd

                    # Rectangular classes run 6 polish sweeps (square: 4).
                    # The tall iterate's Gram preconditioner sees only the
                    # n-dim column space of an m>n matrix, so its starting
                    # basis is noisier than the square case and the committed
                    # artifact's parity margin was carried by these classes
                    # (4.69e-6 vs the 5.33e-6 flex-f32 floor); two extra
                    # sweeps are ~1% of layer FLOPs and buy the gate margin.
                    polish = 6 if m_ != n_ else 4
                    if m_ >= n_:
                        U_all, s_all, Vh_all = pjsvd(Ts, polish_sweeps=polish)
                    else:
                        Ut, s_all, Vht = pjsvd(
                            jnp.conj(jnp.swapaxes(Ts, -1, -2)),
                            polish_sweeps=polish,
                        )
                        U_all = jnp.conj(jnp.swapaxes(Vht, -1, -2))
                        Vh_all = jnp.conj(jnp.swapaxes(Ut, -1, -2))
                else:
                    U_all, s_all, Vh_all = jnp.linalg.svd(
                        Ts, full_matrices=False
                    )
                ofs = 0
                for (ci, t) in items:
                    b = t.shape[0]
                    svd_results[ci] = (
                        U_all[ofs : ofs + b],
                        s_all[ofs : ofs + b],
                        Vh_all[ofs : ofs + b],
                    )
                    ofs += b

        # phase 4: complete the SVD algebra, truncate, write back
        for ci, (cls, theta_mat, recomb_u, recomb_v, Winv_u, Winv_v, ru, rv, Bn) in enumerate(mids):
            m_, n_ = ru * d, rv * d
            if self.trunc_method == "svd":
                # Direct (unsquared) SVD of theta — XLA's QDWH-SVD.  The
                # parity-grade path: the Gram route squares kappa(theta), so
                # its absolute eigh noise (~5e-6 at f32 on TPU, LAPACK-class
                # f64 being unavailable: C128 is not a supported TPU type)
                # lands on the small singular directions and is then
                # amplified by the 1/sqrt(s_min) un-gauge factors; the
                # direct SVD keeps errors graded the way the flex tier's
                # LAPACK gesdd does (`scripts/probe_eigh_backends.py`).
                # "auto" -> xla until the pjsvd on-chip parity artifact is
                # committed (see the svd_impl comment in __init__); the
                # explicit opt-in covers the shapes the kernel supports
                # (square, even n) and falls back to xla elsewhere.
                # Computed shape-batched in phase 3b above.
                U, s, Vh = svd_results[ci]
                tail = None
            else:
                w, V, tail = eig_results[ci]
                w = jnp.real(w[..., ::-1])
                V = V[..., ::-1]
                s = jnp.sqrt(jnp.clip(w, 0.0, None))
                smax = s[..., :1]
                inv = jnp.where(s > (eps * 8.0) * smax, 1.0 / jnp.where(s > 0, s, 1.0), 0.0)
                if m_ <= n_:
                    U = V
                    Vh = inv[..., :, None].astype(M.dtype) * jnp.einsum(
                        "bjm,bjn->bmn", jnp.conj(U), theta_mat
                    )
                else:
                    Vh = jnp.conj(jnp.swapaxes(V, -1, -2))
                    U = jnp.einsum("bmn,bnk->bmk", theta_mat, V) * inv[..., None, :].astype(M.dtype)
            T, M, errors = self._finish_two_site(
                T, M, errors, cls, U, s, Vh, recomb_u, recomb_v, Winv_u, Winv_v, ru, rv, Bn,
                cutoff, normalize, tail_extra=tail,
            )
        return T, M, errors

    def _finish_two_site(self, T, M, errors, cls, U, s, Vh, recomb_u, recomb_v, Winv_u, Winv_v, ru, rv, Bn, cutoff, normalize, tail_extra=None):
        """Shared tail of the two-site update: truncation, recombination
        (via the per-side `recomb_*` closures mapping R_new [B, r, d*chi]
        back to the flat side [B, R_env, d*chi]), gauge removal, scatter,
        and singular-value message writeback."""
        chi, d = self.chi, self.d
        s_m, mask, err = _truncate_mask(
            s.astype(self.real_dtype), chi, cutoff, tail_extra=tail_extra
        )
        K = s.shape[1]
        if K >= chi:
            U = U[:, :, :chi]
            Vh = Vh[:, :chi, :]
        else:
            U = jnp.pad(U, ((0, 0), (0, 0), (0, chi - K)))
            Vh = jnp.pad(Vh, ((0, 0), (0, chi - K), (0, 0)))
        if normalize:
            s_norm = jnp.linalg.norm(s_m, axis=1, keepdims=True)
            s_m = s_m / jnp.where(s_norm > 0, s_norm, 1.0)
        rs = jnp.sqrt(s_m).astype(M.dtype)
        Ru_new = U * rs[:, None, :]
        Rv_new = rs[:, :, None] * Vh
        Ru_new = Ru_new.reshape(Bn, ru, d, chi).reshape(Bn, ru, d * chi)
        Rv_new = jnp.swapaxes(Rv_new, 1, 2).reshape(Bn, rv, d, chi).reshape(Bn, rv, d * chi)
        Au_new = self._restore(recomb_u(Ru_new), Winv_u, cls.ku)
        Av_new = self._restore(recomb_v(Rv_new), Winv_v, cls.kv)
        if normalize:
            def tnorm(A):
                flat = A.reshape(Bn, -1)
                n = jnp.linalg.norm(flat, axis=1, keepdims=True)
                return (flat / jnp.where(n > 0, n, 1.0)).reshape(A.shape)

            Au_new = tnorm(Au_new)
            Av_new = tnorm(Av_new)
        T = self._scatter_permuted(T, cls.ku, cls.u_pos, cls.slot_u, Au_new)
        T = self._scatter_permuted(T, cls.kv, cls.v_pos, cls.slot_v, Av_new)
        m_diag = jax.vmap(jnp.diag)(s_m.astype(M.dtype))
        M = M.at[cls.eid_uv].set(m_diag)
        M = M.at[cls.eid_vu].set(m_diag)
        errors = errors.at[cls.gate_index].set(err)
        return T, M, errors

    def _apply_one_site_group(self, T: dict, group: OneSiteGroup, gate_arrays: dict | None = None):
        T = dict(T)
        for k, (pos, gates, _) in group.per_bucket.items():
            G = gates if gate_arrays is None else gate_arrays[k]
            if len(pos) == T[k].shape[0]:
                # whole-bucket update (e.g. a transverse-field kick on every
                # qubit): no gather/scatter at all
                perm = np.zeros(len(pos), dtype=np.int32)
                perm[pos] = np.arange(len(pos), dtype=np.int32)
                Gp = jnp.asarray(G, dtype=T[k].dtype)[perm]
                T[k] = jnp.einsum("Bps,Bs...->Bp...", Gp, T[k])
            else:
                A = T[k][pos]
                A = jnp.einsum("Bps,Bs...->Bp...", jnp.asarray(G, dtype=A.dtype), A)
                T[k] = _scatter_rows(T[k], pos, A)
        return T

    # -- layer step -----------------------------------------------------
    def make_step(
        self,
        circuit: Sequence,
        cutoff: float = 0.0,
        normalize: bool = True,
        bp_maxiter: int = 30,
        bp_tolerance: float | None = None,
        bp_inner_maxiter: int = 2,
        layers_per_call: int = 1,
    ):
        """Compile a circuit layer into one jitted function
        ``(T, M) -> (T, M, errors)``.

        BP refreshes are inserted before every 2-site group except the first
        — exactly the affected-vertex rule of the flex driver
        (`src/Apply/apply_gates.jl:64-83`) specialized to color-group
        batches.

        `layers_per_call` > 1 runs that many repetitions of the layer per
        dispatch via `lax.fori_loop` (body compiled once — no unrolling);
        `errors` comes back as [layers_per_call, n_gates].  Host dispatch
        on tunneled backends costs ~43 ms per call (measured,
        `scripts/microbench_gate.py`), a large fraction of a ~200 ms
        layer — fusing layers amortizes it."""
        if bp_tolerance is None:
            bp_tolerance = float(default_engine_tolerance(self.dtype))
        compiled = compile_circuit(self.plan, circuit, d=self.d)
        # Gate tensors are passed as jit ARGUMENTS, uploaded once via the
        # complex-safe split transfer.  Neither alternative survives tunneled
        # backends: complex literals embedded in the program fail at runtime
        # (constant upload is a complex host->device transfer), and closing
        # over device arrays makes jax fetch them back to host at trace time.
        gate_params: list = []
        for grp in compiled:
            if isinstance(grp, OneSiteGroup):
                gate_params.append(
                    {
                        k: _device_put(np.asarray(g).astype(np.dtype(self.dtype)))
                        for k, (pos, g, gi) in grp.per_bucket.items()
                    }
                )
            else:
                gate_params.append(
                    [
                        _device_put(np.asarray(cls.gates).astype(np.dtype(self.dtype)))
                        for cls in grp.classes
                    ]
                )
        n_gates = len(circuit)
        program = build_program(self.plan, compiled)

        # Intra-layer refreshes only feed the gauge sandwich (W cancels
        # against W^-1 exactly) and the truncation weighting, so a few
        # Gauss-Seidel iterations suffice: capping them at `bp_inner_maxiter`
        # leaves 20-layer observables at the f32 truncation floor (validated
        # vs the f64 oracle) while the refreshes are ~70% of the layer time.
        # The final refresh of the step still runs to full convergence.
        inner = min(bp_maxiter, bp_inner_maxiter)

        def layer_impl(T, M, G):
            errors = jnp.zeros((n_gates,), dtype=self.real_dtype)
            for entry in program:
                if entry[0] == "bp":
                    M = self._bp_fixed_point(T, M, inner, bp_tolerance, False)
                elif entry[0] == "one":
                    T = self._apply_one_site_group(T, entry[1], G[entry[2]])
                elif self.factor_method == "gram":
                    T, M, errors = self._apply_two_site_group(
                        T, M, errors, entry[1].classes, G[entry[2]], cutoff, normalize
                    )
                else:
                    for ci, cls in enumerate(entry[1].classes):
                        T, M, errors = self._apply_two_site_class(
                            T, M, errors, cls, cutoff, normalize, gates=G[entry[2]][ci]
                        )
            M = self._bp_fixed_point(T, M, bp_maxiter, bp_tolerance, False)
            return T, M, errors

        L = int(layers_per_call)
        if L == 1:
            step_impl = layer_impl
        else:

            def step_impl(T, M, G):
                all_errors = jnp.zeros((L, n_gates), dtype=self.real_dtype)

                def body(i, carry):
                    T, M, all_errors = carry
                    T, M, errors = layer_impl(T, M, G)
                    return (T, M, lax.dynamic_update_slice_in_dim(
                        all_errors, errors[None], i, axis=0
                    ))

                return lax.fori_loop(0, L, body, (T, M, all_errors))

        jitted = jax.jit(step_impl)

        def step(T, M):
            return jitted(T, M, gate_params)

        step.jitted = jitted
        step.gate_params = gate_params
        step.layers_per_call = L
        return step

    def evolve(self, circuit: Sequence, num_layers: int = 1, **kwargs):
        """Apply `num_layers` repetitions of `circuit`; returns the stacked
        per-layer truncation-error arrays [num_layers, n_gates]."""
        step = self.make_step(circuit, **kwargs)
        all_errors = []
        for _ in range(num_layers):
            self.T, self.M, errors = step(self.T, self.M)
            all_errors.append(errors)
        return np.stack([np.asarray(jax.device_get(e)) for e in all_errors])

    # -- rank-adaptive bond-cap ladder -----------------------------------
    def resize_chi(self, chi_new: int) -> "LatticeEngine":
        """New engine at bond cap `chi_new` carrying this engine's state.

        On-device zero-pad (grow) or slice (shrink) of every bond axis of T
        and of M; the plan, site indices, and options are shared.  Growing
        is lossless; shrinking drops the padded tail (only safe while the
        true bond rank is below the new cap — the ladder's use case)."""
        import copy as _copy

        chi_new = int(chi_new)
        if chi_new == self.chi:
            return self
        eng = _copy.copy(self)
        eng.chi = chi_new
        eng._step_cache = {}
        eng._edge_cls_cache = None
        delta = chi_new - self.chi

        def fix(arr, bond_axes):
            if delta > 0:
                pad = [(0, 0)] * arr.ndim
                for ax in bond_axes:
                    pad[ax] = (0, delta)
                return jnp.pad(arr, pad)
            sl = [slice(None)] * arr.ndim
            for ax in bond_axes:
                sl[ax] = slice(0, chi_new)
            return arr[tuple(sl)]

        eng.T = {k: fix(arr, range(2, 2 + k)) for k, arr in self.T.items()}
        eng.M = fix(self.M, (1, 2))
        return eng

    def evolve_ladder(
        self,
        circuit: Sequence,
        num_layers: int,
        rungs: Sequence = (8, 16, 32, 64),
        **kwargs,
    ):
        """Rank-adaptive evolution: early layers run at smaller bond caps.

        From a product state the true bond rank after L layers is at most
        ``d^(gates-per-edge * L)``, so early layers are EXACT at a small cap
        while being up to (chi/cap)^3 cheaper and far faster to compile —
        the first useful layer lands in the time of a chi=8 compile instead
        of the full chi=64 program.  The cap grows through `rungs`
        (truncated at this engine's chi, which is always the final rung);
        each rung compiles its own step program.

        Returns ``(engine_at_final_rung, errors [num_layers, n_gates])``;
        `self` is left untouched.
        """
        rung_list = sorted({int(r) for r in rungs if int(r) < self.chi} | {self.chi})
        # per-layer bond growth: d per 2-site gate on the busiest edge
        per_edge: dict = {}
        for gate in circuit:
            verts = list(gate[1])
            if len(verts) == 2:
                key = frozenset(verts)
                per_edge[key] = per_edge.get(key, 0) + 1
        growth = self.d ** max(per_edge.values()) if per_edge else 1
        # current exact rank bound: the largest padded bond already in use
        rank = 1
        eng = self
        step = None
        all_errors = []
        for _ in range(num_layers):
            rank = min(rank * growth, self.chi)
            target = next(r for r in rung_list if r >= rank)
            if target != eng.chi:
                eng = eng.resize_chi(target)
                step = None
            if step is None:
                step = eng.make_step(circuit, **kwargs)
            eng.T, eng.M, errors = step(eng.T, eng.M)
            all_errors.append(errors)
        return eng, np.stack([np.asarray(jax.device_get(e)) for e in all_errors])

    # -- on-device measurement ------------------------------------------
    @partial(jax.jit, static_argnums=(0,))
    def _expect_1site_all(self, T: dict, M: Array, op: Array):
        """<op_v> for every vertex via BP (batched per degree bucket)."""
        plan = self.plan
        outs = {}
        for k, verts in plan.buckets.items():
            pos = np.arange(len(verts), dtype=np.int32)
            in_eids = np.array(
                [[plan.edge_ids[(u, v)] for u in plan.neighbor_order[v]] for v in verts],
                dtype=np.int32,
            ).reshape(len(verts), k)
            A = T[k]
            for j in range(k):
                A = _absorb_message(A, M[in_eids[:, j]], axis=2 + j)
            Tc = jnp.conj(T[k])
            axes = "".join(chr(ord("a") + j) for j in range(k))
            denom = jnp.einsum(f"Bs{axes},Bs{axes}->B", A, Tc)
            numer = jnp.einsum(f"Bs{axes},ps,Bp{axes}->B", A, jnp.asarray(op, A.dtype), Tc)
            outs[k] = numer / denom
        return outs

    def expect_1site(self, opname: str) -> dict:
        """BP expectation of a 1-site operator on every vertex."""
        from .sitetypes import op_matrix

        op = op_matrix(opname, self.d)
        outs = self._expect_1site_all(self.T, self.M, _device_put(np.asarray(op)))
        result = {}
        for k, verts in self.plan.buckets.items():
            vals = _device_get(outs[k])
            for i, v in enumerate(verts):
                result[v] = complex(vals[i])
        return result

    def _edge_classes(self):
        """Directed-edge batches keyed by (deg u, deg v) with gather indices,
        one entry per undirected edge (u chosen as the stored orientation)."""
        if getattr(self, "_edge_cls_cache", None) is not None:
            return self._edge_cls_cache
        plan = self.plan
        classes: dict = {}
        for (u, v) in plan.graph.edges():
            ku, up = plan.bucket_pos[u]
            kv, vp = plan.bucket_pos[v]
            su = plan.neighbor_order[u].index(v)
            sv = plan.neighbor_order[v].index(u)
            env_u = [plan.edge_ids[(plan.neighbor_order[u][j], u)] for j in range(ku) if j != su]
            env_v = [plan.edge_ids[(plan.neighbor_order[v][j], v)] for j in range(kv) if j != sv]
            classes.setdefault((ku, kv), []).append(((u, v), up, vp, su, sv, env_u, env_v))
        out = []
        for (ku, kv), items in sorted(classes.items()):
            out.append(
                (
                    ku,
                    kv,
                    [it[0] for it in items],
                    np.array([it[1] for it in items], dtype=np.int32),
                    np.array([it[2] for it in items], dtype=np.int32),
                    np.array([it[3] for it in items], dtype=np.int32),
                    np.array([it[4] for it in items], dtype=np.int32),
                    np.array([it[5] for it in items], dtype=np.int32).reshape(len(items), ku - 1),
                    np.array([it[6] for it in items], dtype=np.int32).reshape(len(items), kv - 1),
                )
            )
        self._edge_cls_cache = out
        return out

    @partial(jax.jit, static_argnums=(0,))
    def _expect_2site_all(self, T: dict, M: Array, op_u: Array, op_v: Array):
        """<op_u op_v> on every edge via the 2-site BP region, batched per
        (deg u, deg v) class (the engine analog of the reference's
        Steiner-region numerator/denominator, `src/expect.jl:59-82`)."""
        outs = []
        for (ku, kv, _, u_pos, v_pos, slot_u, slot_v, env_u, env_v) in self._edge_classes():
            Au = self._gather_permuted(T, ku, u_pos, slot_u)  # [B, d, env..., bond]
            Av = self._gather_permuted(T, kv, v_pos, slot_v)
            Bn = Au.shape[0]
            for col in range(ku - 1):
                Au = _absorb_message(Au, M[env_u[:, col]], axis=2 + col)
            for col in range(kv - 1):
                Av = _absorb_message(Av, M[env_v[:, col]], axis=2 + col)
            eu = "".join(chr(ord("a") + j) for j in range(ku - 1))
            ev = "".join(chr(ord("f") + j) for j in range(kv - 1))
            # half transfer matrices on the shared bond: [B, d_out, d_in, x, y]
            hu = jnp.einsum(f"Bs{eu}x,Bt{eu}y->Bstxy", Au, jnp.conj(self._gather_permuted(T, ku, u_pos, slot_u)))
            hv = jnp.einsum(f"Bs{ev}x,Bt{ev}y->Bstxy", Av, jnp.conj(self._gather_permuted(T, kv, v_pos, slot_v)))
            denom = jnp.einsum("Bssxy,Bppxy->B", hu, hv)
            # hu[s,t,..] pairs ket index s with bra index t: <O> inserts O[t,s]
            numer = jnp.einsum(
                "Bstxy,ts,Bpqxy,qp->B",
                hu, op_u.astype(hu.dtype), hv, op_v.astype(hv.dtype),
            )
            outs.append(numer / denom)
        return outs

    def expect_2site(self, opname_u: str, opname_v: str) -> dict:
        """BP expectation of a 2-site operator on every edge of the lattice.

        Returns {edge: value}.  The contraction region is the two site
        tensors plus their incoming messages."""
        from .sitetypes import op_matrix

        op_u = _device_put(np.asarray(op_matrix(opname_u, self.d)))
        op_v = _device_put(np.asarray(op_matrix(opname_v, self.d)))
        outs = self._expect_2site_all(self.T, self.M, op_u, op_v)
        result = {}
        for (ku, kv, edges, *_), vals in zip(self._edge_classes(), outs):
            host = _device_get(vals)
            for e, x in zip(edges, host):
                result[e] = complex(x)
        return result

    @partial(jax.jit, static_argnums=(0,))
    def _bp_scalars(self, T: dict, M: Array):
        """(per-bucket vertex scalars, per-edge scalars) of the BP fixed
        point — the compiled counterpart of the reference's
        `scalar_factors_quotient` (`abstractbeliefpropagationcache.jl:
        146-148`): vertex scalar = vertex factor closed with all incoming
        messages; edge scalar = <m_e, m_e~>."""
        plan = self.plan
        vs = {}
        for k, verts in plan.buckets.items():
            in_eids = np.array(
                [[plan.edge_ids[(u, v)] for u in plan.neighbor_order[v]] for v in verts],
                dtype=np.int32,
            ).reshape(len(verts), k)
            A = T[k]
            for j in range(k):
                A = _absorb_message(A, M[in_eids[:, j]], axis=2 + j)
            axes = "".join(chr(ord("a") + j) for j in range(k))
            vs[k] = jnp.einsum(f"Bs{axes},Bs{axes}->B", A, jnp.conj(T[k]))
        edges = list(plan.graph.edges())
        idx1 = np.array([plan.edge_ids[(u, v)] for (u, v) in edges], np.int32)
        idx2 = np.array([plan.edge_ids[(v, u)] for (u, v) in edges], np.int32)
        es = jnp.einsum("eij,eij->e", M[idx1], M[idx2])
        return vs, es

    def freenergy(self):
        """BP free energy log Z = sum log(vertex scalars) - sum log(edge
        scalars), batched on device — the engine counterpart of the flex
        cache's `freenergy` (reference `abstractbeliefpropagationcache.jl:
        289-300`, incl. the complex promotion and -inf-on-zero semantics).
        For a state engine Z is the BP estimate of <psi|psi>."""
        vs, es = self._bp_scalars(self.T, self.M)
        numer = np.concatenate(
            [np.asarray(_device_get(v)).ravel() for v in vs.values()]
        )
        denom = np.asarray(_device_get(es)).ravel()
        if np.any(denom == 0):
            return -np.inf

        def log_sum(terms):
            if np.any(np.iscomplex(terms)) or np.any(np.real(terms) < 0):
                return complex(np.sum(np.log(terms.astype(complex))))
            return float(np.sum(np.log(np.real(terms))))

        f = log_sum(numer) - log_sum(denom)
        if isinstance(f, complex) and f.imag == 0:
            f = f.real
        return f

    def partitionfunction(self):
        """exp(freenergy) (reference `abstractbeliefpropagationcache.jl:
        302-304`)."""
        return _z_from_freenergy(self.freenergy())

    # -- loop corrections (compiled tier) -------------------------------
    def _cycle_vertex_transfer(self, v, prev_v, next_v, Ts: dict, Ms: Array):
        """Doubled transfer matrix [chi^2, chi^2] of one cycle vertex:
        ket (x) bra with the converged messages absorbed on every
        off-cycle bond, the (in, out) cycle-bond pairs left open."""
        plan, chi = self.plan, self.chi
        k, pos = plan.bucket_pos[v]
        A = Ts[k][pos]
        C = jnp.conj(A)
        order = plan.neighbor_order[v]
        si, so = order.index(prev_v), order.index(next_v)
        subs = [
            "s" + "".join(chr(ord("a") + j) for j in range(k)),
            "s" + "".join(chr(ord("A") + j) for j in range(k)),
        ]
        operands = [A, C]
        for j, u in enumerate(order):
            if j in (si, so):
                continue
            operands.append(Ms[plan.edge_ids[(u, v)]])
            subs.append(chr(ord("a") + j) + chr(ord("A") + j))
        out = (
            chr(ord("a") + si) + chr(ord("A") + si)
            + chr(ord("a") + so) + chr(ord("A") + so)
        )
        Tv = jnp.einsum(",".join(subs) + "->" + out, *operands)
        return Tv.reshape(chi * chi, chi * chi)

    def _cycle_bond_op(self, v, v_next, Ms: Array):
        """Antiprojector 1 - |m_into_v><m_into_v_next| on the doubled
        cycle bond (messages rescaled to unit overlap beforehand); each
        endpoint contracts the message pointing INTO it, which makes the
        weight orientation-invariant exactly as in the flex tier."""
        plan, chi = self.plan, self.chi
        m_in = Ms[plan.edge_ids[(v_next, v)]].reshape(-1)
        m_out = Ms[plan.edge_ids[(v, v_next)]].reshape(-1)
        eye = jnp.eye(chi * chi, dtype=Ms.dtype)
        return eye - jnp.outer(m_in, m_out)

    def loopcorrected_partitionfunction(self, max_configuration_size: int):
        """Loop-series-corrected partition function on the compiled tier
        (reference `loopcorrection.jl:3-14,79-89`): Z_BP * (1 + sum of
        configuration weights) with antiprojectors on the configuration
        edges of the rescaled fixed point.

        TPU-native evaluation: simple-cycle configurations — ALL
        configurations on grids and (heavy-)hex lattices at plaquette
        sizes — become ring products of doubled [chi^2, chi^2] transfer
        matrices, batched over same-length cycles (MXU matmul chains).
        Non-cycle configurations (vertex-disjoint unions at larger sizes)
        fall back to the flex weights through `to_bp_cache`; the engine's
        own state is never mutated (the rescale is functional)."""
        from .graphs import leafless_edge_induced_subgraphs

        plan = self.plan
        zbp = self.partitionfunction()
        cache = getattr(self, "_loopcorr_cache", None)
        if cache is None:
            cache = self._loopcorr_cache = {}
        if max_configuration_size not in cache:
            egs = leafless_edge_induced_subgraphs(
                plan.graph, max_configuration_size
            )
            cycles, others = [], []
            for eg in egs:
                cyc = _cycle_order(eg)
                if cyc is None:
                    others.append(eg)
                else:
                    cycles.append(cyc)
            by_len: dict = {}
            for cyc in cycles:
                by_len.setdefault(len(cyc), []).append(cyc)

            def w_fn(T, M, by_len=by_len):
                # ONE compiled program: functional rescale + every cycle
                # group's transfer-matrix ring product (no per-cycle
                # dispatches — the eager version paid a device round-trip
                # per matrix on the tunneled backend)
                Ts, Ms = self._rescaled(T, M)
                total = jnp.zeros((), dtype=M.dtype)
                for L, group in sorted(by_len.items()):
                    W = None
                    for i in range(L):
                        T_i = jnp.stack(
                            [
                                self._cycle_vertex_transfer(
                                    cyc[i], cyc[i - 1], cyc[(i + 1) % L],
                                    Ts, Ms,
                                )
                                for cyc in group
                            ]
                        )
                        B_i = jnp.stack(
                            [
                                self._cycle_bond_op(
                                    cyc[i], cyc[(i + 1) % L], Ms
                                )
                                for cyc in group
                            ]
                        )
                        step = jnp.einsum("bij,bjk->bik", T_i, B_i)
                        W = (
                            step
                            if W is None
                            else jnp.einsum("bij,bjk->bik", W, step)
                        )
                    total = total + jnp.sum(jnp.trace(W, axis1=1, axis2=2))
                return total

            cache[max_configuration_size] = (
                jax.jit(w_fn) if by_len else None,
                others,
            )
        jfn, others = cache[max_configuration_size]
        if jfn is None and not others:
            return zbp
        total = 0.0 + 0.0j
        if jfn is not None:
            total += complex(np.asarray(_device_get(jfn(self.T, self.M))))
        if others:
            from .loopcorrections import weight as _flex_weight

            bpc = self.to_bp_cache().rescale()
            for eg in others:
                total += complex(_flex_weight(bpc, eg))
        return zbp * (1 + total)

    @partial(jax.jit, static_argnums=(0,))
    def _rescaled(self, T: dict, M: Array):
        """Batched rescale: every message pair to unit overlap, then every
        vertex tensor by 1/sqrt(vertex scalar) — after this all local BP
        scalars are 1 and Z_BP = 1 (reference `rescale!`,
        `beliefpropagationcache.jl:82-140`; the phase convention differs —
        the complex-sqrt branch is used uniformly — but the invariants are
        identical and expectations are scalar-invariant)."""
        plan = self.plan
        edges = list(plan.graph.edges())
        idx1 = np.array([plan.edge_ids[(u, v)] for (u, v) in edges], np.int32)
        idx2 = np.array([plan.edge_ids[(v, u)] for (u, v) in edges], np.int32)
        m1, m2 = M[idx1], M[idx2]

        def unit(m):
            n = jnp.sqrt(jnp.sum(jnp.abs(m) ** 2, axis=(1, 2), keepdims=True))
            return m / jnp.where(n > 0, n, 1.0).astype(m.dtype)

        m1, m2 = unit(m1), unit(m2)
        n = jnp.einsum("eij,eij->e", m1, m2)[:, None, None]
        if jnp.issubdtype(M.dtype, jnp.complexfloating):
            root = jnp.sqrt(jnp.where(jnp.abs(n) > 0, n, 1.0))
            m1n, m2n = m1 / root, m2 / root
        else:
            # real dtype: sqrt of a negative overlap would NaN — sign-flip
            # like the flex tier (`rescale_messages`, bp.py) so the pair
            # overlap still lands at exactly +1
            s = jnp.where(jnp.real(n) < 0, -1.0, 1.0).astype(M.dtype)
            root = jnp.sqrt(jnp.where(jnp.abs(n) > 0, jnp.abs(n), 1.0))
            m1n, m2n = m1 * s / root, m2 / root
        Mn = M.at[idx1].set(m1n).at[idx2].set(m2n)
        vs, _ = self._bp_scalars(T, Mn)
        Tn = {}
        for k in T:
            q = vs[k]
            if jnp.issubdtype(T[k].dtype, jnp.complexfloating):
                r = jnp.sqrt(jnp.where(jnp.abs(q) > 0, q, 1.0))
            else:
                # real dtype cannot promote to complex (flex uses
                # emath.sqrt): normalize the magnitude; a negative vertex
                # scalar keeps its sign (scalar lands at +-1, never NaN)
                r = jnp.sqrt(jnp.where(jnp.abs(q) > 0, jnp.abs(q), 1.0))
            Tn[k] = T[k] / r.reshape((-1,) + (1,) * (T[k].ndim - 1))
        return Tn, Mn

    def rescale(self) -> "LatticeEngine":
        """In-place engine counterpart of the flex cache's `rescale_()`."""
        self.T, self.M = self._rescaled(self.T, self.M)
        return self

    def normalize(self, bp_maxiter: int = 30) -> "LatticeEngine":
        """BP-normalize the engine state: converge messages, then rescale
        so all local scalars (and hence Z_BP = <psi|psi>_BP) equal 1 —
        the compiled counterpart of `tnqs.normalize(psi, alg="bp")`
        (reference `normalize.jl:1-6`)."""
        self.bp_update(maxiter=bp_maxiter)
        return self.rescale()

    @partial(jax.jit, static_argnums=(0,))
    def _bond_spectra(self, M: Array, idx1: Array, idx2: Array) -> Array:
        """Eigenvalues of rho_e = sqrt(m_rev) m_fwd sqrt(m_rev) for a batch
        of bonds — similar to m_fwd m_rev, i.e. the bond RDM spectrum the
        reference reads off the BP fixed point (`entanglement.jl:73-86`)."""
        m1 = M[idx1]
        m2 = M[idx2]
        m1 = 0.5 * (m1 + jnp.conj(jnp.swapaxes(m1, -1, -2)))
        m2 = 0.5 * (m2 + jnp.conj(jnp.swapaxes(m2, -1, -2)))
        w2, V2 = jnp.linalg.eigh(m2)
        root = jnp.sqrt(jnp.clip(jnp.real(w2), 0.0, None))
        W2 = jnp.einsum(
            "eij,ej,ekj->eik", V2, root.astype(V2.dtype), jnp.conj(V2)
        )
        rho = jnp.einsum("eij,ejk,ekl->eil", W2, m1, W2)
        rho = 0.5 * (rho + jnp.conj(jnp.swapaxes(rho, -1, -2)))
        return jnp.linalg.eigvalsh(rho)

    def bond_entropies(self, alpha: float = 1.0, edges=None) -> dict:
        """Per-bond Renyi entanglement entropies straight from the
        converged on-device BP messages — no RDM, one batched compiled
        eigensolve for all bonds.  The engine counterpart of
        `tnqs.renyi_entropy(bpc, edge)` (reference bond entropy from
        messages, `/root/reference/src/entanglement.jl:73-86`); alpha=1 is
        the von Neumann limit.  Returns {edge: entropy}."""
        plan = self.plan
        if edges is None:
            edges = list(plan.graph.edges())
        idx1 = np.array([plan.edge_ids[(u, v)] for (u, v) in edges], np.int32)
        idx2 = np.array([plan.edge_ids[(v, u)] for (u, v) in edges], np.int32)
        lam = np.real(
            np.asarray(_device_get(self._bond_spectra(self.M, idx1, idx2)))
        )
        out = {}
        for e, lams in zip(edges, lam):
            lams = lams / np.sum(lams)  # trace-normalize (flex semantics)
            lams = lams[np.abs(lams) > 10 * np.finfo(lams.dtype).eps]
            if alpha == 1:
                out[tuple(e)] = float(-np.sum(lams * np.log(lams)))
            else:
                out[tuple(e)] = float(
                    np.log(np.sum(lams**alpha)) / (1 - alpha)
                )
        return out


def _z_from_freenergy(f):
    """exp(log Z) with the flex tier's demotion of exactly-real complex
    values (shared by the engine and the mesh wrapper)."""
    z = np.exp(f)
    if isinstance(z, complex) and z.imag == 0:
        z = z.real
    return z


def _cycle_order(eg) -> list | None:
    """Ordered vertex walk of an edge set that forms ONE simple cycle, or
    None (non-cycle configurations fall back to the flex weights)."""
    adj: dict = {}
    for (u, v) in eg:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    if any(len(ns) != 2 for ns in adj.values()):
        return None
    start = next(iter(adj))
    cyc = [start]
    prev, cur = None, start
    while True:
        a, b = adj[cur]
        nxt = b if a == prev else a
        if nxt == start:
            break
        cyc.append(nxt)
        prev, cur = cur, nxt
        if len(cyc) > len(adj):
            return None
    return cyc if len(cyc) == len(adj) else None


def default_engine_tolerance(dtype) -> float:
    if np.zeros((), np.dtype(dtype)).real.dtype == np.float32:
        return 1e-5
    return 1e-8
