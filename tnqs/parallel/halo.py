"""SPMD belief propagation with explicit halo exchange (`shard_map`).

The scaling design SURVEY.md §2.8 calls for: the lattice is split into
contiguous *bands* of vertices, one band per device on a 1-D mesh.  Each
device owns its band's site tensors and the messages whose source vertex it
owns.  A BP sweep is then a fully local batched update plus a boundary
(halo) exchange: the messages crossing a band cut travel to the neighbor
device with `jax.lax.ppermute` — one hop over ICI per Gauss-Seidel stage,
everything else stays on-device.  (The reference has no distributed
execution at all; `ShardedEngine` in `mesh.py` is the simpler data-parallel
layout with XLA-inserted collectives.)

Constraints checked at plan time: cross-band edges must connect *adjacent*
bands (true for row-ordered bands of planar lattices — the same geometry
boundary-MPS relies on).  Per-band tensor/message counts are padded to the
maximum so every device runs the same static program; padding rows scatter
into a trash slot.

Usage::

    hplan = HaloBandPlan.build(engine.plan, n_bands=8)
    bp = HaloBP(engine, hplan, mesh)
    M = bp.fixed_point(maxiter=25, tolerance=1e-5)   # sharded messages

Validated against the unsharded engine sweep in `tests/test_parallel.py`.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..engine import LatticeEngine, LatticePlan, _absorb_message


@dataclass
class HaloBandPlan:
    """Static band decomposition of a LatticePlan for halo-exchange BP."""

    n_bands: int
    band_of_vertex: dict
    # per degree k: [D, nb_k] global bucket positions (-1 = padding)
    band_vert_pos: dict
    # local message table size and mapping
    n_loc: int  # owned message slots per band (padded, +1 trash at index n_loc)
    eid_to_band_slot: dict  # directed edge -> (band, local slot)
    # halo tables (per band, padded with trash sends)
    n_up: int
    n_dn: int
    send_up: np.ndarray  # [D, n_up] local slots to send to band+1
    send_dn: np.ndarray  # [D, n_dn] local slots to send to band-1
    # BP groups in band-local terms:
    # (color, k, t, vert_rows [D, B], out_slots [D, B], in_refs [D, B, k-1])
    # in_refs index the extended table [local | halo_from_below | halo_from_above]
    groups: list

    @staticmethod
    def build(plan: LatticePlan, n_bands: int, order=None) -> "HaloBandPlan":
        """`order`: optional vertex sort key for the band split.  The default
        uses generator order; `order="sorted"` sorts the (x, y) vertex names
        — the column-major order that makes heavy-hex / Eagle lattices band
        cleanly (their generator order interleaves columns and violates the
        adjacent-band constraint)."""
        verts = plan.vertices
        nv = len(verts)
        if order == "sorted":
            verts = sorted(verts)
        elif callable(order):
            verts = sorted(verts, key=order)
        # contiguous balanced bands in the chosen order
        band_of = {}
        for i, v in enumerate(verts):
            band_of[v] = min(n_bands - 1, i * n_bands // nv)

        # adjacency restriction
        for (u, v) in plan.edge_ids:
            if abs(band_of[u] - band_of[v]) > 1:
                raise ValueError(
                    "halo BP requires cross-band edges to connect adjacent "
                    f"bands; edge {(u, v)} spans bands "
                    f"{band_of[u]}->{band_of[v]} (reorder vertices or reduce bands)"
                )

        # per-band, per-degree vertex lists -> padded global bucket positions
        band_verts: dict = {b: {} for b in range(n_bands)}
        for v in verts:
            k, pos = plan.bucket_pos[v]
            band_verts[band_of[v]].setdefault(k, []).append(v)
        band_vert_pos = {}
        for k in plan.buckets:
            nb = max(len(band_verts[b].get(k, [])) for b in range(n_bands))
            nb = max(nb, 1)
            arr = -np.ones((n_bands, nb), dtype=np.int32)
            for b in range(n_bands):
                for i, v in enumerate(band_verts[b].get(k, [])):
                    arr[b, i] = plan.bucket_pos[v][1]
            band_vert_pos[k] = arr

        # message ownership: band of source vertex; padded local slots
        owned: dict = {b: [] for b in range(n_bands)}
        for (u, v), eid in plan.edge_ids.items():
            owned[band_of[u]].append((u, v))
        n_loc = max(len(es) for es in owned.values())
        eid_to_band_slot = {}
        for b in range(n_bands):
            for i, e in enumerate(owned[b]):
                eid_to_band_slot[e] = (b, i)

        # halo: messages (w -> u) needed by band(u) but owned by band(w)
        need_up: dict = {b: [] for b in range(n_bands)}  # owned by b, needed by b+1
        need_dn: dict = {b: [] for b in range(n_bands)}  # owned by b, needed by b-1
        for (w, u) in plan.edge_ids:
            bw, bu = band_of[w], band_of[u]
            if bu == bw + 1:
                need_up[bw].append((w, u))
            elif bu == bw - 1:
                need_dn[bw].append((w, u))
        n_up = max(1, max(len(x) for x in need_up.values()))
        n_dn = max(1, max(len(x) for x in need_dn.values()))
        send_up = np.zeros((n_bands, n_up), dtype=np.int32)
        send_dn = np.zeros((n_bands, n_dn), dtype=np.int32)
        halo_slot_above: dict = {}  # edge -> slot in receiver's from-below buffer
        halo_slot_below: dict = {}
        for b in range(n_bands):
            for i, e in enumerate(need_up[b]):
                send_up[b, i] = eid_to_band_slot[e][1]
                halo_slot_above[e] = i  # lands at band b+1
            for i, e in enumerate(need_dn[b]):
                send_dn[b, i] = eid_to_band_slot[e][1]
                halo_slot_below[e] = i  # lands at band b-1

        # extended message table per band: [0..n_loc) local, n_loc = trash,
        # [n_loc+1 .. +n_up) halo-from-below, then halo-from-above
        off_hb = n_loc + 1
        off_ha = off_hb + n_up

        def ref_of(e, b_consumer):
            bo, slot = eid_to_band_slot[e]
            if bo == b_consumer:
                return slot
            if bo == b_consumer - 1:
                return off_hb + halo_slot_above[e]
            if bo == b_consumer + 1:
                return off_ha + halo_slot_below[e]
            raise AssertionError

        # band-local BP groups: same (color, k, t) structure as the plan,
        # but every band must run the same shapes -> pad rows with -1/trash
        edge_by_id = {eid: e for e, eid in plan.edge_ids.items()}
        groups = []
        for (cu, k, t, src_pos, out_eids, in_eids, other_slots) in plan.bp_groups:
            # split group rows by band of source vertex
            rows: dict = {b: [] for b in range(n_bands)}
            for r in range(len(src_pos)):
                v = plan.buckets[k][int(src_pos[r])]
                b = band_of[v]
                e = edge_by_id[int(out_eids[r])]
                in_refs = [
                    ref_of(edge_by_id[int(in_eids[r, c])], b) for c in range(k - 1)
                ]
                # local row position of v in the band's padded bucket
                gpos = plan.bucket_pos[v][1]
                lrow = int(np.where(band_vert_pos[k][b] == gpos)[0][0])
                rows[b].append((lrow, eid_to_band_slot[e][1], in_refs))
            Bmax = max(1, max(len(x) for x in rows.values()))
            vert_rows = -np.ones((n_bands, Bmax), dtype=np.int32)
            out_slots = np.full((n_bands, Bmax), n_loc, dtype=np.int32)  # trash
            in_refs_arr = np.zeros((n_bands, Bmax, max(1, k - 1)), dtype=np.int32)
            for b in range(n_bands):
                for i, (lrow, oslot, irefs) in enumerate(rows[b]):
                    vert_rows[b, i] = lrow
                    out_slots[b, i] = oslot
                    for c, ir in enumerate(irefs):
                        in_refs_arr[b, i, c] = ir
            groups.append((cu, k, t, vert_rows, out_slots, in_refs_arr, other_slots))

        return HaloBandPlan(
            n_bands=n_bands,
            band_of_vertex=band_of,
            band_vert_pos=band_vert_pos,
            n_loc=n_loc,
            eid_to_band_slot=eid_to_band_slot,
            n_up=n_up,
            n_dn=n_dn,
            send_up=send_up,
            send_dn=send_dn,
            groups=groups,
        )


class HaloBP:
    """Halo-exchange BP sweeps for a LatticeEngine over a 1-D device mesh."""

    def __init__(self, engine: LatticeEngine, hplan: HaloBandPlan, mesh: Mesh):
        if mesh.devices.size != hplan.n_bands:
            raise ValueError("mesh size must equal the number of bands")
        self.engine = engine
        self.hplan = hplan
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self._shard_state()

    # -- layout ----------------------------------------------------------
    def _shard_state(self):
        from ..utils.transfer import device_get, device_put

        eng, hp = self.engine, self.hplan
        chi = eng.chi
        D = hp.n_bands
        sh = NamedSharding(self.mesh, P(self.axis))
        self.Tb = {}
        for k, arr in eng.T.items():
            pos = hp.band_vert_pos[k]  # [D, nb] global positions, -1 pad
            host = device_get(arr)
            gathered = np.zeros((D, pos.shape[1]) + host.shape[1:], dtype=host.dtype)
            for b in range(D):
                for i, p in enumerate(pos[b]):
                    if p >= 0:
                        gathered[b, i] = host[p]
            self.Tb[k] = jax.device_put(device_put(gathered), sh)
        # messages: [D, n_loc+1+n_up+n_dn, chi, chi]; slots beyond owned are scratch
        Mh = device_get(eng.M)
        Mb = np.zeros((D, hp.n_loc + 1 + hp.n_up + hp.n_dn, chi, chi), dtype=Mh.dtype)
        owned_mask = np.zeros((D, hp.n_loc), dtype=np.float32)
        for e, eid in self.engine.plan.edge_ids.items():
            b, slot = hp.eid_to_band_slot[e]
            Mb[b, slot] = Mh[eid]
            owned_mask[b, slot] = 1.0
        self.Mb = jax.device_put(device_put(Mb), sh)
        self.owned_mask = jax.device_put(jnp.asarray(owned_mask), sh)

    def gather_messages(self) -> jnp.ndarray:
        """Collect the sharded messages back into the engine's [2E] layout."""
        hp = self.hplan
        from ..utils.transfer import device_get

        Mb = device_get(self.Mb)
        M = np.zeros_like(device_get(self.engine.M))
        for e, eid in self.engine.plan.edge_ids.items():
            b, slot = hp.eid_to_band_slot[e]
            M[eid] = Mb[b, slot]
        from ..utils.transfer import device_put

        return device_put(M)

    # -- the sweep ---------------------------------------------------------
    def _make_sweep(self):
        eng, hp = self.engine, self.hplan
        chi, d = eng.chi, eng.d
        axis = self.axis
        n_loc = hp.n_loc
        off_hb = n_loc + 1
        off_ha = off_hb + hp.n_up
        send_up = jnp.asarray(hp.send_up)
        send_dn = jnp.asarray(hp.send_dn)
        D = hp.n_bands

        def exchange(Ml, b_idx):
            # refresh halo buffers from neighbors (one ICI hop each way)
            up = Ml[send_up[b_idx]]  # [n_up, chi, chi] to send to b+1
            dn = Ml[send_dn[b_idx]]
            from_below = lax.ppermute(up, axis, [(i, i + 1) for i in range(D - 1)])
            from_above = lax.ppermute(dn, axis, [(i, i - 1) for i in range(1, D)])
            Ml = Ml.at[off_hb : off_hb + hp.n_up].set(from_below)
            Ml = Ml.at[off_ha : off_ha + hp.n_dn].set(from_above)
            return Ml

        def sweep(Tl, Ml):
            # local shards keep a size-1 leading (band) axis
            Tl = {k: v[0] for k, v in Tl.items()}
            Ml = Ml[0]
            b_idx = lax.axis_index(axis)
            stages = sorted({g[0] for g in hp.groups})
            for stage in stages:
                Ml = exchange(Ml, b_idx)
                out = Ml
                for (cu, k, t, vert_rows, out_slots, in_refs, other_slots) in hp.groups:
                    if cu != stage:
                        continue
                    rows = jnp.asarray(vert_rows)[b_idx]
                    valid = rows >= 0
                    rows = jnp.where(valid, rows, 0)
                    A = Tl[k][rows]
                    irefs = jnp.asarray(in_refs)[b_idx]
                    for col, j in enumerate(other_slots):
                        Mj = Ml[irefs[:, col]]
                        A = _absorb_message(A, Mj, axis=2 + j, precision=eng.bp_precision)
                    Tc = jnp.conj(Tl[k][rows])
                    a_sub = ["B", "s"] + [chr(ord("a") + j) for j in range(k)]
                    b_sub = ["B", "s"] + [chr(ord("a") + j) for j in range(k)]
                    a_sub[2 + t] = "i"
                    b_sub[2 + t] = "j"
                    expr = f"{''.join(a_sub)},{''.join(b_sub)}->Bij"
                    m_new = jnp.einsum(expr, A, Tc, precision=eng.bp_precision)
                    norm = jnp.sum(m_new, axis=(1, 2), keepdims=True)
                    safe = jnp.where(jnp.abs(norm) > 0, norm, 1.0)
                    m_new = m_new / safe
                    slots = jnp.where(valid, jnp.asarray(out_slots)[b_idx], n_loc)
                    out = out.at[slots].set(
                        jnp.where(valid[:, None, None], m_new, out[slots])
                    )
                Ml = out
            return Ml[None]

        specs_T = {k: P(self.axis) for k in self.Tb}
        kwargs = dict(
            mesh=self.mesh,
            in_specs=(specs_T, P(self.axis)),
            out_specs=P(self.axis),
        )
        try:  # jax >= 0.8 renamed check_rep -> check_vma
            return shard_map(sweep, check_vma=False, **kwargs)
        except TypeError:  # pragma: no cover - older jax
            return shard_map(sweep, check_rep=False, **kwargs)

    def fixed_point(self, maxiter: int = 25, tolerance: float = 1e-5):
        """Run sweeps to convergence; convergence diff reduced with psum."""
        sweep = self._make_sweep()

        mask = self.owned_mask

        @jax.jit
        def run(Tb, Mb):
            def diff(Ma, Mb_):
                a = Ma[:, : self.hplan.n_loc]
                b = Mb_[:, : self.hplan.n_loc]
                na = jnp.linalg.norm(a.reshape(a.shape[0], a.shape[1], -1), axis=2)
                nb = jnp.linalg.norm(b.reshape(b.shape[0], b.shape[1], -1), axis=2)
                dot = jnp.sum(jnp.conj(a) * b, axis=(2, 3))
                denom = jnp.where(na * nb > 0, na * nb, 1.0)
                d = (1.0 - jnp.abs(dot / denom) ** 2) * mask
                return jnp.sum(d) / jnp.sum(mask)

            def cond(c):
                M_cur, it, eps = c
                return (it < maxiter) & (eps > tolerance)

            def body(c):
                M_cur, it, _ = c
                M_new = sweep(Tb, M_cur)
                return (M_new, it + 1, diff(M_cur, M_new))

            M1 = sweep(Tb, Mb)
            Mf, _, _ = lax.while_loop(cond, body, (M1, jnp.asarray(1), diff(Mb, M1)))
            return Mf

        self.Mb = run(self.Tb, self.Mb)
        return self.Mb
