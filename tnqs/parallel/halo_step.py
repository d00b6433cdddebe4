"""Halo-exchange FULL layer step: gates + BP over a 1-D device mesh.

`halo.py` shards the BP sweep; this module extends the same band
decomposition to the complete Trotter layer (one-site kicks, two-site
simple update, interleaved BP refreshes) so the whole step runs as ONE
`shard_map` program with explicit `ppermute` halo traffic and no global
collectives in the hot path.  (The reference has no distributed execution
at all; this is the TPU scale-out design of SURVEY.md §2.8.)

Execution model — domain decomposition with redundant boundary compute:

* every band owns its vertices' tensors and its out-messages (source-band
  ownership, as in `HaloBandPlan`);
* a two-site gate is executed by the band(s) owning either endpoint.  A
  cut-crossing gate therefore runs on BOTH adjacent bands, from identical
  exchanged inputs, and each band scatters only what it owns — the same
  deterministic program on the same values yields the same update, so no
  write-back hop is needed;
* before each two-site group one halo round supplies (a) ghost copies of
  neighbor-band vertex tensors (distance 1 — gate endpoints are adjacent
  bands by the band-plan constraint) and (b) the environment messages the
  group's gates read.  An env message (w -> u) read by executor band b can
  be owned by bands up to b±2 (u on a neighbor band, w one band further),
  so the message halo is width 2 — four small `ppermute` transfers whose
  slots are computed exactly from the compiled circuit;
* BP refresh stages between groups reuse `HaloBandPlan`'s width-1 message
  halo (`halo.py` layout), with fixed sweep counts instead of a global
  convergence test (no psum in the loop; the final refresh count is the
  `bp_maxiter` budget).

All per-band tables are padded to the max across bands so every device
runs one static program; padded rows gather from a clean zero row and
their outputs are dropped (`_BandRows`) or land in trash slots.

Validated band-for-band against the unsharded engine step in
`tests/test_parallel.py` (8 bands, CPU mesh).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from types import SimpleNamespace

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..engine import (
    LatticeEngine,
    OneSiteGroup,
    _BandRows,
    _absorb_message,
    _scatter_rows,
    build_program,
    compile_circuit,
)
from .halo import HaloBandPlan


@dataclass
class _ClassTables:
    """One two-site class, band-stacked: every array is [D, B, ...]."""

    ku: int
    kv: int
    u_rows: np.ndarray
    v_rows: np.ndarray
    slot_u: np.ndarray
    slot_v: np.ndarray
    env_u: np.ndarray  # [D, B, ku-1] extended-message refs
    env_v: np.ndarray
    w_uv: np.ndarray  # [D, B] write slot (owned) or msg trash
    w_vu: np.ndarray
    err_idx: np.ndarray  # [D, B] gate index (u-owner band) or n_gates
    gates: np.ndarray  # [D, B, d, d, d, d]


@dataclass
class HaloStepPlan:
    """Static band-stacked tables for one circuit layer."""

    n_bands: int
    hplan: HaloBandPlan
    n_gates: int
    # bucket tables: k -> sizes and send specs
    own_n: dict
    gfb_n: dict  # ghosts-from-below count per bucket
    gfa_n: dict
    ext_n: dict  # own + gfb + gfa + 2 (zero row, trash row)
    gsend_up: dict  # k -> [D, gfb_n[k]] owned local rows for receiver b+1
    gsend_dn: dict  # k -> [D, gfa_n[k]]
    # message table: base = halo.py layout [local | trash | hb1 | ha1],
    # then one region per transfer distance dd, then a clean zero slot
    n_msg_base: int
    msg_off: dict  # dd -> region offset
    msg_n: dict  # dd -> region size
    msg_send: dict  # dd -> [D, msg_n[dd]] owned local slots
    zslot: int
    n_msg_ext: int
    # program entries:
    #  ("bp",)
    #  ("one", {k: (pos [D,B], gates [D,B,d,d])})
    #  ("two", [_ClassTables, ...])
    program: list = field(default_factory=list)


def _build_step_plan(engine: LatticeEngine, hplan: HaloBandPlan, circuit) -> HaloStepPlan:
    plan = engine.plan
    d = engine.d
    D = hplan.n_bands
    band_of = hplan.band_of_vertex
    edge_by_id = {eid: e for e, eid in plan.edge_ids.items()}
    compiled = compile_circuit(plan, circuit, d=d)
    program_src = build_program(plan, compiled)
    # gate_index values are positions in the original circuit
    n_gates = len(circuit)

    # local owned row of each vertex inside its band bucket table
    own_row = {}
    for k, tbl in hplan.band_vert_pos.items():
        pos_to_row = {}
        for b in range(D):
            for i, p in enumerate(tbl[b]):
                if p >= 0:
                    pos_to_row[(b, int(p))] = i
        for v in plan.vertices:
            kk, p = plan.bucket_pos[v]
            if kk == k:
                own_row[v] = pos_to_row[(band_of[v], int(p))]
    own_n = {k: tbl.shape[1] for k, tbl in hplan.band_vert_pos.items()}

    # ---- pass 1: collect ghost vertices and remote message needs --------
    ghosts_below: dict = {b: {k: [] for k in own_n} for b in range(D)}  # owned by b-1
    ghosts_above: dict = {b: {k: [] for k in own_n} for b in range(D)}
    msg_need: dict = {dd: {b: [] for b in range(D)} for dd in (1, -1, 2, -2)}

    def ghost_row(v, b):
        """Extended-table row of vertex v as seen from band b (register a
        ghost on first use).  Offsets resolve in pass 2."""
        k = plan.bucket_pos[v][0]
        bv = band_of[v]
        if bv == b:
            return ("own", k, own_row[v])
        if bv == b - 1:
            lst = ghosts_below[b][k]
            if v not in lst:
                lst.append(v)
            return ("gfb", k, lst.index(v))
        if bv == b + 1:
            lst = ghosts_above[b][k]
            if v not in lst:
                lst.append(v)
            return ("gfa", k, lst.index(v))
        raise ValueError(
            f"gate endpoint {v} is {abs(bv - b)} bands away from executor "
            f"band {b}; halo step requires adjacent bands"
        )

    def msg_ref(eid, b):
        e = edge_by_id[int(eid)]
        bo, slot = hplan.eid_to_band_slot[e]
        if bo == b:
            return ("loc", slot)
        dd = b - bo
        if abs(dd) > 2:
            raise ValueError(
                f"gate environment message {e} is owned {abs(dd)} bands from "
                f"its reader; halo step supports width-2 message halos"
            )
        lst = msg_need[dd][b]
        if e not in lst:
            lst.append(e)
        return ("g", dd, lst.index(e))

    sym_program: list = []
    for entry in program_src:
        if entry[0] == "bp":
            sym_program.append(("bp",))
        elif entry[0] == "one":
            rows: dict = {}
            for k, (pos, gates, gi) in entry[1].per_bucket.items():
                for r in range(len(pos)):
                    v = plan.buckets[k][int(pos[r])]
                    b = band_of[v]
                    rows.setdefault(k, {bb: [] for bb in range(D)})[b].append(
                        (own_row[v], gates[r])
                    )
            sym_program.append(("one", rows))
        else:
            sym_classes = []
            for cls in entry[1].classes:
                rows = {b: [] for b in range(D)}
                for r in range(len(cls.u_pos)):
                    u = plan.buckets[cls.ku][int(cls.u_pos[r])]
                    v = plan.buckets[cls.kv][int(cls.v_pos[r])]
                    bu, bv = band_of[u], band_of[v]
                    for b in sorted({bu, bv}):
                        rows[b].append(
                            dict(
                                u=ghost_row(u, b),
                                v=ghost_row(v, b),
                                su=int(cls.slot_u[r]),
                                sv=int(cls.slot_v[r]),
                                eu=[msg_ref(x, b) for x in cls.env_u_eids[r]],
                                ev=[msg_ref(x, b) for x in cls.env_v_eids[r]],
                                w_uv=("loc", hplan.eid_to_band_slot[edge_by_id[int(cls.eid_uv[r])]][1]) if bu == b else None,
                                w_vu=("loc", hplan.eid_to_band_slot[edge_by_id[int(cls.eid_vu[r])]][1]) if bv == b else None,
                                err=int(cls.gate_index[r]) if bu == b else None,
                                gate=cls.gates[r],
                            )
                        )
                sym_classes.append((cls.ku, cls.kv, rows))
            sym_program.append(("two", sym_classes))

    # ---- pass 2: freeze offsets and materialize tables ------------------
    gfb_n = {k: max(1, max(len(ghosts_below[b][k]) for b in range(D))) for k in own_n}
    gfa_n = {k: max(1, max(len(ghosts_above[b][k]) for b in range(D))) for k in own_n}
    ext_n = {k: own_n[k] + gfb_n[k] + gfa_n[k] + 2 for k in own_n}

    def resolve_row(sym, b=None):
        tag, k, i = sym
        if tag == "own":
            return i
        if tag == "gfb":
            return own_n[k] + i
        return own_n[k] + gfb_n[k] + i

    gsend_up = {}
    gsend_dn = {}
    for k in own_n:
        su = np.zeros((D, gfb_n[k]), dtype=np.int32)
        sd = np.zeros((D, gfa_n[k]), dtype=np.int32)
        for b in range(D):
            if b + 1 < D:
                for i, v in enumerate(ghosts_below[b + 1][k]):
                    su[b, i] = own_row[v]  # owned by b, ghost on b+1
            if b - 1 >= 0:
                for i, v in enumerate(ghosts_above[b - 1][k]):
                    sd[b, i] = own_row[v]
        gsend_up[k] = su
        gsend_dn[k] = sd

    n_msg_base = hplan.n_loc + 1 + hplan.n_up + hplan.n_dn
    msg_off, msg_n, msg_send = {}, {}, {}
    cursor = n_msg_base
    for dd in (1, -1, 2, -2):
        n_r = max(1, max(len(msg_need[dd][b]) for b in range(D)))
        msg_off[dd] = cursor
        msg_n[dd] = n_r
        cursor += n_r
        tbl = np.zeros((D, n_r), dtype=np.int32)
        for b in range(D):  # band b sends the buffer for receiver b+dd
            r = b + dd
            if 0 <= r < D:
                for i, e in enumerate(msg_need[dd][r]):
                    tbl[b, i] = hplan.eid_to_band_slot[e][1]
        msg_send[dd] = tbl
    zslot = cursor
    n_msg_ext = cursor + 1
    msg_trash = hplan.n_loc

    def resolve_msg(sym):
        if sym is None:
            return msg_trash
        if sym[0] == "loc":
            return sym[1]
        _, dd, i = sym
        return msg_off[dd] + i

    sp = HaloStepPlan(
        n_bands=D,
        hplan=hplan,
        n_gates=n_gates,
        own_n=own_n,
        gfb_n=gfb_n,
        gfa_n=gfa_n,
        ext_n=ext_n,
        gsend_up=gsend_up,
        gsend_dn=gsend_dn,
        n_msg_base=n_msg_base,
        msg_off=msg_off,
        msg_n=msg_n,
        msg_send=msg_send,
        zslot=zslot,
        n_msg_ext=n_msg_ext,
    )

    for entry in sym_program:
        if entry[0] == "bp":
            sp.program.append(("bp",))
        elif entry[0] == "one":
            out = {}
            for k, by_band in entry[1].items():
                B = max(1, max(len(x) for x in by_band.values()))
                trash = ext_n[k] - 1
                pos = np.full((D, B), trash, dtype=np.int32)
                gts = np.tile(np.eye(d, dtype=np.complex128), (D, B, 1, 1))
                for b in range(D):
                    for i, (row, g) in enumerate(by_band[b]):
                        pos[b, i] = row
                        gts[b, i] = g
                out[k] = (pos, gts)
            sp.program.append(("one", out))
        else:
            cls_tables = []
            for (ku, kv, rows) in entry[1]:
                B = max(1, max(len(x) for x in rows.values()))
                zu, zv = ext_n[ku] - 2, ext_n[kv] - 2  # clean zero rows
                u_rows = np.full((D, B), zu, dtype=np.int32)
                v_rows = np.full((D, B), zv, dtype=np.int32)
                slot_u = np.zeros((D, B), dtype=np.int32)
                slot_v = np.zeros((D, B), dtype=np.int32)
                env_u = np.full((D, B, max(1, ku - 1)), zslot, dtype=np.int32)
                env_v = np.full((D, B, max(1, kv - 1)), zslot, dtype=np.int32)
                w_uv = np.full((D, B), msg_trash, dtype=np.int32)
                w_vu = np.full((D, B), msg_trash, dtype=np.int32)
                err_idx = np.full((D, B), n_gates, dtype=np.int32)
                gates = np.tile(
                    np.eye(d * d, dtype=np.complex128).reshape(d, d, d, d),
                    (D, B, 1, 1, 1, 1),
                )
                for b in range(D):
                    for i, r in enumerate(rows[b]):
                        u_rows[b, i] = resolve_row(r["u"])
                        v_rows[b, i] = resolve_row(r["v"])
                        slot_u[b, i] = r["su"]
                        slot_v[b, i] = r["sv"]
                        for c, sym in enumerate(r["eu"]):
                            env_u[b, i, c] = resolve_msg(sym)
                        for c, sym in enumerate(r["ev"]):
                            env_v[b, i, c] = resolve_msg(sym)
                        w_uv[b, i] = resolve_msg(r["w_uv"])
                        w_vu[b, i] = resolve_msg(r["w_vu"])
                        if r["err"] is not None:
                            err_idx[b, i] = r["err"]
                        gates[b, i] = r["gate"]
                cls_tables.append(
                    _ClassTables(
                        ku=ku, kv=kv, u_rows=u_rows, v_rows=v_rows,
                        slot_u=slot_u, slot_v=slot_v, env_u=env_u, env_v=env_v,
                        w_uv=w_uv, w_vu=w_vu, err_idx=err_idx, gates=gates,
                    )
                )
            sp.program.append(("two", cls_tables))
    return sp


class HaloStepEngine:
    """Full-layer halo-sharded evolution for a `LatticeEngine`.

    Usage::

        hse = HaloStepEngine(engine, n_bands=8, mesh=mesh)
        step = hse.make_step(layer, cutoff=1e-12)
        hse.Tb, hse.Mb, errors = step(hse.Tb, hse.Mb)
        engine = hse.unshard()
    """

    def __init__(self, engine: LatticeEngine, n_bands: int, mesh: Mesh, order=None):
        if mesh.devices.size != n_bands:
            raise ValueError("mesh size must equal the number of bands")
        self.engine = engine
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        # order="sorted" bands heavy-hex / Eagle lattices (see HaloBandPlan)
        self.hplan = HaloBandPlan.build(engine.plan, n_bands, order=order)
        self.Tb = None
        self.Mb = None

    # -- state layout -----------------------------------------------------
    def _ensure_plan(self, circuit):
        # plan tables carry the gate matrices, so no caching across circuits
        return _build_step_plan(self.engine, self.hplan, circuit)

    def shard_state(self, sp: HaloStepPlan):
        from ..utils.transfer import device_get, device_put

        eng, hp = self.engine, self.hplan
        chi = eng.chi
        D = hp.n_bands
        sh = NamedSharding(self.mesh, P(self.axis))
        Tb = {}
        for k, arr in eng.T.items():
            pos = hp.band_vert_pos[k]
            host = device_get(arr)
            g = np.zeros((D, sp.ext_n[k]) + host.shape[1:], dtype=host.dtype)
            for b in range(D):
                for i, p in enumerate(pos[b]):
                    if p >= 0:
                        g[b, i] = host[p]
            Tb[k] = jax.device_put(device_put(g), sh)
        Mh = device_get(eng.M)
        Mb = np.zeros((D, sp.n_msg_ext, chi, chi), dtype=Mh.dtype)
        for e, eid in eng.plan.edge_ids.items():
            b, slot = hp.eid_to_band_slot[e]
            Mb[b, slot] = Mh[eid]
        self.Tb = Tb
        self.Mb = jax.device_put(device_put(Mb), sh)
        return self.Tb, self.Mb

    def unshard(self) -> LatticeEngine:
        from ..utils.transfer import device_get, device_put

        eng, hp = self.engine, self.hplan
        Tb = {k: device_get(v) for k, v in self.Tb.items()}
        Mb = device_get(self.Mb)
        T = {k: device_get(arr).copy() for k, arr in eng.T.items()}
        for k, tbl in hp.band_vert_pos.items():
            for b in range(hp.n_bands):
                for i, p in enumerate(tbl[b]):
                    if p >= 0:
                        T[k][p] = Tb[k][b, i]
        M = device_get(eng.M).copy()
        for e, eid in eng.plan.edge_ids.items():
            b, slot = hp.eid_to_band_slot[e]
            M[eid] = Mb[b, slot]
        eng.T = {k: device_put(v) for k, v in T.items()}
        eng.M = device_put(M)
        return eng

    # -- exchanges (inside shard_map) -------------------------------------
    def _exchange_bp(self, Ml, b_idx):
        hp = self.hplan
        D = hp.n_bands
        axis = self.axis
        off_hb = hp.n_loc + 1
        off_ha = off_hb + hp.n_up
        up = Ml[jnp.asarray(hp.send_up)[b_idx]]
        dn = Ml[jnp.asarray(hp.send_dn)[b_idx]]
        if D > 1:
            fb = lax.ppermute(up, axis, [(i, i + 1) for i in range(D - 1)])
            fa = lax.ppermute(dn, axis, [(i, i - 1) for i in range(1, D)])
            Ml = Ml.at[off_hb : off_hb + hp.n_up].set(fb)
            Ml = Ml.at[off_ha : off_ha + hp.n_dn].set(fa)
        return Ml

    def _exchange_gates(self, Tl, Ml, sp: HaloStepPlan, b_idx):
        D = sp.n_bands
        axis = self.axis
        Tl = dict(Tl)
        if D > 1:
            for k in Tl:
                buf = Tl[k][jnp.asarray(sp.gsend_up[k])[b_idx]]
                recv = lax.ppermute(buf, axis, [(i, i + 1) for i in range(D - 1)])
                o = sp.own_n[k]
                Tl[k] = Tl[k].at[o : o + sp.gfb_n[k]].set(recv)
                buf = Tl[k][jnp.asarray(sp.gsend_dn[k])[b_idx]]
                recv = lax.ppermute(buf, axis, [(i, i - 1) for i in range(1, D)])
                o = sp.own_n[k] + sp.gfb_n[k]
                Tl[k] = Tl[k].at[o : o + sp.gfa_n[k]].set(recv)
            for dd in (1, -1, 2, -2):
                if D <= abs(dd):
                    continue
                buf = Ml[jnp.asarray(sp.msg_send[dd])[b_idx]]
                perm = [
                    (i, i + dd) for i in range(D) if 0 <= i + dd < D
                ]
                recv = lax.ppermute(buf, axis, perm)
                Ml = Ml.at[sp.msg_off[dd] : sp.msg_off[dd] + sp.msg_n[dd]].set(recv)
        return Tl, Ml

    # -- BP sweeps (inside shard_map; mirrors halo.py) ---------------------
    def _bp_sweeps(self, Tl, Ml, b_idx, n_sweeps: int):
        eng, hp = self.engine, self.hplan
        n_loc = hp.n_loc
        for _ in range(n_sweeps):
            stages = sorted({g[0] for g in hp.groups})
            for stage in stages:
                Ml = self._exchange_bp(Ml, b_idx)
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
        return Ml

    def halo_bytes_per_layer(self, circuit, bp_maxiter: int = 30,
                             bp_inner_maxiter: int = 2) -> dict:
        """Per-device ICI traffic of ONE layer of `make_step`, worst case.

        Walks the same compiled program the step executes and sums the
        byte sizes of every `ppermute` buffer (static shapes, not a
        geometric estimate).  The gate-exchange bytes are exact; the BP
        bytes are an UPPER BOUND — each BP refresh runs a `lax.while_loop`
        with a tolerance early-exit, so `bp_sweeps` counts the iteration
        caps (`bp_refreshes * bp_inner_maxiter + bp_maxiter`), and a
        near-converged state that exits early moves fewer halo bytes than
        reported here."""
        eng, hp = self.engine, self.hplan
        sp = self._ensure_plan(circuit)
        chi = eng.chi
        itemsize = np.dtype(eng.dtype).itemsize
        n_stages = len({g[0] for g in hp.groups})
        msg_bytes = (hp.n_up + hp.n_dn) * chi * chi * itemsize  # per stage
        inner = min(bp_maxiter, bp_inner_maxiter)

        bp_refreshes = sum(1 for e in sp.program if e[0] == "bp")
        bp_sweeps = bp_refreshes * inner + bp_maxiter  # + final refresh
        bp_bytes = bp_sweeps * n_stages * msg_bytes

        gate_bytes = 0
        for entry in sp.program:
            if entry[0] != "two":
                continue
            for k in sp.ext_n:
                row = eng.d * chi**k * itemsize
                gate_bytes += (sp.gfb_n[k] + sp.gfa_n[k]) * row
            for dd in (1, -1, 2, -2):
                if hp.n_bands > abs(dd):
                    gate_bytes += sp.msg_n[dd] * chi * chi * itemsize
        return dict(
            bp_bytes=int(bp_bytes),
            gate_bytes=int(gate_bytes),
            total_bytes=int(bp_bytes + gate_bytes),
            bp_sweeps=int(bp_sweeps),
            n_stages=int(n_stages),
        )

    # -- the step ---------------------------------------------------------
    def make_step(self, circuit, cutoff: float = 0.0, normalize: bool = True,
                  bp_maxiter: int = 30, bp_inner_maxiter: int = 2):
        eng = self.engine
        sp = self._ensure_plan(circuit)
        if self.Tb is None:
            self.shard_state(sp)
        axis = self.axis
        n_gates = sp.n_gates
        dt = np.dtype(eng.dtype)

        # gate tensors as replicated jit args (complex-safe upload)
        from ..engine import _device_put

        G_params: list = []
        for entry in sp.program:
            if entry[0] == "one":
                G_params.append(
                    {k: _device_put(g.astype(dt)) for k, (pos, g) in entry[1].items()}
                )
            elif entry[0] == "two":
                G_params.append([_device_put(ct.gates.astype(dt)) for ct in entry[1]])
            else:
                G_params.append(None)

        inner = min(bp_maxiter, bp_inner_maxiter)

        def body(Tl, Ml, G):
            Tl = {k: v[0] for k, v in Tl.items()}
            Ml = Ml[0]
            b_idx = lax.axis_index(axis)
            errors = jnp.zeros((n_gates + 1,), dtype=eng.real_dtype)
            for gi, entry in enumerate(sp.program):
                if entry[0] == "bp":
                    Ml = self._bp_sweeps(Tl, Ml, b_idx, inner)
                elif entry[0] == "one":
                    for k, (posD, _) in entry[1].items():
                        trash = sp.ext_n[k] - 1
                        pos = _BandRows(posD, sp.ext_n[k], b_idx, drop_rows=(trash,))
                        Gk = G[gi][k][b_idx]
                        A = Tl[k][pos.rows]
                        A = jnp.einsum("Bps,Bs...->Bp...", Gk.astype(A.dtype), A)
                        Tl[k] = _scatter_rows(Tl[k], pos, A)
                else:
                    Tl, Ml = self._exchange_gates(Tl, Ml, sp, b_idx)
                    views = []
                    gates_list = []
                    for ci, ct in enumerate(entry[1]):
                        views.append(
                            SimpleNamespace(
                                ku=ct.ku,
                                kv=ct.kv,
                                u_pos=_BandRows(
                                    ct.u_rows, sp.ext_n[ct.ku], b_idx,
                                    drop_rows=(sp.ext_n[ct.ku] - 2, sp.ext_n[ct.ku] - 1),
                                ),
                                v_pos=_BandRows(
                                    ct.v_rows, sp.ext_n[ct.kv], b_idx,
                                    drop_rows=(sp.ext_n[ct.kv] - 2, sp.ext_n[ct.kv] - 1),
                                ),
                                slot_u=jnp.asarray(ct.slot_u)[b_idx],
                                slot_v=jnp.asarray(ct.slot_v)[b_idx],
                                env_u_eids=jnp.asarray(ct.env_u)[b_idx],
                                env_v_eids=jnp.asarray(ct.env_v)[b_idx],
                                eid_uv=jnp.asarray(ct.w_uv)[b_idx],
                                eid_vu=jnp.asarray(ct.w_vu)[b_idx],
                                gate_index=jnp.asarray(ct.err_idx)[b_idx],
                            )
                        )
                        gates_list.append(G[gi][ci][b_idx])
                    if eng.factor_method == "gram":
                        Tl, Ml, errors = eng._apply_two_site_group(
                            Tl, Ml, errors, views, gates_list, cutoff, normalize
                        )
                    else:
                        for ci, cls in enumerate(views):
                            Tl, Ml, errors = eng._apply_two_site_class(
                                Tl, Ml, errors, cls, cutoff, normalize,
                                gates=gates_list[ci],
                            )
            Ml = self._bp_sweeps(Tl, Ml, b_idx, bp_maxiter)
            errors = lax.psum(errors, axis)[:n_gates]
            return {k: v[None] for k, v in Tl.items()}, Ml[None], errors

        specs_T = {k: P(axis) for k in self.Tb}
        repl_G = jax.tree_util.tree_map(lambda _: P(), G_params)
        kwargs = dict(
            mesh=self.mesh,
            in_specs=(specs_T, P(axis), repl_G),
            out_specs=(specs_T, P(axis), P()),
        )
        try:  # jax >= 0.8
            mapped = shard_map(body, check_vma=False, **kwargs)
        except TypeError:  # pragma: no cover
            mapped = shard_map(body, check_rep=False, **kwargs)
        jitted = jax.jit(mapped)

        def step(Tb, Mb):
            return jitted(Tb, Mb, G_params)

        step.jitted = jitted
        step.gate_params = G_params
        return step
