"""Mesh-parallel boundary-MPS measurement (SURVEY §2.8's measurement leg).

Two parallel dimensions exist in the compiled measurement tier:

* **Samples** (implemented here): the certified sampler is ONE vmapped XLA
  program over per-sample PRNG keys (`tnqs.bmps_engine.BMPSSampler`);
  sharding the key batch over a 1-D device mesh data-parallelizes it — the
  norm-network boundary MPSes are sample-independent and replicate, the
  per-sample projected sweeps partition.  Scaling is embarrassing (no
  cross-sample communication beyond the final gather), which makes this
  the production scale-out axis for sampling workloads.
* **Columns** (:class:`ShardedBMPS`): the zip sweeps are sequential left
  and right chains over column cuts, so columns are banded contiguously
  over a device ring and the boundary MPSes RELAY around it: a
  `lax.fori_loop` in which every device zips its own band and `ppermute`s
  the exit cut-MPS to its neighbour — the left and right sweeps ride the
  ring in opposite directions simultaneously (each costs the same D-step
  relay, so overlapping them is 2x over running them back to back).
  After D-1 relay steps every band holds both of its entry boundaries
  exactly (the reference's inherently sequential outer sweep,
  `boundarympscache.jl:330-369`, is the depth of this relay), and the
  per-column ladder walks — the dominant cost at large chi — run FULLY
  parallel across bands, one `lax.switch` branch per device.  Per-band
  results match the unsharded engine to f32 eps because the on-device
  sketch draws are keyed by (column, direction, vertex), not by device.
  Irregular lattices (heavy-hex / Eagle: cuts carry different numbers of
  cross edges with varying bond shapes) relay PADDED cut-MPSes — every
  exit is zero-padded to the elementwise-max template of its sweep
  direction before the `ppermute`, and each band statically slices its
  entry back to its own entry cut's true shapes (known at trace time
  from `jax.eval_shape` of the full chains) — numerically exact; the
  only cost is max-shaped ICI traffic.  This matches the reference's
  geometry generality (`boundarympscache.jl:560-576`).

Validated on the virtual CPU mesh by `tests/test_parallel.py` and
`__graft_entry__.py:dryrun_multichip` (stage 4).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..bmps_engine import BMPSEngine, BMPSSampler


class ShardedBMPS:
    """Boundary-MPS column sweep banded over a device ring (SURVEY §2.8's
    measurement leg: "boundary-MPS row sweeps pipelined across a device
    ring").

    Columns split into D contiguous bands.  A `lax.fori_loop` relay runs
    the left and right boundary chains around the ring simultaneously —
    every device zips its own band each step and `ppermute`s the exit
    cut-MPS onward (+1 for the left chain, -1 for the right); after D-1
    steps device d's entries are exact (entries of devices ≤ step are
    correct by induction, and band 0 / band D-1 ignore the respective
    wrapped-around garbage).  Then the per-column ladder walks — the
    dominant cost at large chi — run fully parallel across bands via one
    `lax.switch` branch per device.

    Handles irregular lattices (heavy-hex / Eagle) by relaying PADDED
    cut-MPSes: exits are zero-padded to the elementwise-max cut template
    of their sweep direction, entries statically sliced back to the true
    shapes of the band's entry cut — exact, since the padding never
    enters any contraction.  Needs at least one column per device.
    Results match the unsharded :class:`BMPSEngine` to f32 eps because
    the on-device sketch draws are keyed by (column, direction, vertex),
    not by device (`tests/test_parallel.py::test_sharded_bmps_expect`,
    `::test_sharded_bmps_expect_heavy_hex`)."""

    def __init__(self, bmps: BMPSEngine, mesh: Mesh):
        self.bmps = bmps
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.D = int(mesh.devices.size)
        cp = bmps.cplan
        self.periodic = bool(cp.periodic)
        nC = len(cp.columns)
        if nC < self.D:
            raise ValueError(
                f"need >= 1 column per device ({nC} columns, {self.D} devices)"
            )
        base, rem = divmod(nC, self.D)
        sizes = [base + (1 if i < rem else 0) for i in range(self.D)]
        starts = list(np.cumsum([0] + sizes))
        self.bands = [(starts[i], starts[i + 1]) for i in range(self.D)]
        self.nC = nC
        self._templates = None
        self._fn = None

    # -- cut-shape templates ---------------------------------------------
    def _cut_templates(self):
        """((tmplL, cutsL), (tmplR, cutsR)): per sweep direction, the
        elementwise-max padded cut template (list of `ShapeDtypeStruct`,
        every relayed cut is padded to it) and the TRUE per-cut shapes
        (`cuts[c]` = shapes of the MPS living on cut c for that
        direction), derived by `jax.eval_shape` over the full chains (no
        compute).  Uniform-cut lattices pad by zero elements; heavy-hex
        cuts pad in both count and bond dims."""
        if self._templates is not None:
            return self._templates
        bmps, nC = self.bmps, self.nC
        Tspec = {
            k: jax.ShapeDtypeStruct(v.shape, v.dtype)
            for k, v in self.bmps.engine.T.items()
        }

        def left_chain(T):
            cur, outs = [], []
            for c in range(nC - 1):
                cur, _ = bmps._zip_column(T, c, cur, +1)
                outs.append(tuple(cur))
            return tuple(outs)

        def right_chain(T):
            cur, outs = [], []
            for c in range(nC - 1, 0, -1):
                cur, _ = bmps._zip_column(T, c, cur, -1)
                outs.append(tuple(cur))
            return tuple(outs)

        # left_chain outs[j] lives on cut j; right_chain outs[j] (produced
        # by zipping column nC-1-j in direction -1) lives on cut nC-2-j
        lefts = jax.eval_shape(left_chain, Tspec)
        rights = jax.eval_shape(right_chain, Tspec)
        cutsL = {c: list(lefts[c]) for c in range(nC - 1)}
        cutsR = {nC - 2 - j: list(rights[j]) for j in range(nC - 1)}

        def template(cuts):
            all_t = [t for cut in cuts.values() for t in cut]
            n = max(len(cut) for cut in cuts.values())
            shape = tuple(
                max(t.shape[i] for t in all_t) for i in range(4)
            )
            dt = all_t[0].dtype
            return [jax.ShapeDtypeStruct(shape, dt)] * n

        self._templates = (
            (template(cutsL), cutsL),
            (template(cutsR), cutsR),
        )
        return self._templates

    @staticmethod
    def _pad_cut(cut: list, tmpl: list):
        """Zero-pad a cut-MPS (list of [q, bk, bb, q2] tensors) to the relay
        template: each tensor padded up to the template shape, the list
        padded with zero tensors to the template length."""
        out = []
        for i, t in enumerate(tmpl):
            if i < len(cut):
                x = cut[i]
                pads = [(0, t.shape[j] - x.shape[j]) for j in range(4)]
                out.append(jnp.pad(x, pads))
            else:
                out.append(jnp.zeros(t.shape, t.dtype))
        return tuple(out)

    @staticmethod
    def _unpad_cut(entry: tuple, true_shapes: list):
        """Slice a relayed padded cut-MPS back to the true shapes of the
        consuming band's entry cut (static at trace time) — the padding
        never enters a contraction, so the relay is numerically exact."""
        return [
            entry[i][tuple(slice(0, s) for s in t.shape)]
            for i, t in enumerate(true_shapes)
        ]

    # -- ring (periodic) plans: banded Gauss-Seidel relay -------------------
    def _ring_templates(self):
        """Ring-plan analog of `_cut_templates`: per sweep direction, the
        padded relay template and the per-band STABLE entry-cut shapes of
        the banded Gauss-Seidel relay, via iterated `jax.eval_shape` of the
        band zips from the BP product-MPS inits (the shape map reaches its
        fixed point within a winding or two; asserted).  No compute."""
        if self._templates is not None:
            return self._templates
        bmps, nC, D = self.bmps, self.nC, self.D
        eng = bmps.engine
        Tspec = {
            k: jax.ShapeDtypeStruct(v.shape, v.dtype) for k, v in eng.T.items()
        }
        chi = eng.M.shape[-1]
        dt = eng.M.dtype
        cp = bmps.cplan

        def init_spec(cut):
            return tuple(
                jax.ShapeDtypeStruct((1, chi, chi, 1), dt) for _ in cut
            )

        def band_zip(i, direction):
            s0, s1 = self.bands[i]
            cols = range(s0, s1) if direction > 0 else range(s1 - 1, s0 - 1, -1)

            def f(T, entry):
                cur = list(entry)
                for c in cols:
                    cur, _ = bmps._zip_column(T, c, cur, direction)
                return tuple(cur)

            return f

        def stable_entries(direction):
            # left chain (+1): band i's entry lives on cut (s0-1)%nC and its
            # exit feeds band i+1; right chain (-1): entry on cut (s1-1)%nC,
            # exit feeds band i-1
            entries = [
                init_spec(
                    cp.cross[(self.bands[i][0] - 1) % nC]
                    if direction > 0
                    else cp.cross[(self.bands[i][1] - 1) % nC]
                )
                for i in range(D)
            ]
            step = 1 if direction > 0 else -1
            for _ in range(8):
                exits = [
                    jax.eval_shape(band_zip(i, direction), Tspec, entries[i])
                    for i in range(D)
                ]
                new = [exits[(i - step) % D] for i in range(D)]
                if all(
                    tuple(t.shape for t in a) == tuple(t.shape for t in b)
                    for a, b in zip(new, entries)
                ):
                    return new
                entries = new
            raise RuntimeError(
                "ring relay cut shapes did not stabilize in 8 windings"
            )

        def template(entries):
            all_t = [t for e in entries for t in e]
            n = max(len(e) for e in entries)
            shape = tuple(max(t.shape[i] for t in all_t) for i in range(4))
            return [jax.ShapeDtypeStruct(shape, all_t[0].dtype)] * n

        entryL = stable_entries(+1)
        entryR = stable_entries(-1)
        self._templates = (
            (template(entryL), entryL),
            (template(entryR), entryR),
        )
        return self._templates

    def _build_expect_ring(self):
        """Ring-plan expect program: the banded counterpart of the
        unsharded Gauss-Seidel relaxation (`BMPSEngine._boundary_mpses`,
        periodic branch).  Each device seeds its entry cut from the BP
        bond environments (zero-embedded into the stable relay shapes —
        padding never enters a contraction) and `ring_iters * D` relay
        steps wind every message `ring_iters` times around the ring, the
        same power-iteration depth per message as the unsharded loop (which
        winds ONE message around; both converge to the same fixed-point
        class as correlations decay).  The per-column ladder walks then run
        fully parallel across bands, exactly like the line-plan program."""
        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map

        bmps, cp, nC, D = self.bmps, self.bmps.cplan, self.nC, self.D
        axis, bands = self.axis, self.bands
        eng = bmps.engine
        eids = eng.plan.edge_ids
        (tmplL, entryL), (tmplR, entryR) = self._ring_templates()
        maxnv = max(
            sum(len(cp.columns[c]) for c in range(s0, s1)) for (s0, s1) in bands
        )
        fwd = [(i, (i + 1) % D) for i in range(D)]
        bwd = [(i, (i - 1) % D) for i in range(D)]
        steps = max(bmps.ring_iters, 1) * D

        def mk_init(i, direction, tmpl):
            s0, s1 = bands[i]
            cut = cp.cross[((s0 if direction > 0 else s1) - 1) % nC]

            def f(M):
                out = [
                    M[eids[(u, w) if direction > 0 else (w, u)]][
                        None, :, :, None
                    ]
                    for (u, w) in cut
                ]
                return self._pad_cut(out, tmpl)

            return f

        def mk_exit(i, direction, stable, tmpl):
            s0, s1 = bands[i]
            cols = range(s0, s1) if direction > 0 else range(s1 - 1, s0 - 1, -1)

            def f(T, entry):
                cur = self._unpad_cut(entry, stable[i])
                for c in cols:
                    cur, _ = bmps._zip_column(T, c, cur, direction)
                return self._pad_cut(cur, tmpl)

            return f

        def mk_band_body(i):
            s0, s1 = bands[i]

            def f(T, eL, eR, op):
                lefts = {}
                cur = self._unpad_cut(eL, entryL[i])
                for c in range(s0, s1):
                    lefts[c] = cur
                    if c < s1 - 1:
                        cur, _ = bmps._zip_column(T, c, cur, +1)
                rights = {}
                cur = self._unpad_cut(eR, entryR[i])
                for c in range(s1 - 1, s0 - 1, -1):
                    rights[c] = cur
                    if c > s0:
                        cur, _ = bmps._zip_column(T, c, cur, -1)
                vals = []
                for c in range(s0, s1):
                    got = bmps._ladder_expect(T, c, lefts[c], rights[c], op)
                    vals.extend(got[v] for v in cp.columns[c])
                vals = jnp.stack(vals)
                return jnp.pad(vals, (0, maxnv - vals.shape[0]))

            return f

        initL_b = [mk_init(i, +1, tmplL) for i in range(D)]
        initR_b = [mk_init(i, -1, tmplR) for i in range(D)]
        exitL_b = [mk_exit(i, +1, entryL, tmplL) for i in range(D)]
        exitR_b = [mk_exit(i, -1, entryR, tmplR) for i in range(D)]
        band_b = [mk_band_body(i) for i in range(D)]

        kwargs = dict(
            mesh=self.mesh, in_specs=(P(), P(), P()), out_specs=P(axis)
        )

        def smap(f):
            try:  # jax >= 0.8 renamed check_rep -> check_vma
                return shard_map(f, check_vma=False, **kwargs)
            except TypeError:
                return shard_map(f, check_rep=False, **kwargs)

        @smap
        def run(T, op, M):
            d = jax.lax.axis_index(axis)
            eL = jax.lax.switch(d, initL_b, M)
            eR = jax.lax.switch(d, initR_b, M)

            def relay(t, carry):
                eL, eR = carry
                exL = jax.lax.switch(d, exitL_b, T, eL)
                exR = jax.lax.switch(d, exitR_b, T, eR)
                newL = jax.tree.map(lambda x: jax.lax.ppermute(x, axis, fwd), exL)
                newR = jax.tree.map(lambda x: jax.lax.ppermute(x, axis, bwd), exR)
                return newL, newR

            eL, eR = jax.lax.fori_loop(0, steps, relay, (eL, eR))
            vals = jax.lax.switch(d, band_b, T, eL, eR, op)
            return vals[None]  # [1, maxnv] per device -> [D, maxnv] global

        order = [
            v for (s0, s1) in bands for c in range(s0, s1) for v in cp.columns[c]
        ]
        counts = [
            sum(len(cp.columns[c]) for c in range(s0, s1)) for (s0, s1) in bands
        ]
        return jax.jit(run), order, counts, maxnv

    # -- compiled program -------------------------------------------------
    def _build_expect(self):
        from functools import partial

        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map

        bmps, cp, nC, D = self.bmps, self.bmps.cplan, self.nC, self.D
        axis, bands = self.axis, self.bands
        (tmplL, cutsL), (tmplR, cutsR) = self._cut_templates()
        maxnv = max(
            sum(len(cp.columns[c]) for c in range(s0, s1)) for (s0, s1) in bands
        )
        fwd = [(i, (i + 1) % D) for i in range(D)]
        bwd = [(i, (i - 1) % D) for i in range(D)]

        def mk_left_exit(i):
            s0, s1 = bands[i]

            def f(T, entry):
                if s1 >= nC:  # last band: no leftward consumer
                    return tuple(jnp.zeros(t.shape, t.dtype) for t in tmplL)
                cur = [] if s0 == 0 else self._unpad_cut(entry, cutsL[s0 - 1])
                for c in range(s0, s1):
                    cur, _ = bmps._zip_column(T, c, cur, +1)
                return self._pad_cut(cur, tmplL)

            return f

        def mk_right_exit(i):
            s0, s1 = bands[i]

            def f(T, entry):
                if s0 == 0:  # first band: no rightward consumer
                    return tuple(jnp.zeros(t.shape, t.dtype) for t in tmplR)
                cur = [] if s1 == nC else self._unpad_cut(entry, cutsR[s1 - 1])
                for c in range(s1 - 1, s0 - 1, -1):
                    cur, _ = bmps._zip_column(T, c, cur, -1)
                return self._pad_cut(cur, tmplR)

            return f

        def mk_band_body(i):
            s0, s1 = bands[i]

            def f(T, entryL, entryR, op):
                lefts = {}
                cur = [] if s0 == 0 else self._unpad_cut(entryL, cutsL[s0 - 1])
                for c in range(s0, s1):
                    lefts[c] = cur
                    if c < s1 - 1:
                        cur, _ = bmps._zip_column(T, c, cur, +1)
                rights = {}
                cur = [] if s1 == nC else self._unpad_cut(entryR, cutsR[s1 - 1])
                for c in range(s1 - 1, s0 - 1, -1):
                    rights[c] = cur
                    if c > s0:
                        cur, _ = bmps._zip_column(T, c, cur, -1)
                vals = []
                for c in range(s0, s1):
                    got = bmps._ladder_expect(T, c, lefts[c], rights[c], op)
                    vals.extend(got[v] for v in cp.columns[c])
                vals = jnp.stack(vals)
                return jnp.pad(vals, (0, maxnv - vals.shape[0]))

            return f

        left_branches = [mk_left_exit(i) for i in range(D)]
        right_branches = [mk_right_exit(i) for i in range(D)]
        band_branches = [mk_band_body(i) for i in range(D)]

        kwargs = dict(mesh=self.mesh, in_specs=(P(), P()), out_specs=P(axis))

        def smap(f):
            try:  # jax >= 0.8 renamed check_rep -> check_vma
                return shard_map(f, check_vma=False, **kwargs)
            except TypeError:
                return shard_map(f, check_rep=False, **kwargs)

        @smap
        def run(T, op):
            d = jax.lax.axis_index(axis)
            entryL0 = tuple(jnp.zeros(t.shape, t.dtype) for t in tmplL)
            entryR0 = tuple(jnp.zeros(t.shape, t.dtype) for t in tmplR)

            def relay(t, carry):
                entryL, entryR = carry
                exitL = jax.lax.switch(d, left_branches, T, entryL)
                exitR = jax.lax.switch(d, right_branches, T, entryR)
                newL = jax.tree.map(lambda x: jax.lax.ppermute(x, axis, fwd), exitL)
                newR = jax.tree.map(lambda x: jax.lax.ppermute(x, axis, bwd), exitR)
                return newL, newR

            entryL, entryR = jax.lax.fori_loop(
                0, D - 1, relay, (entryL0, entryR0)
            )
            vals = jax.lax.switch(d, band_branches, T, entryL, entryR, op)
            return vals[None]  # [1, maxnv] per device -> [D, maxnv] global

        order = [v for (s0, s1) in bands for c in range(s0, s1) for v in cp.columns[c]]
        counts = [
            sum(len(cp.columns[c]) for c in range(s0, s1)) for (s0, s1) in bands
        ]
        return jax.jit(run), order, counts, maxnv

    def expect_1site(self, opname: str) -> dict:
        """Ring-parallel boundary-MPS <op_v> for every vertex (compiled
        counterpart of `expect(..., alg="boundarymps")`, reference
        `expect.jl:84-112`, sharded per SURVEY §2.8)."""
        from ..sitetypes import op_matrix
        from ..utils.transfer import device_get

        if self._fn is None:
            self._fn = (
                self._build_expect_ring() if self.periodic else self._build_expect()
            )
        jfn, order, counts, maxnv = self._fn
        eng = self.bmps.engine
        repl = NamedSharding(self.mesh, P())
        T = {k: jax.device_put(v, repl) for k, v in eng.T.items()}
        op = jax.device_put(
            np.asarray(op_matrix(opname, eng.d)).astype(np.dtype(eng.dtype)), repl
        )
        if self.periodic:
            M = jax.device_put(eng.M, repl)
            vals = np.asarray(device_get(jfn(T, op, M)))  # [D, maxnv]
        else:
            vals = np.asarray(device_get(jfn(T, op)))  # [D, maxnv]
        out = {}
        k = 0
        for i, n in enumerate(counts):
            for j in range(n):
                out[order[k]] = complex(vals[i, j])
                k += 1
        return out


class ShardedSampler:
    """Data-parallel certified sampling over a 1-D mesh.

    Wraps a :class:`BMPSSampler`; the per-sample key batch is sharded over
    the mesh axis, the engine state and messages are replicated, and the
    sampler's single vmapped program partitions across devices."""

    def __init__(self, sampler: BMPSSampler, mesh: Mesh):
        self.sampler = sampler
        self.mesh = mesh
        self.axis = mesh.axis_names[0]

    def sample_directly_certified(self, nsamples: int, seed: int = 0):
        from ..utils.transfer import device_get

        sam = self.sampler
        D = self.mesh.devices.size
        n_pad = -(-nsamples // D) * D  # pad to a multiple of the mesh size
        if "norm" not in sam._fns:
            sam._fns["norm"] = sam._build_norm()
        # each device holds only n_pad / D lanes of the sharded vmap, so
        # the einsum budget divides by the per-device count (keyed apart
        # from the single-device program of the same width)
        if ("group", n_pad, D) not in sam._fns:
            sam._fns[("group", n_pad, D)] = sam._build_group(
                n_pad, local_width=n_pad // D
            )
        repl = NamedSharding(self.mesh, P())
        eng = sam.bmps.engine
        T = {k: jax.device_put(v, repl) for k, v in eng.T.items()}
        M = jax.device_put(eng.M, repl)
        # norm-network boundary MPSes: sample-independent, computed once,
        # replicated over the mesh (every device reads its local copy)
        rights, rlog, log_zbp, norm_log, wrap = sam._fns["norm"](T, M)
        n_hat = jnp.exp(norm_log - log_zbp)
        keys = jax.random.split(jax.random.PRNGKey(seed), n_pad)
        keys = jax.device_put(keys, NamedSharding(self.mesh, P(self.axis)))
        bits, logq, poverq = sam._fns[("group", n_pad, D)](
            T, rights, rlog, log_zbp, keys, wrap
        )
        bits = np.asarray(device_get(bits))[:nsamples]
        logq = np.asarray(device_get(logq))[:nsamples]
        poverq = np.asarray(device_get(poverq))[:nsamples]
        n_hat = float(np.asarray(device_get(n_hat)))
        return [
            dict(
                poverq=float(poverq[s]),
                logq=float(logq[s]),
                norm_estimate=n_hat,
                bitstring={
                    v: int(bits[s, i]) for i, v in enumerate(sam.keys_order)
                },
            )
            for s in range(nsamples)
        ]
