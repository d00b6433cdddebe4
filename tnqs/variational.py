"""Differentiable variational energy minimization on the compiled engine.

A capability the Julia reference does not have (its evolution is purely
circuit/Trotter based): because the engine's BP sweep and expectation
contractions are pure JAX functions of the padded site-tensor pytree, the
BP energy

    E(T) = sum_v h_v <op_v>_BP + sum_e J_e <op_u op_v>_BP

is reverse-differentiable end to end — `jax.grad` through a fixed number
of unrolled (rematerialized) BP sweeps and the per-region normalized
expectation contractions.  Minimizing E over the site tensors with optax
is then direct variational ground-state search in the BP (simple-update)
environment approximation: exact on trees (where BP expectations equal
the true Rayleigh quotient, so the optimum is the true ground state at
sufficient chi), the standard belief-propagation variational energy on
loopy graphs.

This is TPU-first by construction: the energy is ONE jitted XLA program
(BP scan + batched expectation einsums), its gradient another, so an
optimization step is two device dispatches regardless of lattice size.

No reference counterpart; the closest anchors are the expectation
contractions it reuses (`/root/reference/src/expect.jl:59-82`, engine
ports `tnqs/engine.py:_expect_1site_all/_expect_2site_all`) and the BP
sweep (`/root/reference/src/MessagePassing/abstractbeliefpropagationcache.jl:162-199`).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Mapping, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


@dataclass(frozen=True)
class Hamiltonian:
    """Sum of 1-site fields and 2-site (edge) bonds.

    ``fields`` — sequence of ``(opname, coeff)``; ``bonds`` — sequence of
    ``(opname_u, opname_v, coeff)``.  Each ``coeff`` is a float applied
    uniformly, or a dict keyed by vertex (fields) / edge in either
    orientation (bonds) for inhomogeneous couplings; missing keys mean 0.
    Operator names resolve through `tnqs.sitetypes.op_matrix` ("X", "Z",
    "S+", ...).
    """

    fields: Sequence[tuple] = field(default_factory=tuple)
    bonds: Sequence[tuple] = field(default_factory=tuple)


def tfim_hamiltonian(J: float = 1.0, h: float = 1.0) -> Hamiltonian:
    """Transverse-field Ising: H = -J sum_e Z_u Z_v - h sum_v X_v."""
    return Hamiltonian(fields=(("X", -h),), bonds=(("Z", "Z", -J),))


def heisenberg_hamiltonian(J: float = 1.0) -> Hamiltonian:
    """Spin-1/2 Heisenberg: H = J sum_e S_u . S_v (S = sigma/2)."""
    c = J / 4.0
    return Hamiltonian(bonds=(("X", "X", c), ("Y", "Y", c), ("Z", "Z", c)))


def _vertex_coeff(coeff, v) -> float:
    if isinstance(coeff, Mapping):
        return float(coeff.get(v, 0.0))
    return float(coeff)


def _edge_coeff(coeff, e) -> float:
    if isinstance(coeff, Mapping):
        u, v = e
        if e in coeff:
            return float(coeff[e])
        return float(coeff.get((v, u), 0.0))
    return float(coeff)


def _real_dtype(engine):
    return jnp.float64 if engine.dtype == jnp.complex128 else jnp.float32


def _precompute_terms(engine, ham: Hamiltonian):
    """Resolve operator matrices and per-bucket/per-edge-class coefficient
    vectors once (host-side, static per (engine, ham))."""
    plan = engine.plan
    from .sitetypes import op_matrix

    rdtype = _real_dtype(engine)
    field_terms = []
    for (opname, coeff) in ham.fields:
        op = jnp.asarray(np.asarray(op_matrix(opname, engine.d)), engine.dtype)
        cvecs = {
            k: jnp.asarray([_vertex_coeff(coeff, v) for v in verts], rdtype)
            for k, verts in plan.buckets.items()
        }
        field_terms.append((op, cvecs))

    bond_terms = []
    ecls = engine._edge_classes()
    for (opu, opv, coeff) in ham.bonds:
        mats = (
            jnp.asarray(np.asarray(op_matrix(opu, engine.d)), engine.dtype),
            jnp.asarray(np.asarray(op_matrix(opv, engine.d)), engine.dtype),
        )
        cvecs = [
            jnp.asarray([_edge_coeff(coeff, e) for e in edges], rdtype)
            for (_ku, _kv, edges, *_rest) in ecls
        ]
        bond_terms.append((mats, cvecs))
    return field_terms, bond_terms


def _expectation_energy(engine, field_terms, bond_terms, T, M, rdtype):
    e = jnp.zeros((), rdtype)
    for op, cvecs in field_terms:
        outs = engine._expect_1site_all(T, M, op)
        for k, vals in outs.items():
            e = e + jnp.sum(cvecs[k] * jnp.real(vals).astype(rdtype))
    for (mu, mv), cvecs in bond_terms:
        outs = engine._expect_2site_all(T, M, mu, mv)
        for cv, vals in zip(cvecs, outs):
            e = e + jnp.sum(cv * jnp.real(vals).astype(rdtype))
    return e


def bp_energy_fn(engine, ham: Hamiltonian, bp_iters: int = 16) -> Callable:
    """Pure function ``energy(T) -> real scalar`` on the engine's padded
    site-tensor pytree.

    BP runs `bp_iters` fixed synchronous sweeps from delta messages (a
    `lax.scan` with a rematerialized body, so memory stays one sweep deep
    under reverse AD) — fixed iterations rather than the engine's
    `while_loop` fixed point because `lax.while_loop` is not
    reverse-differentiable.  Choose `bp_iters` >= the graph diameter so
    messages globally equilibrate (16 covers every lattice in the test
    zoo; trees need exactly the diameter).
    """
    rdtype = _real_dtype(engine)
    field_terms, bond_terms = _precompute_terms(engine, ham)
    M0 = engine._initial_messages()

    def energy(T):
        def body(M, _):
            return engine._bp_new_messages(T, M), None

        M, _ = lax.scan(jax.checkpoint(body), M0, None, length=bp_iters)
        return _expectation_energy(engine, field_terms, bond_terms, T, M, rdtype)

    return energy


def sharded_bp_energy_fn(
    engine,
    ham: Hamiltonian,
    mesh=None,
    n_bands: int | None = None,
    bp_iters: int = 16,
    order=None,
) -> Callable:
    """`bp_energy_fn`, with the BP sweeps executed as the halo-exchange
    `shard_map` program over a 1-D device mesh (`tnqs.parallel.halo`).

    Everything stays inside one differentiable jitted program: the site
    tensors are scattered into per-band shards with gather indexing (pure
    JAX, so gradients flow back through the band layout), `bp_iters`
    sharded sweeps run under `lax.scan` (ppermute halo exchanges
    transpose to the reverse ppermute under AD), the converged messages
    gather back to the global edge layout, and the expectation sums run
    on the full state.  Gradient = `jax.grad` straight through the
    collective program — mesh-parallel variational ground-state search.
    """
    from .parallel.halo import HaloBP, HaloBandPlan
    from .parallel.mesh import make_mesh

    if mesh is None:
        mesh = make_mesh(n_bands)
    D = int(mesh.devices.size)
    hplan = HaloBandPlan.build(engine.plan, D, order=order)
    hbp = HaloBP(engine, hplan, mesh)
    sweep = hbp._make_sweep()

    rdtype = _real_dtype(engine)
    field_terms, bond_terms = _precompute_terms(engine, ham)

    chi = engine.chi
    pos_maps = {k: jnp.asarray(hplan.band_vert_pos[k]) for k in engine.T}
    n_slots = hplan.n_loc + 1 + hplan.n_up + hplan.n_dn
    E2 = engine.plan.num_edges
    band_arr = np.zeros(E2, np.int32)
    slot_arr = np.zeros(E2, np.int32)
    for e, eid in engine.plan.edge_ids.items():
        b, s = hplan.eid_to_band_slot[e]
        band_arr[eid] = b
        slot_arr[eid] = s
    band_arr, slot_arr = jnp.asarray(band_arr), jnp.asarray(slot_arr)
    Mb0 = jnp.broadcast_to(
        jnp.eye(chi, dtype=engine.dtype) / chi, (D, n_slots, chi, chi)
    )

    def energy(T):
        Tb = {}
        for k, arr in T.items():
            pos = pos_maps[k]  # [D, nb], -1 pads
            gathered = arr[jnp.clip(pos, 0)]  # [D, nb, d, chi x k]
            mask = (pos >= 0).astype(arr.dtype)
            Tb[k] = gathered * mask.reshape(mask.shape + (1,) * (arr.ndim - 1))

        def body(Mb, _):
            return sweep(Tb, Mb), None

        Mb, _ = lax.scan(jax.checkpoint(body), Mb0, None, length=bp_iters)
        M = Mb[band_arr, slot_arr]  # back to the global [2E, chi, chi] layout
        return _expectation_energy(engine, field_terms, bond_terms, T, M, rdtype)

    return energy


def _split(T):
    return {k: (jnp.real(a), jnp.imag(a)) for k, a in T.items()}


def _join(params, dtype):
    return {
        k: lax.complex(re, im).astype(dtype) for k, (re, im) in params.items()
    }


def minimize_energy(
    engine,
    ham: Hamiltonian,
    steps: int = 200,
    learning_rate: float = 0.05,
    bp_iters: int = 16,
    optimizer: Any = None,
    callback: Callable | None = None,
    mesh=None,
) -> dict:
    """Variational ground-state search: gradient-descend the BP energy
    over the engine's site tensors (optax Adam by default).

    The complex tensors are optimized as (real, imag) leaf pairs (the BP
    energy is real but not holomorphic).  The engine's current state is
    the initial guess — seed it with a product state plus a little noise,
    or the output of a few imaginary-time layers, for best convergence.
    On success the engine is updated in place (tensors + converged
    messages).  Returns ``{"energy": float, "history": np.ndarray,
    "steps": int}``.  Pass ``mesh`` (a 1-D `jax.sharding.Mesh`) to run
    the BP sweeps as the halo-exchange shard_map program over the device
    mesh (`sharded_bp_energy_fn`).
    """
    import optax

    if optimizer is None:
        optimizer = optax.adam(learning_rate)

    if mesh is not None:
        efn = sharded_bp_energy_fn(engine, ham, mesh=mesh, bp_iters=bp_iters)
    else:
        efn = bp_energy_fn(engine, ham, bp_iters=bp_iters)
    dtype = engine.dtype

    def loss(params):
        return efn(_join(params, dtype))

    vg = jax.jit(jax.value_and_grad(loss))
    opt_update = jax.jit(optimizer.update)

    params = _split(engine.T)
    opt_state = optimizer.init(params)
    history = np.zeros(steps, dtype=np.float64)
    best_e, best_params = np.inf, params
    for i in range(steps):
        e, g = vg(params)
        e = float(e)
        history[i] = e
        if not np.isfinite(e):
            raise FloatingPointError(
                f"variational energy became non-finite at step {i}; "
                "reduce the learning rate or bp_iters"
            )
        if e < best_e:
            best_e, best_params = e, params
        updates, opt_state = opt_update(g, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        if callback is not None:
            callback(i, e)
    engine.T = _join(best_params, dtype)
    engine.bp_update()
    return {"energy": best_e, "history": history, "steps": steps}
