"""Gate-path microbenchmark: where do the ~350 ms of two-site work go?

Round-2 ablation showed the fused-BP benchmark layer is ~94% two-site gate
groups (`docs/performance.md`).  This script times the individual pieces of
`LatticeEngine._apply_two_site_group` at the exact benchmark shapes
(Eagle-127, chi=64, complex64) on the current default device, fetch-forced
(tunneled backends return from `block_until_ready` before execution).

Run on TPU:  python scripts/microbench_gate.py
Smoke (CPU): TNQS_MB_FAST=1 python scripts/microbench_gate.py
"""

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp

import tnqs
from tnqs.engine import LatticeEngine, OneSiteGroup, compile_circuit, build_program
from tnqs.models import heavy_hex_kicked_ising_layer
from tnqs.utils.transfer import device_put

FAST = bool(os.environ.get("TNQS_MB_FAST"))


def _probe_val(out):
    leaves = jax.tree_util.tree_leaves(out)

    @jax.jit
    def probe(leaves):
        h = jnp.zeros((), jnp.float32)
        for arr in leaves:
            h = h + jnp.real(jnp.sum(arr)).astype(jnp.float32)
        return jnp.full((1, 1), h)

    return float(np.asarray(probe(leaves))[0, 0])


def timeit(name, fn, *args, iters=None, **kwargs):
    if iters is None:
        iters = 3 if FAST else 10
    jfn = jax.jit(fn) if not hasattr(fn, "lower") else fn
    out = jfn(*args, **kwargs)
    val = _probe_val(out)  # warm: compile + 1 run, forced
    t0 = time.time()
    for _ in range(iters):
        out = jfn(*args, **kwargs)
    val = _probe_val(out)
    dt = (time.time() - t0) / iters
    finite = np.isfinite(val)
    print(f"{name:55s} {dt * 1e3:9.2f} ms   {'' if finite else 'NON-FINITE!'}", flush=True)
    return dt


def main():
    g = tnqs.heavy_hexagonal_lattice(2, 2) if FAST else tnqs.eagle_lattice()
    chi = 8 if FAST else 64
    layer = heavy_hex_kicked_ising_layer(g, float(np.pi / 4), 0.4)
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)
    eng = LatticeEngine(psi, chi=chi, dtype=jnp.complex64)
    print(f"# backend={jax.default_backend()} chi={chi} nv={g.nv()} "
          f"factor={eng.factor_method} gauge={eng.env_gauge} trunc={eng.trunc_method}")

    # warm the state so bonds are saturated (4 ladder layers then pad)
    step = eng.make_step(layer, cutoff=1e-12, bp_maxiter=25)
    T, M = eng.T, eng.M
    for _ in range(7):
        T, M, err = step(T, M)
    _probe_val((T, M))
    eng.T, eng.M = T, M

    compiled = compile_circuit(eng.plan, layer, d=eng.d)
    program = build_program(eng.plan, compiled)
    two_groups = [e for e in program if e[0] == "two"]
    one_groups = [e for e in program if e[0] == "one"]
    print(f"# program: {len(one_groups)} one-site, {len(two_groups)} two-site, "
          f"{sum(1 for e in program if e[0] == 'bp')} bp refreshes")
    grp = two_groups[0][1]
    gidx = two_groups[0][2]
    for cls in grp.classes:
        print(f"#   class (ku={cls.ku}, kv={cls.kv}): B={len(cls.u_pos)}")

    gates_list = [
        device_put(np.asarray(cls.gates).astype(np.complex64)) for cls in grp.classes
    ]

    # ---- calibration: dispatch+fetch floor and a reference matmul ----
    small = jnp.ones((8, 128), jnp.float32)
    timeit("calibration: trivial add (dispatch floor)", lambda x: x + 1.0, small)
    big = jnp.ones((26, 256, 256), jnp.float32)
    timeit("calibration: [26,256,256] f32 batched matmul",
           lambda a: jnp.einsum("bij,bjk->bik", a, a), big)

    # ---- end-to-end pieces ----
    timeit("full layer step", step.jitted, T, M, step.gate_params, iters=3 if FAST else 5)
    timeit(
        "bp fixed point (inner, 2 iters)",
        lambda T, M: eng._bp_fixed_point(T, M, 2, 1e-5),
        T, M,
    )
    timeit(
        "bp fixed point (final, 25 iters cap)",
        lambda T, M: eng._bp_fixed_point(T, M, 25, 1e-5),
        T, M,
    )
    timeit("bp plane conversion alone", lambda T: eng._bp_planes(T), T)

    def bp_sweep_only(T, M):
        planes = eng._bp_planes(T)
        return eng._bp_new_messages(T, M, planes)

    timeit("bp planes + ONE sweep", bp_sweep_only, T, M)

    def one_two_site_group(T, M, gates_list):
        errors = jnp.zeros((len(layer),), dtype=jnp.float32)
        return eng._apply_two_site_group(
            T, M, errors, grp.classes, gates_list, 1e-12, True
        )

    timeit("one two-site color group (full)", one_two_site_group, T, M, gates_list)

    def one_two_site_group_nofactor(T, M, gates_list):
        errors = jnp.zeros((len(layer),), dtype=jnp.float32)
        old = eng.reduce_method
        eng.reduce_method = "gram_nofactor"
        try:
            return eng._apply_two_site_group(
                T, M, errors, grp.classes, gates_list, 1e-12, True
            )
        finally:
            eng.reduce_method = old

    timeit("one two-site group (Q-free reduce)", one_two_site_group_nofactor, T, M, gates_list)

    # ---- phase breakdown at the shapes of the largest class ----
    from tnqs.engine import _cholesky_gauge_roots
    from tnqs.ops.factorizations import cholesky_qr, gram_svd, subspace_eigh, default_eigh

    cls = max(grp.classes, key=lambda c: len(c.u_pos))
    Bn = len(cls.u_pos)
    d = eng.d
    eps = float(np.finfo(np.float32).eps)

    def gather_both(T):
        Au = eng._gather_permuted(T, cls.ku, cls.u_pos, cls.slot_u)
        Av = eng._gather_permuted(T, cls.kv, cls.v_pos, cls.slot_v)
        return Au, Av

    timeit(f"gather both sides (B={Bn})", gather_both, T)
    Au, Av = jax.jit(gather_both)(T)

    # env bank for the group (all classes, both sides)
    def env_bank(M):
        bank = []
        for c in grp.classes:
            for (k, eids) in ((c.ku, c.env_u_eids), (c.kv, c.env_v_eids)):
                if k > 1:
                    bank.append(M[eids].reshape(-1, chi, chi))
        return jnp.concatenate(bank, axis=0)

    E_all = jax.jit(env_bank)(M)
    print(f"# env bank: {E_all.shape}")
    timeit("env gauge: cholesky roots", lambda E: _cholesky_gauge_roots(E, eps), E_all)

    W_all, Winv_all = jax.jit(lambda E: _cholesky_gauge_roots(E, eps))(E_all)
    Wu = W_all[: Bn * (cls.ku - 1)].reshape(Bn, cls.ku - 1, chi, chi)
    Wv = W_all[Bn * (cls.ku - 1): Bn * (cls.ku - 1) + Bn * (cls.kv - 1)].reshape(
        Bn, cls.kv - 1, chi, chi
    ) if cls.kv > 1 else jnp.zeros((Bn, 0, chi, chi), M.dtype)

    timeit(
        f"reduce_with u-side (k={cls.ku})",
        lambda A, W: eng._reduce_with(A, W, cls.ku),
        Au, Wu,
    )
    timeit(
        f"reduce_with v-side (k={cls.kv})",
        lambda A, W: eng._reduce_with(A, W, cls.kv),
        Av, Wv,
    )
    timeit(
        "bp fixed point 2 iters, NO kernel planes",
        lambda T, M: eng._bp_fixed_point(T, M, 2, 1e-5, False),
        T, M,
    )
    Qu, Ru = jax.jit(lambda A, W: eng._reduce_with(A, W, cls.ku))(Au, Wu)
    Qv, Rv = jax.jit(lambda A, W: eng._reduce_with(A, W, cls.kv))(Av, Wv)
    ru, rv = Ru.shape[1], Rv.shape[1]
    print(f"# Qu {Qu.shape} Ru {Ru.shape}")

    # tall-side factorization pieces at the (k=3) benchmark shape: use the
    # v-side of the largest class when that is the degree-3 one
    A3 = Av if cls.kv == 3 else (Au if cls.ku == 3 else None)
    if A3 is not None:
        X = jnp.reshape(
            jnp.transpose(A3, (0, 2, 3, 1, 4)), (Bn, chi * chi, d * chi)
        )
        timeit("  cholesky_qr alone [B, chi^2, d*chi]", cholesky_qr, X)
        G = jnp.einsum("bji,bjk->bik", jnp.conj(X), X)
        timeit("  gram matmul alone", lambda X: jnp.einsum("bji,bjk->bik", jnp.conj(X), X), X)
        timeit("  cholesky [B, d*chi, d*chi]", jnp.linalg.cholesky, G + 1e-3 * jnp.eye(d * chi, dtype=G.dtype))
        L = jax.jit(jnp.linalg.cholesky)(G + 1e-3 * jnp.eye(d * chi, dtype=G.dtype))
        timeit(
            "  trsm big [B, d*chi, chi^2]",
            lambda L, X: jax.scipy.linalg.solve_triangular(
                jnp.conj(L), jnp.swapaxes(X, -1, -2), lower=True
            ),
            L, X,
        )
        eyeb = jnp.broadcast_to(jnp.eye(d * chi, dtype=L.dtype), L.shape)
        timeit(
            "  trsm small [B, d*chi, d*chi]",
            lambda L, E: jax.scipy.linalg.solve_triangular(L, E, lower=True),
            L, eyeb,
        )

    def theta_and_gram(Ru, Rv, gate):
        Ru4 = Ru.reshape(Bn, ru, d, chi)
        Rv4 = Rv.reshape(Bn, rv, d, chi)
        theta = jnp.einsum("Bxda,Byea->Bxdye", Ru4, Rv4)
        theta = jnp.einsum("Bxdye,Bpqde->Bxpyq", theta, gate.astype(M.dtype))
        tm = theta.reshape(Bn, ru * d, rv * d)
        G = jnp.einsum("bik,bjk->bij", tm, jnp.conj(tm))
        return tm, G

    cls_gate = gates_list[grp.classes.index(cls)]
    timeit("theta contraction + gram", theta_and_gram, Ru, Rv, cls_gate)
    tm, Gtheta = jax.jit(theta_and_gram)(Ru, Rv, cls_gate)
    print(f"# theta {tm.shape} gram {Gtheta.shape}")

    timeit("subspace_eigh(chi) of theta gram", lambda G: subspace_eigh(chi)(G), Gtheta)
    n_small = Gtheta.shape[-1]
    if n_small <= 256:
        timeit("full jacobi/default eigh of theta gram", lambda G: default_eigh(n_small)(G), Gtheta)

    w, V, tail = jax.jit(lambda G: subspace_eigh(chi)(G))(Gtheta)
    s = jnp.sqrt(jnp.clip(jnp.real(w[..., ::-1]), 0, None))
    # complex literals can't be created directly on tunneled backends
    Rn = jnp.zeros((Bn, ru, d * chi), dtype=jnp.float32).astype(M.dtype)

    timeit(
        "unreduce u-side (Q @ R_new + ungauge)",
        lambda Q, Rn, Winv: eng._unreduce(Q, Rn, Winv, cls.ku),
        Qu, Rn, Wu,
    )

    A_new = jax.jit(lambda Q, Rn, Winv: eng._unreduce(Q, Rn, Winv, cls.ku))(Qu, Rn, Wu)
    timeit(
        "scatter u-side",
        lambda T, A: eng._scatter_permuted(T, cls.ku, cls.u_pos, cls.slot_u, A),
        T, A_new,
    )


if __name__ == "__main__":
    main()
