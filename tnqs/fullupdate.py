"""Full update: variational gate application against arbitrary environments.

Reference: `/root/reference/src/Apply/full_update.jl`.  The two site tensors
are QR-reduced, and the reduced tensors are optimized by ALS sweeps solving
the normal equations (the reference uses KrylovKit.linsolve; here small
systems are solved densely and large ones by GMRES).  Used by boundary-MPS
truncation (`truncate.jl:55`).
"""

from __future__ import annotations

import numpy as np
from .contraction import contract, contraction_sequence
from .core.linalg import factorize, factorize_svd
from .core.tensor import Tensor, commoninds, uniqueinds

def _solve(
    tensors_fixed,
    b: Tensor,
    x0: Tensor,
    tol: float = 1e-10,
    maxiter: int = 200,
) -> Tensor:
    """Solve M x = b where M is the linear map x -> noprime(contract(fixed, x)).

    Matrix-free Krylov solve mirroring the reference's `KrylovKit.linsolve`
    (`/root/reference/src/Apply/full_update.jl:137-151`): the map is applied
    by contracting the fixed network against the candidate tensor (sequence
    planned once), never densified — the dense normal-equation matrix would
    be O((chi^2 d)^3) and wall at the chi=64 scale the BMPS truncation path
    serves.  BiCGSTAB handles the mildly non-hermitian environments BP
    messages can produce; tiny or non-converged systems fall back to an
    explicit least-squares solve (min-norm on singular environments).
    """
    inds = list(x0.inds)
    dims = [i.dim for i in inds]
    n = int(np.prod(dims))

    x_probe = x0.sim_inds_like(x0) if hasattr(x0, "sim_inds_like") else x0
    seq = contraction_sequence(list(tensors_fixed) + [x_probe], alg="greedy")

    def apply_M(vec: np.ndarray) -> np.ndarray:
        xt = Tensor(vec.reshape(dims), inds)
        out = contract(list(tensors_fixed) + [xt], sequence=seq).noprime()
        return np.asarray(out.permute(inds).data).reshape(-1)

    def dense_solve() -> Tensor:
        E = contract(tensors_fixed, sequence=contraction_sequence(tensors_fixed, alg="greedy"))
        e_cols = [i for i in inds if E.hasind(i)]
        id_inds = [i for i in inds if not E.hasind(i)]
        e_rows = [i.prime() for i in e_cols]
        if not all(E.hasind(r) for r in e_rows) or E.ndim != 2 * len(e_cols):
            raise ValueError("full update: unexpected environment index structure")
        Emat = np.asarray(E.matricize(e_rows, e_cols))
        d_id = int(np.prod([i.dim for i in id_inds])) if id_inds else 1
        Mmat = np.kron(Emat, np.eye(d_id))
        order = e_cols + id_inds
        b_arr = np.asarray(b.permute(order).data).reshape(-1)
        sol, *_ = np.linalg.lstsq(Mmat, b_arr, rcond=None)
        return Tensor(sol.reshape([i.dim for i in order]), order).permute(inds)

    if n <= 256:
        # small systems: the exact min-norm solve is cheaper than iterating
        return dense_solve()

    b_arr = np.asarray(b.permute(inds).data).reshape(-1)
    x = np.asarray(x0.permute(inds).data).reshape(-1).astype(b_arr.dtype, copy=True)
    bnorm = np.linalg.norm(b_arr)
    if bnorm == 0:
        return Tensor(np.zeros_like(b_arr).reshape(dims), inds)

    # BiCGSTAB (templates version), complex-safe
    r = b_arr - apply_M(x)
    r_hat = r.copy()
    rho = alpha = omega = 1.0 + 0.0j
    v = p = np.zeros_like(r)
    converged = False
    for _ in range(maxiter):
        rho_new = np.vdot(r_hat, r)
        if abs(rho_new) < 1e-300:
            break
        beta = (rho_new / rho) * (alpha / omega) if rho != 0 else 0.0
        rho = rho_new
        p = r + beta * (p - omega * v)
        v = apply_M(p)
        denom = np.vdot(r_hat, v)
        if abs(denom) < 1e-300:
            break
        alpha = rho / denom
        s = r - alpha * v
        if np.linalg.norm(s) <= tol * bnorm:
            x = x + alpha * p
            converged = True
            break
        t = apply_M(s)
        tt = np.vdot(t, t)
        if abs(tt) < 1e-300:
            break
        omega = np.vdot(t, s) / tt
        x = x + alpha * p + omega * s
        r = s - omega * t
        if np.linalg.norm(r) <= tol * bnorm:
            converged = True
            break

    if not converged:
        if n <= 4096:
            return dense_solve()
        # too large for the dense fallback: surface stagnation instead of
        # silently returning a degraded iterate (near-singular BP
        # environments can stall BiCGSTAB)
        resid = np.linalg.norm(b_arr - apply_M(x)) / bnorm
        if resid > max(100.0 * tol, 1e-3):
            import warnings

            warnings.warn(
                f"full update: BiCGSTAB stagnated at relative residual "
                f"{resid:.2e} (n={n}, tol={tol:.1e}); the updated tensor may "
                "be degraded — consider raising nfullupdatesweeps or maxiter",
                RuntimeWarning,
                stacklevel=2,
            )
    return Tensor(x.reshape(dims), inds)


def full_update(
    o: Tensor,
    psi,
    vv,
    envs,
    nfullupdatesweeps: int = 10,
    symmetrize: bool = False,
    maxdim: int | None = None,
    cutoff: float | None = None,
    **kwargs,
):
    """Variational 2-site gate application (reference `full_update`,
    `full_update.jl:8-53`).  Returns the two updated site tensors."""
    v1, v2 = vv
    t1, t2 = psi[v1], psi[v2]
    dangling1 = psi.uniqueinds(v1)
    dangling2 = psi.uniqueinds(v2)
    q1_inds = [i for i in uniqueinds(t1, t2) if i not in dangling1]
    q2_inds = [i for i in uniqueinds(t2, t1) if i not in dangling2]
    Q1, R1 = factorize(t1, q1_inds, ortho="left")
    Q2, R2 = factorize(t2, q2_inds, ortho="left")

    extended_envs = list(envs) + [Q1, Q1.prime().dag(), Q2, Q2.prime().dag()]
    R1n, R2n = _optimise_p_q(
        R1, R2, extended_envs, o, nfullupdatesweeps=nfullupdatesweeps, maxdim=maxdim, cutoff=cutoff
    )
    if symmetrize:
        left = [i for i in R1n.inds]
        R1n, R2n, _, _ = factorize_svd(R1n * R2n, left, maxdim=maxdim, cutoff=cutoff, ortho="none")
    return Q1 * R1n, Q2 * R2n


def _optimise_p_q(p, q, envs, o, nfullupdatesweeps=10, maxdim=None, cutoff=None):
    """ALS optimization of the reduced tensors (reference `optimise_p_q`,
    `full_update.jl:103-165`)."""
    oR = (o * (p * q)).noprime()
    keep = [i for i in p.inds if oR.hasind(i)]
    p_cur, q_cur = factorize(oR, keep, ortho="left", maxdim=maxdim, cutoff=cutoff)

    env_inds = set()
    for e in envs:
        env_inds.update(e.inds)
    qs_ind = [i for i in q_cur.inds if i not in env_inds and not p_cur.hasind(i)]
    ps_ind = [i for i in p_cur.inds if i not in env_inds and not q_cur.hasind(i)]

    def b_vec(r):
        ts = [p, q, o, r.prime().dag()] + envs
        seq = contraction_sequence(ts, alg="greedy")
        return contract(ts, sequence=seq).noprime()

    def m_fixed(pq_tensor, s_ind):
        bra = pq_tensor.prime().dag().replaceinds(
            [i.prime() for i in s_ind], list(s_ind)
        )
        return [pq_tensor, bra] + envs

    for _ in range(nfullupdatesweeps):
        b1 = b_vec(q_cur)
        p_cur = _solve(m_fixed(q_cur, qs_ind), b1, p_cur)
        b2 = b_vec(p_cur)
        q_cur = _solve(m_fixed(p_cur, ps_ind), b2, q_cur)
    return p_cur, q_cur


def fidelity(envs, p_cur, q_cur, p_prev, q_prev, gate) -> float:
    """Squared overlap cost of the full-update optimization
    (reference `fidelity`, `full_update.jl:56-98`)."""
    p_sind = commoninds(p_cur, gate)[0]
    q_sind = commoninds(q_cur, gate)[0]
    p_sim, q_sim = p_sind.sim(), q_sind.sim()
    gate_sq = gate * gate.dag().replaceinds([p_sind, q_sind], [p_sim, q_sim])
    t1 = [
        p_prev,
        q_prev,
        p_prev.prime().dag().replaceind(p_sind.prime(), p_sim),
        q_prev.prime().dag().replaceind(q_sind.prime(), q_sim),
        gate_sq,
    ] + list(envs)
    term1 = contract(t1, sequence=contraction_sequence(t1, alg="optimal")).item()
    t2 = [
        p_cur,
        q_cur,
        p_cur.prime().dag().replaceind(p_sind.prime(), p_sind),
        q_cur.prime().dag().replaceind(q_sind.prime(), q_sind),
    ] + list(envs)
    term2 = contract(t2, sequence=contraction_sequence(t2, alg="optimal")).item()
    t3 = [p_prev, q_prev, p_cur.prime().dag(), q_cur.prime().dag(), gate] + list(envs)
    term3 = contract(t3, sequence=contraction_sequence(t3, alg="optimal")).item()
    f = term3 / np.sqrt(term1 * term2)
    return abs(f) ** 2
