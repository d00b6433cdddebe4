"""Differentiable variational ground-state search (`tnqs.variational`).

Oracles: analytic product-state energies, dense exact diagonalization
(statevector built from explicit Pauli matrices, independent of the TN
machinery), and finite differences for the gradient itself.  On trees BP
expectations are exact, so the BP variational energy IS the Rayleigh
quotient and must reach the true ground energy at sufficient chi.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import tnqs
from tnqs.engine import LatticeEngine
from tnqs.variational import (
    bp_energy_fn,
    heisenberg_hamiltonian,
    minimize_energy,
    tfim_hamiltonian,
)

I2 = np.eye(2)
Z = np.diag([1.0, -1.0])
X = np.array([[0.0, 1.0], [1.0, 0.0]])
Y = np.array([[0.0, -1.0j], [1.0j, 0.0]])


def _op_at(m, i, n):
    out = np.array([[1.0 + 0j]])
    for k in range(n):
        out = np.kron(out, m if k == i else I2)
    return out


def _line_engine(n, chi, seed=0, noise=0.05):
    g = tnqs.named_grid((1, n))
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)
    eng = LatticeEngine(psi, chi=chi, dtype=jnp.complex64)
    if noise:
        rng = np.random.default_rng(seed)
        eng.T = {
            k: jnp.asarray(
                np.asarray(a)
                + noise
                * (
                    rng.standard_normal(a.shape)
                    + 1j * rng.standard_normal(a.shape)
                ).astype(np.complex64)
            )
            for k, a in eng.T.items()
        }
    return eng


def test_bp_energy_product_state_analytic():
    """|↑...↑> under TFIM: <ZZ> = 1 per edge, <X> = 0 per site, so
    E = -J * n_edges exactly (messages from deltas, no optimization)."""
    n, J, h = 6, 0.8, 0.37
    eng = _line_engine(n, chi=4, noise=0.0)
    efn = bp_energy_fn(eng, tfim_hamiltonian(J=J, h=h), bp_iters=12)
    e = float(efn(eng.T))
    assert abs(e - (-J * (n - 1))) < 1e-4


def test_bp_energy_gradient_matches_finite_difference():
    """jax.grad of the BP energy vs central differences on a few real and
    imaginary coordinates (3-site line, chi=2, c64 => ~1e-2 FD accuracy)."""
    eng = _line_engine(3, chi=2, seed=1, noise=0.2)
    efn = bp_energy_fn(eng, tfim_hamiltonian(J=1.0, h=0.7), bp_iters=10)

    def split(T):
        return {k: (jnp.real(a), jnp.imag(a)) for k, a in T.items()}

    def loss(params):
        T = {
            k: jax.lax.complex(re, im).astype(jnp.complex64)
            for k, (re, im) in params.items()
        }
        return efn(T)

    params = split(eng.T)
    g = jax.jit(jax.grad(loss))(params)
    eps = 1e-2
    rng = np.random.default_rng(2)
    for k in params:
        for part in (0, 1):
            arr = np.asarray(params[k][part])
            idx = tuple(rng.integers(0, s) for s in arr.shape)
            for sign in (+1, -1):
                pert = dict(params)
                a = arr.copy()
                a[idx] += sign * eps
                pair = list(pert[k])
                pair[part] = jnp.asarray(a)
                pert[k] = tuple(pair)
                if sign > 0:
                    ep = float(loss(pert))
                else:
                    em = float(loss(pert))
            fd = (ep - em) / (2 * eps)
            ad = float(np.asarray(g[k][part])[idx])
            assert abs(fd - ad) < 5e-2 * max(1.0, abs(fd)), (k, part, fd, ad)


def test_variational_tfim_line_reaches_exact_ground_energy():
    """6-site open TFIM chain (J=1, h=0.5): minimized BP energy vs dense
    ED.  The line is a tree, so the BP energy is the exact Rayleigh
    quotient — the optimum must sit on/above E0 and converge to it."""
    n, J, h = 6, 1.0, 0.5
    eng = _line_engine(n, chi=4, seed=0)
    ham = tfim_hamiltonian(J=J, h=h)
    e_init = float(bp_energy_fn(eng, ham, bp_iters=14)(eng.T))
    res = minimize_energy(eng, ham, steps=150, learning_rate=0.05, bp_iters=14)

    H = sum(-J * _op_at(Z, i, n) @ _op_at(Z, i + 1, n) for i in range(n - 1))
    H = H + sum(-h * _op_at(X, i, n) for i in range(n))
    e0 = float(np.linalg.eigvalsh(H)[0])

    assert res["energy"] < e_init  # it optimized
    assert res["energy"] > e0 - 5e-3  # variational bound (tree => exact BP)
    assert abs(res["energy"] - e0) / abs(e0) < 5e-3
    # the engine was updated in place: its own expectation agrees
    zz = eng.expect_2site("Z", "Z")
    xs = eng.expect_1site("X")
    e_eng = -J * sum(np.real(v) for v in zz.values()) - h * sum(
        np.real(v) for v in xs.values()
    )
    assert abs(e_eng - res["energy"]) < 1e-3


def test_variational_heisenberg_line_reaches_exact_ground_energy():
    """4-site spin-1/2 Heisenberg chain vs dense ED (singlet formation
    requires genuinely complex entangled tensors — exercises the XX/YY
    terms and the complex parameterization)."""
    n, J = 4, 1.0
    eng = _line_engine(n, chi=4, seed=3, noise=0.15)
    ham = heisenberg_hamiltonian(J=J)
    res = minimize_energy(eng, ham, steps=250, learning_rate=0.05, bp_iters=12)

    H = np.zeros((2**n, 2**n), dtype=complex)
    for i in range(n - 1):
        for m in (X, Y, Z):
            H += (J / 4.0) * _op_at(m, i, n) @ _op_at(m, i + 1, n)
    e0 = float(np.linalg.eigvalsh(H)[0])

    assert res["energy"] > e0 - 5e-3
    assert abs(res["energy"] - e0) / abs(e0) < 1e-2


def test_inhomogeneous_coefficients():
    """Dict-valued coefficients select vertices/edges (missing keys = 0)."""
    n = 4
    eng = _line_engine(n, chi=2, noise=0.0)
    g = eng.plan.graph
    verts = list(g.vertices())
    edges = list(g.edges())
    ham = tnqs.Hamiltonian(
        fields=(("Z", {verts[0]: 2.0}),),
        bonds=(("Z", "Z", {edges[0]: -3.0}),),
    )
    efn = bp_energy_fn(eng, ham, bp_iters=8)
    # product |↑...↑>: <Z>=1 on the selected vertex, <ZZ>=1 on the edge
    assert abs(float(efn(eng.T)) - (2.0 - 3.0)) < 1e-4


def test_variational_loopy_state_respects_exact_bound():
    """On a loopy 2x3 grid the BP energy is not a strict bound — but the
    EXACT Rayleigh quotient of the optimized state must be, and a good
    optimization should land it near the dense-ED ground energy."""
    J, h = 1.0, 2.0  # paramagnetic side: BP environments are accurate
    g = tnqs.named_grid((2, 3))
    psi0 = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)
    eng = LatticeEngine(psi0, chi=4, dtype=jnp.complex64)
    rng = np.random.default_rng(5)
    eng.T = {
        k: jnp.asarray(
            np.asarray(a)
            + 0.05
            * (
                rng.standard_normal(a.shape) + 1j * rng.standard_normal(a.shape)
            ).astype(np.complex64)
        )
        for k, a in eng.T.items()
    }
    ham = tfim_hamiltonian(J=J, h=h)
    res = minimize_energy(eng, ham, steps=150, learning_rate=0.05, bp_iters=14)

    # exact Rayleigh quotient of the optimized state via flex exact
    # contraction (independent of BP)
    psi = eng.to_state()
    verts = list(g.vertices())
    e_exact = 0.0
    for v in verts:
        e_exact += -h * np.real(complex(tnqs.expect(psi, ("X", [v]), alg="exact")))
    for (u, v) in g.edges():
        e_exact += -J * np.real(
            complex(tnqs.expect(psi, ("ZZ", [u, v]), alg="exact"))
        )

    n = len(verts)
    pos = {v: i for i, v in enumerate(verts)}
    H = sum(-h * _op_at(X, i, n) for i in range(n))
    for (u, v) in g.edges():
        H = H + (-J) * _op_at(Z, pos[u], n) @ _op_at(Z, pos[v], n)
    e0 = float(np.linalg.eigvalsh(H)[0])

    assert e_exact >= e0 - 1e-4          # true variational bound
    assert abs(e_exact - e0) / abs(e0) < 2e-2
    # BP energy and exact quotient should agree well in the paramagnet
    assert abs(res["energy"] - e_exact) / abs(e0) < 2e-2


def test_sharded_energy_and_gradient_match_unsharded():
    """`sharded_bp_energy_fn` (halo-exchange shard_map BP over the
    8-device CPU mesh) must reproduce the single-device energy and its
    jax.grad to f32 eps — same synchronous stage schedule, different
    executors."""
    from tnqs.variational import sharded_bp_energy_fn

    g = tnqs.named_grid((8, 2))  # 16 sites -> 8 bands of 2
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)
    eng = LatticeEngine(psi, chi=2, dtype=jnp.complex64)
    rng = np.random.default_rng(0)
    eng.T = {
        k: jnp.asarray(
            np.asarray(a)
            + 0.1
            * (
                rng.standard_normal(a.shape) + 1j * rng.standard_normal(a.shape)
            ).astype(np.complex64)
        )
        for k, a in eng.T.items()
    }
    ham = tfim_hamiltonian(J=1.0, h=1.3)
    # value_and_grad: one compiled program per executor (not four) — and
    # sharded/unsharded agreement needs only matching iteration counts, so
    # a 10-sweep scan (> the 8x2 grid diameter) keeps the suite budget.
    e_u = bp_energy_fn(eng, ham, bp_iters=10)
    e_s = sharded_bp_energy_fn(eng, ham, n_bands=8, bp_iters=10)

    def mk_loss(efn):
        def loss(p):
            T = {
                k: jax.lax.complex(re, im).astype(jnp.complex64)
                for k, (re, im) in p.items()
            }
            return efn(T)

        return loss

    p = {k: (jnp.real(a), jnp.imag(a)) for k, a in eng.T.items()}
    # jit the whole value_and_grad: unjitted, the backward pass dispatches
    # op-by-op across the 8 virtual devices (~100 s on the 1-core CI host).
    vu, gu = jax.jit(jax.value_and_grad(mk_loss(e_u)))(p)
    vs, gs = jax.jit(jax.value_and_grad(mk_loss(e_s)))(p)
    vu, vs = float(vu), float(vs)
    assert abs(vu - vs) < 1e-4 * max(1.0, abs(vu))
    md = max(
        float(jnp.max(jnp.abs(gu[k][i] - gs[k][i]))) for k in gu for i in (0, 1)
    )
    sc = max(float(jnp.max(jnp.abs(gu[k][i]))) for k in gu for i in (0, 1))
    assert md < 1e-4 * sc, (md, sc)


def test_minimize_energy_on_mesh():
    """minimize_energy(mesh=...) optimizes through the sharded program and
    lands at the same energy as the single-device run."""
    from tnqs.parallel.mesh import make_mesh

    g = tnqs.named_grid((8, 2))
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)

    def fresh():
        eng = LatticeEngine(psi, chi=2, dtype=jnp.complex64)
        rng = np.random.default_rng(7)
        eng.T = {
            k: jnp.asarray(
                np.asarray(a)
                + 0.1
                * (
                    rng.standard_normal(a.shape)
                    + 1j * rng.standard_normal(a.shape)
                ).astype(np.complex64)
            )
            for k, a in eng.T.items()
        }
        return eng

    ham = tfim_hamiltonian(J=1.0, h=1.3)
    r0 = minimize_energy(fresh(), ham, steps=30, learning_rate=0.05, bp_iters=12)
    r1 = minimize_energy(
        fresh(), ham, steps=30, learning_rate=0.05, bp_iters=12, mesh=make_mesh(8)
    )
    assert abs(r0["energy"] - r1["energy"]) < 1e-3 * max(1.0, abs(r0["energy"]))
