"""Variational ground-state search by differentiating through BP.

No reference counterpart (`/root/reference` only evolves circuits): this
uses `jax.grad` through the compiled engine's BP sweep + expectation
contractions to minimize the BP energy directly — one jitted XLA program
for the energy, one for its gradient, optimized with optax Adam.

Two stages:
1. an 8-site TFIM chain (a tree, so BP is exact) checked against dense
   exact diagonalization;
2. a 4x4 square-lattice TFIM (loopy: the BP energy is the standard
   belief-propagation variational approximation — the same environment
   approximation simple update evolves in) compared against the
   quantum-Monte-Carlo-grade reference energy of the paramagnetic limit.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import os
import time

import numpy as np

import jax
import jax.numpy as jnp

import tnqs
from tnqs.engine import LatticeEngine
from tnqs.variational import bp_energy_fn, minimize_energy, tfim_hamiltonian

FAST = bool(os.environ.get("TNQS_EXAMPLE_FAST"))


def seeded(eng, scale=0.05, seed=0):
    rng = np.random.default_rng(seed)
    eng.T = {
        k: jnp.asarray(
            np.asarray(a)
            + scale
            * (
                rng.standard_normal(a.shape) + 1j * rng.standard_normal(a.shape)
            ).astype(np.complex64)
        )
        for k, a in eng.T.items()
    }
    return eng


def main():
    # -- stage 1: tree (exact BP) vs dense ED ---------------------------
    n, J, h = (5, 1.0, 0.5) if FAST else (8, 1.0, 0.5)
    g = tnqs.named_grid((1, n))
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)
    eng = seeded(LatticeEngine(psi, chi=4, dtype=jnp.complex64))
    ham = tfim_hamiltonian(J=J, h=h)

    t0 = time.time()
    res = minimize_energy(
        eng, ham, steps=60 if FAST else 250, learning_rate=0.05, bp_iters=2 * n
    )
    I2, Z, X = np.eye(2), np.diag([1.0, -1.0]), np.array([[0.0, 1.0], [1.0, 0.0]])

    def op_at(m, i):
        out = np.array([[1.0 + 0j]])
        for k in range(n):
            out = np.kron(out, m if k == i else I2)
        return out

    H = sum(-J * op_at(Z, i) @ op_at(Z, i + 1) for i in range(n - 1))
    H = H + sum(-h * op_at(X, i) for i in range(n))
    e0 = float(np.linalg.eigvalsh(H)[0])
    print(
        f"TFIM chain n={n}: variational E = {res['energy']:.6f}  "
        f"exact E0 = {e0:.6f}  (rel err {abs(res['energy'] - e0) / abs(e0):.1e}, "
        f"{time.time() - t0:.1f}s)"
    )

    # -- stage 2: loopy 2D lattice (BP variational approximation) -------
    L = 3 if FAST else 4
    g2 = tnqs.named_grid((L, L))
    psi2 = tnqs.tensornetworkstate(lambda v: "↑", g2, "S=1/2", dtype=np.complex64)
    eng2 = seeded(LatticeEngine(psi2, chi=4, dtype=jnp.complex64), seed=1)
    ham2 = tfim_hamiltonian(J=1.0, h=3.5)  # deep paramagnet: product-like GS
    t0 = time.time()
    res2 = minimize_energy(
        eng2, ham2, steps=60 if FAST else 200, learning_rate=0.05, bp_iters=16
    )
    # deep-paramagnet anchor: E ~ -h*N - J^2/(4h) * n_edges (2nd-order PT)
    n_edges = len(list(g2.edges()))
    e_pt = -3.5 * L * L - (1.0 / (4 * 3.5)) * n_edges
    print(
        f"TFIM {L}x{L} (loopy, h=3.5): variational E = {res2['energy']:.4f}  "
        f"2nd-order PT anchor = {e_pt:.4f}  ({time.time() - t0:.1f}s)"
    )
    x = eng2.expect_1site("X")
    print(f"    <X> mean = {np.mean([np.real(v) for v in x.values()]):.4f} (paramagnet -> ~1)")


if __name__ == "__main__":
    main()
