"""Boundary-MPS convergence to exact with increasing MPS rank.

Mirrors `/root/reference/examples/boundarymps.jl`.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import os

import numpy as np

import tnqs

FAST = bool(os.environ.get("TNQS_EXAMPLE_FAST"))


def main():
    rng = np.random.default_rng(1634)
    nx, ny = (4, 4) if FAST else (5, 5)
    chi = 2
    graphs = [
        (tnqs.named_grid((nx, 1)), "line"),
        (tnqs.named_hexagonal_lattice_graph(nx - 2, ny - 2), "hexagonal"),
        (tnqs.named_grid((nx, ny)), "square"),
    ]
    ranks = [1, 2, 4, 8] if FAST else [1, 2, 4, 8, 16, 32]
    for g, name in graphs:
        print(f"Testing {name} lattice with {g.nv()} vertices")
        psi = tnqs.random_tensornetworkstate(g, "S=1/2", bond_dimension=chi, dtype=np.complex64, rng=rng)
        v = tnqs.center(g)[0]
        print(f"  BP <Z> = {tnqs.expect(psi, ('Z', v), alg='bp'):.8f}")
        for r in ranks:
            val = tnqs.expect(psi, ("Z", v), alg="boundarymps", mps_bond_dimension=r)
            print(f"  BMPS rank {r:3d}: <Z> = {val:.8f}")
        print(f"  exact: <Z> = {tnqs.expect(psi, ('Z', v), alg='exact'):.8f}")
        if not tnqs.is_tree(g):
            u = g.neighbors(v)[0]
            obs = ("ZZ", [v, u])
            print(f"  BP <ZZ> = {tnqs.expect(psi, obs, alg='bp'):.8f}")
            for r in ranks:
                try:
                    val = tnqs.expect(psi, obs, alg="boundarymps", mps_bond_dimension=r)
                except ValueError:
                    continue  # misaligned pair for this partitioning
                print(f"  BMPS rank {r:3d}: <ZZ> = {val:.8f}")
            print(f"  exact: <ZZ> = {tnqs.expect(psi, obs, alg='exact'):.8f}")


if __name__ == "__main__":
    main()
