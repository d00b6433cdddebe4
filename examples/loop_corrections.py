"""Loop-corrected BP norms vs exact on line / hexagonal / square lattices.

Mirrors `/root/reference/examples/loopcorrections.jl`.
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
    nx, ny = (3, 3) if FAST else (4, 4)
    chi = 3
    graphs = [
        (tnqs.named_grid((nx, 1)), "line", 0),
        (tnqs.named_hexagonal_lattice_graph(2 if FAST else nx, 2 if FAST else ny), "hexagonal", 6),
        (tnqs.named_grid((nx, ny)), "square", 4),
    ]
    for g, name, smallest_loop in graphs:
        print(f"Testing {name} lattice with {g.nv()} vertices")
        psi = tnqs.random_tensornetworkstate(g, "S=1/2", bond_dimension=chi, dtype=np.complex64, rng=rng)
        psi = tnqs.normalize(psi, alg="bp")
        norm_bp = tnqs.norm(psi, alg="bp")
        max_cfg = max(2 * smallest_loop - 1, 0)
        if FAST:
            max_cfg = min(max_cfg, smallest_loop)
        norm_lc = tnqs.norm(psi, alg="loopcorrections", max_configuration_size=max_cfg)
        norm_exact = tnqs.norm(psi, alg="exact")
        print(f"  BP norm:              {np.real(norm_bp):.10f}")
        print(f"  loop-corrected norm:  {np.real(norm_lc):.10f}")
        print(f"  exact norm:           {np.real(norm_exact):.10f}")


if __name__ == "__main__":
    main()
