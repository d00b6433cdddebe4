"""2D transverse-field Ising Trotter dynamics on a square lattice.

Mirrors `/root/reference/examples/2dIsing_dynamics.jl`: evolve the all-up
state with Rx/Rz/Rzz layers under simple update, measuring <Z> at the center
with both BP and boundary MPS.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import os
import time

import numpy as np

import tnqs
from tnqs.models import tfim_layer

FAST = bool(os.environ.get("TNQS_EXAMPLE_FAST"))


def main():
    nx = ny = 3 if FAST else 5
    g = tnqs.named_grid((nx, ny))
    dt, hx, hz, J = 0.25, 1.0, 0.8, 0.5
    layer = [("Rx", [v], 2 * hx * dt) for v in g.vertices()]
    layer += [("Rz", [v], 2 * hz * dt) for v in g.vertices()]
    for group in tnqs.edge_color(g, 4):
        layer += [("Rzz", list(pair), 2 * J * dt) for pair in group]

    obs = ("Z", [(nx // 2 + 1, ny // 2 + 1)])
    nl = 3 if FAST else 20
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)
    apply_kwargs = dict(maxdim=5, cutoff=1.0e-10, normalize_tensors=False)
    bpc = tnqs.BeliefPropagationCache(psi)
    mps_bond_dimension = 4

    for l in range(1, nl + 1):
        t0 = time.time()
        bpc, errors = tnqs.apply_gates(layer, bpc, apply_kwargs=apply_kwargs)
        sz_bp = tnqs.expect(bpc, obs)
        sz_bmps = tnqs.expect(bpc.network, obs, alg="boundarymps", mps_bond_dimension=mps_bond_dimension)
        print(f"Layer {l}: {time.time() - t0:.2f}s  chi={bpc.network.maxvirtualdim()}")
        print(f"    max gate error {np.max(errors):.3e}")
        print(f"    BP <Z> = {np.real(sz_bp):.6f}   BMPS <Z> = {np.real(sz_bmps):.6f}")


if __name__ == "__main__":
    main()
