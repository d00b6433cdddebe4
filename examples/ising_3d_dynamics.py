"""3D periodic cubic-lattice Ising dynamics with BP expectation values.

Mirrors `/root/reference/examples/3dIsing_dynamics.jl`.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import os
import time

import numpy as np

import tnqs

FAST = bool(os.environ.get("TNQS_EXAMPLE_FAST"))


def main():
    n = 3
    g = tnqs.named_grid((n, n, n), periodic=True)
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)
    apply_kwargs = dict(maxdim=2 if FAST else 4, cutoff=1.0e-10, normalize_tensors=True)
    bpc = tnqs.BeliefPropagationCache(psi)
    h, J = -1.0, -1.0
    steps = 2 if FAST else 25
    dt = 0.04

    layer = [("Rz", [v], h * dt) for v in g.vertices()]
    for group in tnqs.edge_color(g, 7):
        layer += [("Rxx", list(pair), 2 * J * dt) for pair in group]
    layer += [("Rz", [v], h * dt) for v in g.vertices()]

    v_measure = tnqs.center(g)[0]
    obs = [("Z", [v_measure])]
    print(f"Initial bond dimension {bpc.network.maxvirtualdim()}")
    print(f"Initial <Z> = {np.real(tnqs.expect(bpc, obs)[0]):.6f}")
    for l in range(1, steps + 1):
        t0 = time.time()
        bpc, errors = tnqs.apply_gates(layer, bpc, apply_kwargs=apply_kwargs)
        z = np.real(tnqs.expect(bpc, obs)[0])
        print(
            f"Layer {l}: {time.time() - t0:.2f}s chi={bpc.network.maxvirtualdim()} "
            f"max_err={np.max(errors):.2e} <Z>={z:.6f}"
        )


if __name__ == "__main__":
    main()
