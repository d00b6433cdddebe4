"""Heisenberg-picture operator dynamics: evolve Z(t) under kicked-Ising
dynamics on a 4x4 grid and trace against the initial operator.

Mirrors `/root/reference/examples/2dIsing_dynamics_Heisenbergpicture.jl`:
the operator is a two-legged TensorNetworkState (ket leg + bra leg); the ket
leg gets U-dagger (angle negated) and the bra leg gets U so O -> U' O U.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import os
import time

import numpy as np

import tnqs
from tnqs.gates import op

FAST = bool(os.environ.get("TNQS_EXAMPLE_FAST"))


def main():
    nx = ny = 3 if FAST else 4
    g = tnqs.named_grid((nx, ny))
    vz = tnqs.center(g)[0]
    s = tnqs.siteinds("S=1/2", g, inds_per_site=2)
    psi_I = tnqs.identity_tensornetworkstate(g, s, dtype=np.complex128)
    psi0 = psi_I.copy()
    psi0.set_preserve(vz, (psi0[vz] * psi0._adapt_like(op("Z", s[vz][0]))).noprime())

    apply_kwargs = dict(maxdim=4, cutoff=1.0e-14, normalize_tensors=False)
    psi0 = tnqs.normalize(psi0, alg="bp")
    psi = psi0.copy()
    bpc = tnqs.BeliefPropagationCache(psi)

    h, J = -1.0, -1.0
    steps = 3 if FAST else 10
    dt = 0.04

    layer = []
    layer += [op("Rz", s[v][0], -h * dt) * op("Rz", s[v][1], h * dt) for v in g.vertices()]
    for group in tnqs.edge_color(g, 4):
        for (u, v) in group:
            # qiskit Rxx(theta) = exp(-i theta XX / 2); the ITensors-phi
            # convention in the reference is phi = theta / 2
            layer.append(
                op("Rxx", [s[u][0], s[v][0]], -2 * J * dt) * op("Rxx", [s[u][1], s[v][1]], 2 * J * dt)
            )
    layer += [op("Rz", s[v][0], -h * dt) * op("Rz", s[v][1], h * dt) for v in g.vertices()]

    print(f"Initial bond dimension of the Heisenberg operator: {psi.maxvirtualdim()}")
    for l in range(1, steps + 1):
        t0 = time.time()
        bpc, errors = tnqs.apply_gates(layer, bpc, apply_kwargs=apply_kwargs)
        bpc.rescale_()
        z = bpc.partitionfunction()
        psi_t = bpc.network
        tr_t = tnqs.inner(psi_t, psi_I, alg="bp")
        tr_t0 = tnqs.inner(psi_t, psi0, alg="bp")
        print(f"Layer {l}: {time.time() - t0:.2f}s chi={psi_t.maxvirtualdim()}")
        print(f"    Frobenius norm {np.real(z):.6f}")
        print(f"    Tr(O(t)) = {tr_t:.6f}  Tr(O(t)O(0)) = {tr_t0:.6f}")
        print(f"    max gate error {np.max(errors):.2e}")


if __name__ == "__main__":
    main()
