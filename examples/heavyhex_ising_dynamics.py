"""Heavy-hex kicked-Ising dynamics with boundary-MPS expectation values and
certified sampling (the 127-qubit-class benchmark workload).

Mirrors `/root/reference/examples/heavyhexIsing_dynamics.jl` (Tindall et al.,
PRX Quantum 5, 010308 (2024)).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import os
import time

import numpy as np

import tnqs
from tnqs.models import heavy_hex_kicked_ising_layer

FAST = bool(os.environ.get("TNQS_EXAMPLE_FAST"))


def main():
    g = tnqs.heavy_hexagonal_lattice(2, 2) if FAST else tnqs.heavy_hexagonal_lattice(5, 5)
    print(f"heavy-hex lattice with {g.nv()} qubits")
    J, theta_h = np.pi / 4, 0.4
    layer = heavy_hex_kicked_ising_layer(g, J, theta_h)
    steps = 2 if FAST else 20
    chi = 4 if FAST else 8
    apply_kwargs = dict(cutoff=1.0e-12, maxdim=chi, normalize_tensors=True)
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)
    bpc = tnqs.BeliefPropagationCache(psi)

    fidelities = []
    for i in range(1, steps + 1):
        t0 = time.time()
        bpc, errs = tnqs.apply_gates(layer, bpc, apply_kwargs=apply_kwargs)
        fid = float(np.prod(1.0 - errs))
        fidelities.append(fid)
        print(f"Trotter step {i}: {time.time() - t0:.2f}s, layer fidelity {fid:.6f}")
    total_fid = float(np.prod(fidelities))
    n2q = g.ne() * steps
    print(f"Total fidelity {total_fid:.6f}, avg gate fidelity {total_fid ** (1 / n2q):.8f}")

    central = (5, 3) if FAST else (11, 5)
    sz_bp = tnqs.expect(bpc, [("Z", [central])])
    print(f"BP <Z> at {central}: {np.real(sz_bp[0]):.6f}")

    mps_bond_dimension = 4 if FAST else 10
    psi_t = bpc.network
    sz_bmps = tnqs.expect(psi_t, [("Z", [central])], alg="boundarymps", mps_bond_dimension=mps_bond_dimension)
    print(f"Boundary-MPS <Z> at {central}: {np.real(sz_bmps[0]):.6f}")

    nsamples = 5 if FAST else 50
    rng = np.random.default_rng(0)
    certified = tnqs.sample_directly_certified(
        psi_t, nsamples, alg="boundarymps", norm_mps_bond_dimension=mps_bond_dimension, rng=rng
    )
    pq = np.array([c["poverq"] for c in certified])
    print(f"std(p/q) over {nsamples} samples: {pq.std():.3e}")
    sampled_sz = sum(c["poverq"] * (-2 * c["bitstring"][central] + 1) for c in certified) / pq.sum()
    print(f"Importance-sampled <Z> at {central}: {sampled_sz:.6f}")


if __name__ == "__main__":
    main()
