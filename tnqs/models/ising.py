"""Transverse-field / kicked Ising circuit layers.

Workloads from the reference examples: the 5x5 TFIM quickstart
(`/root/reference/README.md:32-58`), 2D/3D Ising Trotter dynamics
(`examples/2dIsing_dynamics.jl`, `examples/3dIsing_dynamics.jl`) and the
heavy-hex kicked-Ising dynamics (`examples/heavyhexIsing_dynamics.jl`).
"""

from __future__ import annotations

import numpy as np

from ..graphs import NamedGraph, edge_color


def tfim_layer(g: NamedGraph, J: float, hx: float, dt: float, hz: float = 0.0) -> list:
    """One first-order Trotter layer of the transverse-field Ising model:
    single-site Rx (and optionally Rz) rotations followed by edge-colored
    Rzz groups."""
    layer = [("Rx", [v], 2 * hx * dt) for v in g.vertices()]
    if hz != 0.0:
        layer += [("Rz", [v], 2 * hz * dt) for v in g.vertices()]
    for group in edge_color(g):
        layer += [("Rzz", list(pair), 2 * J * dt) for pair in group]
    return layer


def heavy_hex_kicked_ising_layer(g: NamedGraph, J: float, theta_h: float) -> list:
    """One layer of the kicked-Ising dynamics on the heavy-hex lattice
    (Tindall et al., PRX Quantum 5, 010308 (2024);
    reference `examples/heavyhexIsing_dynamics.jl:16-22`)."""
    layer = [("Rx", [v], theta_h) for v in g.vertices()]
    for group in edge_color(g):
        layer += [("Rzz", list(pair), 2 * J) for pair in group]
    return layer


def operator_picture_layer(layer: list, d0: int = 2) -> list:
    """Fold a state-evolution circuit layer into a Heisenberg-picture layer
    acting on operator sites (two legs folded into one axis of dim d0^2).

    For each gate U(theta) in `layer`, the operator update O -> U' O U
    applies A = U-dagger = U(-theta) on the ket legs and B = conj(A) on the
    bra legs (right-multiplication O U contracts the bra leg with U^T =
    conj(U-dagger); for diagonal/symmetric gates this reduces to the
    reference example's +theta convention,
    `examples/2dIsing_dynamics_Heisenbergpicture.jl:24-38`).  The folded
    single-axis gate interleaves the (ket, bra) leg pairs of each vertex.
    Returns a circuit of raw-matrix gates consumable by `LatticeEngine`
    (and by the flex tier via `tnqs.gates.op` on folded site indices).
    """
    from ..gates import gate_matrix

    out = []
    for gate in layer:
        name, verts = gate[0], list(gate[1])
        theta = gate[2] if len(gate) > 2 else None
        if theta is not None:
            A = gate_matrix(name, -theta)
        else:
            A = np.conj(gate_matrix(name, None)).T
        B = np.conj(A)
        if len(verts) == 1:
            # folded index (ket, bra): G[(p q),(s t)] = A[p,s] * B[q,t]
            G = np.kron(A, B)
        elif len(verts) == 2:
            A4 = A.reshape(d0, d0, d0, d0)  # [pu, pv, su, sv]
            B4 = B.reshape(d0, d0, d0, d0)  # [qu, qv, tu, tv]
            G = np.einsum("PpSs,QqTt->PQpqSTst", A4, B4).reshape(
                d0 * d0 * d0 * d0, d0 * d0 * d0 * d0
            )
        else:
            raise ValueError("operator_picture_layer supports 1/2-site gates")
        out.append((G, verts))
    return out
