"""Heisenberg-model imaginary-time evolution (thermal states).

Reference: `examples/hexagonal_heisenbergmodel_thermalstate.jl` — the thermal
state exp(-beta H)/Z is prepared as a square-root (purified operator state)
evolved in imaginary time with `Rxxyyzz` gates at imaginary angle, starting
from the identity operator state.
"""

from __future__ import annotations

from math import log

from ..gates import op
from ..graphs import NamedGraph, edge_color


def heisenberg_imaginary_time_gates(g: NamedGraph, site_inds: dict, J: float, dbeta: float) -> list:
    """One imaginary-time Trotter layer of gate tensors acting on the ket leg
    of a two-legged operator state (reference
    `hexagonal_heisenbergmodel_thermalstate.jl:17-22`)."""
    gates = []
    for group in edge_color(g):
        for (u, v) in group:
            gates.append(op("Rxxyyzz", [site_inds[u][0], site_inds[v][0]], -0.5j * J * dbeta))
    return gates


def heisenberg_thermal_layer(g: NamedGraph, J: float, dbeta: float, d0: int = 2) -> list:
    """The same imaginary-time Trotter layer FOLDED for the compiled
    engine's operator sites (two site legs folded into one axis of dim
    d0^2, ket/bra interleaved per vertex like
    `tnqs.models.operator_picture_layer`).

    Each `Rxxyyzz(-i J dbeta / 2)` gate acts on the KET legs of the
    purified operator state, identity on the bra legs.  Returns a circuit
    of raw-matrix gates consumable by `LatticeEngine` on an
    `identity_tensornetworkstate` with `inds_per_site=2`."""
    import numpy as np

    from ..gates import gate_matrix

    U = gate_matrix("Rxxyyzz", -0.5j * J * dbeta)
    A4 = U.reshape(d0, d0, d0, d0)  # [out_u, out_v, in_u, in_v] (ket legs)
    I2 = np.eye(d0)
    G = np.einsum("PpSs,QT,qt->PQpqSTst", A4, I2, I2).reshape(
        (d0 * d0) ** 2, (d0 * d0) ** 2
    )
    out = []
    for group in edge_color(g):
        for e in group:
            out.append((G, list(e)))
    return out


def htse_free_energy_density_4th(J: float, beta: float) -> float:
    """4th-order high-temperature series expansion of the hexagonal-lattice
    Heisenberg free-energy density (reference
    `hexagonal_heisenbergmodel_thermalstate.jl:36`)."""
    return (
        -log(2)
        - (9 / 64) * J * J * beta * beta
        - (3 / 128) * J**3 * beta**3
        + (27 / 2048) * J**4 * beta**4
    )
