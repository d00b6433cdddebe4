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
