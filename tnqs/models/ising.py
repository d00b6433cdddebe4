"""Transverse-field / kicked Ising circuit layers.

Workloads from the reference examples: the 5x5 TFIM quickstart
(`/root/reference/README.md:32-58`), 2D/3D Ising Trotter dynamics
(`examples/2dIsing_dynamics.jl`, `examples/3dIsing_dynamics.jl`) and the
heavy-hex kicked-Ising dynamics (`examples/heavyhexIsing_dynamics.jl`).
"""

from __future__ import annotations

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
