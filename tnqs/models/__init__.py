"""Model builders: circuit layers for the benchmark workloads.

These encapsulate the physical models the reference ships as example scripts
(`/root/reference/examples/*.jl`) so that examples, tests, the compiled
engine, and the benchmark driver all share one definition.
"""

from .ising import (
    heavy_hex_kicked_ising_layer,
    operator_picture_layer,
    tfim_layer,
)
from .heisenberg import (
    heisenberg_imaginary_time_gates,
    heisenberg_thermal_layer,
    htse_free_energy_density_4th,
)

__all__ = [
    "tfim_layer",
    "heavy_hex_kicked_ising_layer",
    "operator_picture_layer",
    "heisenberg_imaginary_time_gates",
    "heisenberg_thermal_layer",
    "htse_free_energy_density_4th",
]
