"""tnqs — TPU-native tensor-network quantum simulator.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
TensorNetworkQuantumSimulator.jl: belief propagation and boundary-MPS
contraction of tensor networks on near-arbitrary graphs, simple-update
circuit evolution, expectation values, sampling, and gauging.
"""

__version__ = "0.1.0"
