"""tnqs — TPU-native tensor-network quantum simulator.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
TensorNetworkQuantumSimulator.jl (`/root/reference`): belief propagation and
boundary-MPS contraction of tensor networks on near-arbitrary graphs,
simple-update circuit evolution, expectation values, entanglement entropies,
gauging, loop corrections, and certified bitstring sampling.

Two tiers:

* the **flex tier** (this package's Python surface): named-index tensors over
  numpy/JAX arrays, dynamically shaped, for arbitrary graphs — the general
  API and the correctness oracle;
* the **compiled tier** (`tnqs.engine`, `tnqs.ops`, `tnqs.parallel`):
  statically-shaped, padded, batched-by-edge-color evolution and BP engines
  that jit onto TPU and shard over device meshes.

The user surface mirrors the reference's exported names
(`/root/reference/src/TensorNetworkQuantumSimulator.jl:38-121`).
"""

__version__ = "0.2.0"

# The reference's default numerics are Float64 (`src/TensorNetworks/*`);
# enable 64-bit in JAX so dtype-parametric code behaves identically.
# Explicit float32/complex64 arrays are unaffected.  Opt out with TNQS_NO_X64.
import os as _os

if not _os.environ.get("TNQS_NO_X64"):
    import jax as _jax

    _jax.config.update("jax_enable_x64", True)

# TPU matmuls default to single-pass bf16, which is catastrophic for
# gauging / Gram factorizations (1e-2 relative errors, NaNs in Cholesky).
# Physics needs f32-accurate accumulation.  TNQS_MATMUL_PRECISION selects
# the policy: "highest" (exact f32), "high" (bf16_3x, ~1e-6 relative,
# faster), or "default" (raw bf16 — benchmarking only).
_prec = _os.environ.get("TNQS_MATMUL_PRECISION", "highest")
if _prec != "default":
    import jax as _jax

    _jax.config.update("jax_default_matmul_precision", _prec)

# Persistent XLA compilation cache.  Remote (tunneled-TPU) compiles carry a
# very large fixed per-program cost (~165 s was measured for a toy 4-matmul
# program; the Eagle-127 engine step is 100-560 s), and the big engine /
# boundary-MPS programs recompile identically in every process.  Caching
# serialized executables on disk turns every repeat invocation — benchmark
# runs, driver entry points, test re-runs — into a ~0 s cache hit.
# Override the location with TNQS_COMPILE_CACHE; set it empty to disable.
_cache_dir = _os.environ.get(
    "TNQS_COMPILE_CACHE",
    _os.path.join(_os.path.expanduser("~"), ".cache", "tnqs", "xla"),
)
if _cache_dir:
    import jax as _jax

    try:
        if not _jax.config.jax_compilation_cache_dir:
            _jax.config.update("jax_compilation_cache_dir", _cache_dir)
            _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
            _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except AttributeError:  # older jax without the persistent cache
        pass

# The deployment environment may pin JAX_PLATFORMS to a tunneled-TPU
# backend ("axon") that a sitecustomize hook registers only when
# PALLAS_AXON_POOL_IPS is set.  With the variable unset/empty the platform
# list still names the unregistered backend, and the first backend query
# (`jax.default_backend()` in `tnqs.engine`) raises "Backend 'axon' is not
# in the list of known backends" instead of falling back.  Drop the dead
# entry here so `PALLAS_AXON_POOL_IPS= python examples/...` runs on CPU
# without per-script boilerplate (tests/conftest.py pins CPU outright).
if not _os.environ.get("PALLAS_AXON_POOL_IPS"):
    import jax as _jax

    _plats = str(_jax.config.jax_platforms or _os.environ.get("JAX_PLATFORMS", ""))
    if "axon" in _plats.split(","):
        _rest = ",".join(p for p in _plats.split(",") if p and p != "axon")
        _jax.config.update("jax_platforms", _rest or None)

# -- core tensor layer --------------------------------------------------
from .core.index import Index, noprime, prime, sim
from .core.tensor import (
    Tensor,
    commoninds,
    delta,
    directsum,
    from_matrix,
    identity_tensor,
    onehot,
    random_tensor,
    uniqueinds,
)
from .core.linalg import (
    eigh,
    factorize,
    factorize_svd,
    map_diag,
    map_eigs,
    pseudo_sqrt_inv_sqrt,
    qr,
    svd,
    truncation_rank,
)

# -- graphs -------------------------------------------------------------
from .graphs import (
    NamedGraph,
    PartitionedGraph,
    a_star,
    boundary_edges,
    build_graph_from_circuit,
    build_graph_from_gates,
    center,
    eagle_lattice,
    edge_color,
    forest_cover,
    forest_cover_edge_sequence,
    heavy_hexagonal_lattice,
    is_connected,
    is_line_graph,
    is_ring_graph,
    is_tree,
    leaf_vertices,
    leafless_edge_induced_subgraphs,
    lieb_lattice,
    named_comb_tree,
    named_grid,
    named_hexagonal_lattice_graph,
    named_path_graph,
    named_ring_graph,
    post_order_dfs_edges,
    reverse_edge,
    steiner_tree,
    topology_to_graph,
    unique_simple_cycles,
)

# -- networks & constructors -------------------------------------------
from .networks import (
    TensorNetwork,
    TensorNetworkState,
    default_siteinds,
    identity_tensornetworkstate,
    ising_partitionfunction,
    random_tensornetwork,
    random_tensornetworkstate,
    siteinds,
    tensornetwork_from_list,
    tensornetworkstate,
    toriccode_groundstate,
    zerostate,
)
from .sitetypes import op_matrix, site_dimension, site_tag, state_vector

# -- contraction planning ----------------------------------------------
from .contraction import contraction_sequence

# -- forms --------------------------------------------------------------
from .forms import AbstractForm, BilinearForm, QuadraticForm

# -- message passing ----------------------------------------------------
from .bp import (
    BeliefPropagationCache,
    default_bp_update_kwargs,
    default_tolerance,
    loop_correlations,
    make_hermitian,
    message_diff,
)
from .boundarymps import BoundaryMPSCache, default_bmps_update_kwargs, generic_apply
from .loopcorrections import loopcorrected_partitionfunction

# -- gauging ------------------------------------------------------------
from .gauging import (
    gauge_and_scale,
    symmetric_gauge,
    symmetric_gauge_,
    symmetrize_and_normalize,
)

# -- gates & evolution --------------------------------------------------
from .gates import (
    gate_matrix,
    register_alias,
    register_gate,
    to_tensor,
    unregister_gate,
)
from .apply import apply_circuit, apply_gates, apply_op, simple_update
from .fullupdate import full_update
from .truncate import truncate

# -- measurement --------------------------------------------------------
from .measure import (
    contract_network,
    expect,
    inner,
    norm,
    norm_sqr,
    normalize,
    rdm,
    rdm_matrix,
    reduced_density_matrix,
    renyi_entropy,
    second_renyi_entanglement_entropy,
    von_neumann_entanglement_entropy,
)

# -- checkpoint / resume -------------------------------------------------
from .checkpoint import (
    load_bp_cache,
    load_engine,
    load_state,
    save_bp_cache,
    save_engine,
    save_state,
)

# -- sampling -----------------------------------------------------------
from .sampling import (
    certify_sample,
    certify_samples,
    sample,
    sample_certified,
    sample_directly_certified,
)
from .variational import (
    Hamiltonian,
    bp_energy_fn,
    heisenberg_hamiltonian,
    minimize_energy,
    sharded_bp_energy_fn,
    tfim_hamiltonian,
)

# Julia-style aliases for API parity with the reference exports
register_gate_bang = register_gate
contract = contract_network
