"""Device-mesh sharding of the compiled engine.

The reference has no distributed execution at all (SURVEY.md §2.8: no
MPI/NCCL/threads — single-device Adapt offload only).  This module is the
TPU-native scale-out design: the engine's batch dimensions — vertices within
a degree bucket and directed edges of the message array — are the natural
data-parallel axes of belief propagation.  We lay them out with
`NamedSharding` over a 1D mesh and let XLA insert the collectives (gathers of
neighbor messages become all-to-alls over ICI; convergence reductions become
psums).  No hand-written communication.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine import LatticeEngine


def make_mesh(n_devices: int | None = None, axis: str = "d") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _pad_rows(arr: jax.Array, multiple: int) -> jax.Array:
    n = arr.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return arr
    return jnp.concatenate([arr, jnp.zeros((pad,) + arr.shape[1:], arr.dtype)], axis=0)


class ShardedEngine:
    """Wrap a `LatticeEngine` with mesh-sharded state and messages.

    Bucket tensors ``T[k]`` and the message array ``M`` are padded to a
    multiple of the mesh size along their leading (batch) axis and sharded
    with ``PartitionSpec('d')``.  The engine's jitted step runs unchanged:
    gather/scatter by edge id and the batched linear algebra become SPMD
    programs with XLA-inserted collectives.
    """

    def __init__(self, engine: LatticeEngine, mesh: Mesh):
        self.engine = engine
        self.mesh = mesh
        axis = mesh.axis_names[0]
        n = mesh.devices.size
        self._row_sharding = NamedSharding(mesh, P(axis))
        self._n = n
        # messages: padded + sharded on edge axis
        self.M = jax.device_put(_pad_rows(engine.M, n), self._row_sharding)
        self._m_rows = engine.M.shape[0]
        # bucket tensors: padded + sharded on vertex axis
        self.T = {
            k: jax.device_put(_pad_rows(arr, n), self._row_sharding)
            for k, arr in engine.T.items()
        }
        self._t_rows = {k: arr.shape[0] for k, arr in engine.T.items()}

    def make_step(self, circuit, **kwargs):
        """Compile the sharded layer step.  Shapes include the padding, so
        the same engine kernels trace through; out-shardings keep the layout
        stable across iterations.  Gate tensors are threaded through the jit
        boundary as replicated arguments (not closure constants — see
        `LatticeEngine.make_step`)."""
        eng = self.engine
        inner = eng.make_step(circuit, **kwargs)
        gate_params = inner.gate_params
        inner_jitted = inner.jitted

        def sharded_step(T, M, G):
            Tn, Mn, errors = inner_jitted(
                {k: v[: self._t_rows[k]] for k, v in T.items()},
                M[: self._m_rows],
                G,
            )
            Tn = {k: _pad_rows(v, self._n) for k, v in Tn.items()}
            Mn = _pad_rows(Mn, self._n)
            return Tn, Mn, errors

        replicated = NamedSharding(self.mesh, P())
        in_shardings = (
            {k: self._row_sharding for k in self.T},
            self._row_sharding,
            jax.tree_util.tree_map(lambda _: replicated, gate_params),
        )
        out_shardings = (
            {k: self._row_sharding for k in self.T},
            self._row_sharding,
            replicated,
        )
        jitted = jax.jit(sharded_step, in_shardings=in_shardings, out_shardings=out_shardings)

        def step(T, M):
            return jitted(T, M, gate_params)

        step.jitted = jitted
        step.gate_params = gate_params
        return step

    def step_once(self, circuit, **kwargs):
        step = self.make_step(circuit, **kwargs)
        self.T, self.M, errors = step(self.T, self.M)
        jax.block_until_ready(self.M)
        return errors

    def freenergy(self):
        """BP free energy with the log reductions done ON the mesh (the
        SURVEY §2.8 'psum-style reductions for free energy': the sharded
        per-vertex/per-edge scalar sums lower to XLA-inserted collectives;
        only two real scalars reach the host).  Semantics match
        `LatticeEngine.freenergy` exactly: all-real-positive scalars give a
        real log Z, otherwise the complex branch's summed phases."""
        eng = self.engine
        if getattr(self, "_fe_fn", None) is None:

            def fn(T, M):
                vs, es = eng._bp_scalars(
                    {k: v[: self._t_rows[k]] for k, v in T.items()},
                    M[: self._m_rows],
                )
                allv = jnp.concatenate([v.ravel() for v in vs.values()])
                re = jnp.sum(jnp.log(jnp.abs(allv))) - jnp.sum(
                    jnp.log(jnp.abs(es))
                )
                im = jnp.sum(jnp.angle(allv)) - jnp.sum(jnp.angle(es))
                # flex takes the per-term complex log only when needed;
                # angle==0 for real-positive terms makes the two agree
                min_es = jnp.min(jnp.abs(es))
                return jnp.real(re), jnp.real(im), min_es

            replicated = NamedSharding(self.mesh, P())
            self._fe_fn = jax.jit(
                fn,
                in_shardings=(
                    {k: self._row_sharding for k in self.T},
                    self._row_sharding,
                ),
                out_shardings=(replicated, replicated, replicated),
            )
        re, im, min_es = self._fe_fn(self.T, self.M)
        if float(np.asarray(min_es)) == 0.0:
            # a zero edge scalar means Z_BP = 0 (LatticeEngine.freenergy's
            # -inf branch), NOT +inf from the -log|0| denominator
            return -np.inf
        re, im = float(np.asarray(re)), float(np.asarray(im))
        return re if im == 0.0 else complex(re, im)

    def partitionfunction(self):
        from ..engine import _z_from_freenergy

        return _z_from_freenergy(self.freenergy())

    def unshard(self) -> LatticeEngine:
        from ..utils.transfer import device_get

        eng = self.engine
        eng.T = {k: jnp.asarray(device_get(v)[: self._t_rows[k]]) for k, v in self.T.items()}
        eng.M = jnp.asarray(device_get(self.M)[: self._m_rows])
        return eng
