"""Mesh-parallel boundary-MPS measurement (SURVEY §2.8's measurement leg).

Two parallel dimensions exist in the compiled measurement tier:

* **Samples** (implemented here): the certified sampler is ONE vmapped XLA
  program over per-sample PRNG keys (`tnqs.bmps_engine.BMPSSampler`);
  sharding the key batch over a 1-D device mesh data-parallelizes it — the
  norm-network boundary MPSes are sample-independent and replicate, the
  per-sample projected sweeps partition.  Scaling is embarrassing (no
  cross-sample communication beyond the final gather), which makes this
  the production scale-out axis for sampling workloads.
* **Columns** (design note): the zip sweeps themselves are sequential left
  and right chains over column cuts.  With columns banded over a device
  ring, the two directions pipeline in opposite directions (device d
  active for the left sweep at step d and the right sweep at step D-1-d:
  2x over sequential) and the per-column ladder walks — the dominant cost
  at large chi — are fully parallel once both cut MPSes of a band exist.
  This needs a masked uniform column body (every device must trace the
  same program), which the unrolled per-vertex sweeps deliberately avoid;
  the sample axis above scales first.

Validated on the virtual CPU mesh by `tests/test_parallel.py` and
`__graft_entry__.py:dryrun_multichip` (stage 4).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..bmps_engine import BMPSSampler


class ShardedSampler:
    """Data-parallel certified sampling over a 1-D mesh.

    Wraps a :class:`BMPSSampler`; the per-sample key batch is sharded over
    the mesh axis, the engine state and messages are replicated, and the
    sampler's single vmapped program partitions across devices."""

    def __init__(self, sampler: BMPSSampler, mesh: Mesh):
        self.sampler = sampler
        self.mesh = mesh
        self.axis = mesh.axis_names[0]

    def sample_directly_certified(self, nsamples: int, seed: int = 0):
        from ..utils.transfer import device_get

        sam = self.sampler
        D = self.mesh.devices.size
        n_pad = -(-nsamples // D) * D  # pad to a multiple of the mesh size
        if n_pad not in sam._fns:
            sam._fns[n_pad] = sam._build(batch=n_pad)
        keys = jax.random.split(jax.random.PRNGKey(seed), n_pad)
        keys = jax.device_put(keys, NamedSharding(self.mesh, P(self.axis)))
        repl = NamedSharding(self.mesh, P())
        eng = sam.bmps.engine
        T = {k: jax.device_put(v, repl) for k, v in eng.T.items()}
        M = jax.device_put(eng.M, repl)
        bits, logq, poverq, n_hat = sam._fns[n_pad](T, M, keys)
        bits = np.asarray(device_get(bits))[:nsamples]
        logq = np.asarray(device_get(logq))[:nsamples]
        poverq = np.asarray(device_get(poverq))[:nsamples]
        n_hat = float(np.asarray(device_get(n_hat)))
        return [
            dict(
                poverq=float(poverq[s]),
                logq=float(logq[s]),
                norm_estimate=n_hat,
                bitstring={
                    v: int(bits[s, i]) for i, v in enumerate(sam.keys_order)
                },
            )
            for s in range(nsamples)
        ]
