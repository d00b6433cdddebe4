"""Shape-memoized einsum: kills the per-trace contraction-path search.

`jnp.einsum(..., optimize=True)` resolves to opt_einsum's 'optimal'
(exhaustive) path search on EVERY call with no caching (jax
`_src/numpy/einsum.py`: `path_type = 'optimal' if optimize is True ...`,
straight into `opt_einsum.contract_path`).  The compiled boundary-MPS tier
unrolls ~800 einsums per program (one per vertex per sweep), so a cold
trace spends ~100 s of single-core host time re-searching paths that are
identical across the dozens of vertices sharing a shape class
(`docs/performance.md`, round-3 verdict item 6).

:func:`ceinsum` computes the path once per (expression, shapes) and passes
the explicit path back to `jnp.einsum` — values are identical (the path
only fixes the contraction order), traces are ~10x cheaper.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

try:
    import opt_einsum
except Exception:  # pragma: no cover
    opt_einsum = None

_PATH_CACHE: dict = {}


def ceinsum(expr: str, *ops, **kwargs):
    """`jnp.einsum(expr, *ops, optimize=<memoized optimal path>)`."""
    if opt_einsum is None:
        return jnp.einsum(expr, *ops, optimize=True, **kwargs)
    key = (expr, tuple(np.shape(o) for o in ops))
    path = _PATH_CACHE.get(key)
    if path is None:
        path, _ = opt_einsum.contract_path(
            expr, *[np.shape(o) for o in ops], shapes=True, optimize="optimal"
        )
        _PATH_CACHE[key] = path
    return jnp.einsum(expr, *ops, optimize=path, **kwargs)
