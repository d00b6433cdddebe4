"""Symmetric (Vidal) gauge from the BP fixed point.

Reference: `/root/reference/src/symmetric_gauge.jl`.  For every edge the two
directed BP messages are eigendecomposed, their inverse roots absorbed into
the site tensors, and the central matrix ``sqrt(X) sqrt(Y)`` is SVD'd; the
singular values become the new (diagonal) bond messages, with ``sqrt(S)``
attached to both sides.
"""

from __future__ import annotations

import numpy as np

from .bp import BeliefPropagationCache
from .core.index import Index
from .core.linalg import map_diag, map_eigs, svd
from .graphs import reverse_edge
from .networks import TensorNetworkState


def symmetric_gauge_(bpc: BeliefPropagationCache, regularization: float | None = None) -> BeliefPropagationCache:
    """In-place symmetric gauge transform of the cache's state and messages
    (reference `symmetric_gauge!`, `symmetric_gauge.jl:1-56`)."""
    tn = bpc.network
    if not isinstance(tn, TensorNetworkState):
        raise TypeError("Can only transform TensorNetworkStates to the symmetric gauge")
    if regularization is None:
        eps = np.finfo(tn.real_dtype()).eps
        regularization = 10 * eps

    for e in bpc.edges():
        vsrc, vdst = e
        psi_src, psi_dst = tn[vsrc], tn[vdst]
        edge_inds = tn.virtualinds(e)
        if len(edge_inds) != 1:
            raise ValueError("symmetric gauge requires a single bond index per edge")
        l = edge_inds[0]
        l_sim = l.sim()

        X = bpc.message(e)
        Y = bpc.message(reverse_edge(e))
        root_x = map_eigs(X, lambda w: np.sqrt(np.real(w) + regularization))
        inv_root_x = map_eigs(X, lambda w: 1.0 / np.sqrt(np.real(w) + regularization))
        root_y = map_eigs(Y, lambda w: np.sqrt(np.real(w) + regularization))
        inv_root_y = map_eigs(Y, lambda w: 1.0 / np.sqrt(np.real(w) + regularization))

        # absorb the inverse roots into the two site tensors
        psi_src = (psi_src * inv_root_x).noprime()
        psi_dst = (psi_dst * inv_root_y).noprime()

        # central matrix sqrt(X) . sqrt(Y)^T and its SVD
        Ce = root_x * root_y.replaceind(l, l_sim)  # (l, l_sim)
        U, S, V, _ = svd(Ce, [l])
        u = next(i for i in S.inds if U.hasind(i))
        v = next(i for i in S.inds if V.hasind(i))
        new_l = Index(u.dim, l.tag)

        psi_src = (psi_src * U).replaceind(u, new_l)
        psi_dst = psi_dst.replaceind(l, l_sim)
        psi_dst = (psi_dst * V).replaceind(v, new_l)

        S = S.replaceinds([u, v], [new_l, new_l.prime()])
        sqrt_S = map_diag(S, np.sqrt)
        psi_src = (psi_src * sqrt_S).noprime()
        psi_dst = (psi_dst * sqrt_S).noprime()

        bpc.set_preserve(vsrc, psi_src)
        bpc.set_preserve(vdst, psi_dst)
        bpc.set_message(e, S)
        bpc.set_message(reverse_edge(e), S.dag())
    return bpc


def symmetric_gauge(psi, regularization: float | None = None, cache_update_kwargs: dict | None = None):
    """Symmetric gauge of a cache (returns a new cache) or a state (returns a
    new state; BP is run first, reference `symmetric_gauge.jl:58-68`)."""
    if isinstance(psi, BeliefPropagationCache):
        return symmetric_gauge_(psi.copy(), regularization=regularization)
    cache_update_kwargs = {"maxiter": 40} if cache_update_kwargs is None else cache_update_kwargs
    bpc = BeliefPropagationCache(psi).update(**cache_update_kwargs)
    return symmetric_gauge_(bpc, regularization=regularization).network


def symmetrize_and_normalize(bpc: BeliefPropagationCache, **kwargs) -> BeliefPropagationCache:
    """Rescale to unit local scalars, then symmetric-gauge
    (reference `symmetric_gauge.jl:70-74`)."""
    bpc = bpc.rescale()
    return symmetric_gauge_(bpc, **kwargs)


def gauge_and_scale(psi: TensorNetworkState, cache_update_kwargs: dict | None = None, **kwargs) -> TensorNetworkState:
    """BP update + rescale + symmetric gauge, returning the state
    (reference `gauge_and_scale` / `symmetrize_and_bpnormalize`,
    `symmetric_gauge.jl:76-83`)."""
    cache_update_kwargs = {"maxiter": 40} if cache_update_kwargs is None else cache_update_kwargs
    bpc = BeliefPropagationCache(psi).update(**cache_update_kwargs)
    bpc = symmetrize_and_normalize(bpc, **kwargs)
    return bpc.network
