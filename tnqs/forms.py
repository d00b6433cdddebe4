"""Quadratic and bilinear forms: <psi|O|psi> / <phi|O|psi> sandwiches.

Reference: `/root/reference/src/Forms/*.jl`.  A form presents a ket/operator/
bra triple as a single BP-able network: per-vertex factors are
``[ket[v], op[v], bra[v]]`` and each edge carries the tripled virtual space.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from .core.index import Index
from .core.tensor import Tensor, delta, from_matrix
from .graphs import Edge, NamedGraph
from .networks import TensorNetworkState
from .sitetypes import op_matrix


class AbstractForm:
    """Common network-facing API so a form can sit inside a BP cache."""

    # subclasses define: ket(), operator(), bra_tensor(v), bra_virtualinds(e)

    @property
    def graph(self) -> NamedGraph:
        return self.ket.graph

    def vertices(self):
        return self.graph.vertices()

    def edges(self):
        return self.graph.edges()

    def neighbors(self, v):
        return self.graph.neighbors(v)

    def is_tree(self):
        from .graphs import is_tree

        return is_tree(self.graph)

    def dtype(self):
        return np.result_type(self.ket.dtype(), self.operator.dtype())

    def real_dtype(self):
        return np.zeros(0, dtype=self.dtype()).real.dtype

    def is_on_jax(self) -> bool:
        return self.ket.is_on_jax()

    def _adapt_like(self, t: Tensor) -> Tensor:
        t = t.astype(self.dtype())
        if self.is_on_jax():
            t = t.to_jax()
        return t

    def maxvirtualdim(self):
        return self.ket.maxvirtualdim()

    def virtualinds(self, e: Edge) -> list[Index]:
        return (
            self.ket.virtualinds(e)
            + self.operator.virtualinds(e)
            + self.bra_virtualinds(e)
        )

    def default_message(self, e: Edge) -> Tensor:
        return self._adapt_like(delta(self.virtualinds(e), dtype=self.real_dtype()))

    def bp_factors(self, v) -> list[Tensor]:
        return [self.ket[v], self.operator[v], self.bra_tensor(v)]


class QuadraticForm(AbstractForm):
    """<psi|O|psi> with the bra derived lazily as dag(prime(ket)).

    Reference: `src/Forms/quadraticform.jl`.
    """

    def __init__(self, ket: TensorNetworkState, f: Callable | None = None, operator: TensorNetworkState | None = None):
        self.ket = ket
        if operator is not None:
            self.operator = operator
            return
        f = (lambda v: "I") if f is None else f
        op_tensors = {}
        for v in ket.vertices():
            sinds = ket.siteinds(v)
            t = None
            for s in sinds:
                o = ket._adapt_like(from_matrix(op_matrix(f(v), s.dim), [s.prime()], [s]))
                t = o if t is None else t * o
            op_tensors[v] = t
        self.operator = TensorNetworkState(op_tensors, ket.graph.copy(), {v: [] for v in ket.vertices()})

    def copy(self) -> "QuadraticForm":
        return QuadraticForm(self.ket.copy(), operator=self.operator.copy())

    def bra_tensor(self, v) -> Tensor:
        return self.ket[v].prime().dag()

    def bra_virtualinds(self, e: Edge):
        return [i.prime() for i in self.ket.virtualinds(e)]


def _remap_site_inds(tns, remap: dict):
    """Copy of `tns` with per-vertex site indices replaced (old, new) —
    tensors AND the `site_inds` registry stay in sync."""
    out = tns.copy()
    for v, (old, new) in remap.items():
        if old == new:
            continue
        out.set_preserve(v, out[v].replaceinds(old, new))
        out.site_inds[v] = list(new)
    return out


class BilinearForm(AbstractForm):
    """<phi|O|psi> with an explicitly stored (primed, conjugated) bra.

    The constructor takes `ket` and `bra` in the *same* vector space (same
    graph and site indices) and dualizes the bra; the operator layer is the
    identity.  Reference: `src/Forms/bilinearform.jl`.
    """

    def __init__(self, ket: TensorNetworkState, bra: TensorNetworkState, _raw: bool = False):
        if _raw:
            self.ket, self.bra = ket, bra
            self.operator = None  # set by copy()
            return
        if ket.graph != bra.graph:
            raise ValueError("BilinearForm: states must share the same graph")
        # the sandwich pairs ket and bra by site-INDEX IDENTITY; two states
        # built independently (same graph, same dims, different Index
        # objects) would silently share nothing — the network decomposes
        # into outer products and any contraction planner is forced into a
        # d^(2 nv)-element intermediate (observed: a 512 GiB einsum on an
        # 18-site cylinder).  Remap the bra's site indices onto the ket's
        # per vertex when the dimensions agree; error when they don't.
        if any(ket.siteinds(v) != bra.siteinds(v) for v in ket.vertices()):
            remap = {}
            for v in ket.vertices():
                ks, bs = ket.siteinds(v), bra.siteinds(v)
                if len(ks) != len(bs) or any(
                    k.dim != b.dim for k, b in zip(ks, bs)
                ):
                    raise ValueError(
                        f"BilinearForm: site indices at {v} differ in "
                        f"number or dimension ({bs} vs {ks})"
                    )
                remap[v] = (list(bs), list(ks))
            bra = _remap_site_inds(bra, remap)
        self.ket = ket
        self.bra = bra.map_tensors(lambda t: t.prime().dag())
        op_tensors = {}
        for v in ket.vertices():
            sinds = ket.siteinds(v)
            t = None
            for s in sinds:
                o = ket._adapt_like(delta([s, s.prime()], dtype=ket.real_dtype()))
                t = o if t is None else t * o
            op_tensors[v] = t
        self.operator = TensorNetworkState(op_tensors, ket.graph.copy(), {v: [] for v in ket.vertices()})

    def copy(self) -> "BilinearForm":
        out = BilinearForm.__new__(BilinearForm)
        out.ket = self.ket.copy()
        out.bra = self.bra.copy()
        out.operator = self.operator.copy()
        return out

    def bra_tensor(self, v) -> Tensor:
        return self.bra[v]

    def bra_virtualinds(self, e: Edge):
        return self.bra.virtualinds(e)
