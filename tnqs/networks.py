"""Tensor-network data model: `TensorNetwork` and `TensorNetworkState`.

TPU-native counterpart of the reference's L2 layer
(`/root/reference/src/TensorNetworks/*.jl`).  A network is a graph plus a
dict of named-index tensors; edges always correspond to shared indices.
Networks are plain Python containers at plan level; tensor data lives in
numpy (host) or JAX arrays (device) — move with :meth:`adapt`.
"""

from __future__ import annotations

from typing import Callable, Iterable, Sequence

import numpy as np

from .core.index import Index
from .core.tensor import (
    Tensor,
    commoninds,
    delta,
    directsum,
    from_matrix,
    identity_tensor,
    onehot,
    random_tensor,
)
from .graphs import Edge, NamedGraph, reverse_edge
from .sitetypes import op_matrix, site_dimension, site_tag, state_vector


# ----------------------------------------------------------------------
# site index construction (reference `src/siteinds.jl`)
# ----------------------------------------------------------------------

def siteinds(sitetype: str, g: NamedGraph, dim: int | None = None, inds_per_site: int = 1) -> dict:
    """Fresh physical indices for every vertex of `g`."""
    d = site_dimension(sitetype) if dim is None else int(dim)
    tag = site_tag(sitetype)
    return {v: [Index(d, tag) for _ in range(inds_per_site)] for v in g.vertices()}


def default_siteinds(g: NamedGraph) -> dict:
    return siteinds("S=1/2", g)


# ----------------------------------------------------------------------
# TensorNetwork
# ----------------------------------------------------------------------

class TensorNetwork:
    """A graph of tensors; edges are pairs of tensors sharing indices.

    Reference: `src/TensorNetworks/tensornetwork.jl:9-12`.
    """

    def __init__(self, tensors: dict, graph: NamedGraph | None = None):
        if graph is None:
            graph = _infer_graph(tensors)
        self.tensors: dict = dict(tensors)
        self.graph = graph

    # -- basic container behaviour ------------------------------------
    def __getitem__(self, v) -> Tensor:
        return self.tensors[v]

    def set_preserve(self, v, t: Tensor) -> "TensorNetwork":
        """Replace the tensor at `v` without recomputing edges
        (reference `setindex_preserve!`,
        `src/TensorNetworks/abstracttensornetwork.jl:40-43`)."""
        self.tensors[v] = t
        return self

    def __setitem__(self, v, t: Tensor):
        if not self.graph.has_vertex(v):
            raise KeyError(f"vertex {v!r} not in tensor network")
        self.add_tensor(t, v)

    def add_tensor(self, t: Tensor, v) -> "TensorNetwork":
        """Insert `t` at `v`, re-deriving the incident edges from shared
        indices (reference `add_tensor!`, `tensornetwork.jl:44-60`)."""
        g = self.graph
        if not g.has_vertex(v):
            g.add_vertex(v)
        else:
            for e in g.incident_edges(v):
                g.rem_edge(*e)
        self.tensors[v] = t
        for u in self.vertices():
            if u != v and commoninds(self.tensors[u], t):
                g.add_edge(v, u)
        return self

    def rem_vertex(self, v) -> "TensorNetwork":
        self.graph.rem_vertex(v)
        del self.tensors[v]
        return self

    def copy(self) -> "TensorNetwork":
        return TensorNetwork(dict(self.tensors), self.graph.copy())

    # -- graph forwarding ---------------------------------------------
    def vertices(self) -> list:
        return self.graph.vertices()

    def edges(self) -> list[Edge]:
        return self.graph.edges()

    def neighbors(self, v) -> list:
        return self.graph.neighbors(v)

    def is_tree(self) -> bool:
        from .graphs import is_tree

        return is_tree(self.graph)

    # -- index queries -------------------------------------------------
    def virtualinds(self, e: Edge) -> list[Index]:
        return commoninds(self[e[0]], self[e[1]])

    def virtualind(self, e: Edge) -> Index:
        vi = self.virtualinds(e)
        if len(vi) != 1:
            raise ValueError(f"edge {e} has {len(vi)} virtual indices")
        return vi[0]

    def maxvirtualdim(self) -> int:
        dims = [i.dim for e in self.edges() for i in self.virtualinds(e)]
        return max(dims) if dims else 1

    def uniqueinds(self, v) -> list[Index]:
        mine = list(self[v].inds)
        for u in self.neighbors(v):
            other = set(self[u].inds)
            mine = [i for i in mine if i not in other]
        return mine

    def siteinds_dict(self) -> dict:
        return {v: self.uniqueinds(v) for v in self.vertices()}

    # -- BP interface (reference `tensornetwork.jl:62-72`) ------------
    def bp_factors(self, v) -> list[Tensor]:
        return [self[v]]

    def default_message(self, e: Edge) -> Tensor:
        return self._adapt_like(delta(self.virtualinds(e), dtype=self.real_dtype()))

    # -- dtype / backend ----------------------------------------------
    def dtype(self):
        return np.result_type(*[t.dtype for t in self.tensors.values()])

    def real_dtype(self):
        return np.zeros(0, dtype=self.dtype()).real.dtype

    def is_on_jax(self) -> bool:
        from .core.tensor import is_jax

        return any(is_jax(t.data) for t in self.tensors.values())

    def _adapt_like(self, t: Tensor) -> Tensor:
        t = t.astype(self.dtype())
        if self.is_on_jax():
            t = t.to_jax()
        return t

    def map_tensors(self, f: Callable[[Tensor], Tensor]) -> "TensorNetwork":
        out = self.copy()
        for v in out.vertices():
            out.set_preserve(v, f(out[v]))
        return out

    def map_virtualinds(self, f: Callable[[list], list]) -> "TensorNetwork":
        """Apply `f` to each edge's virtual-index list and substitute the
        result in BOTH endpoint tensors (reference `map_virtualinds(!)`,
        `src/TensorNetworks/abstracttensornetwork.jl:93-107`).

        `f` takes the list of shared indices of one edge and returns
        same-length, same-dimension replacements — e.g.
        `lambda inds: [i.sim() for i in inds]` to detach a copy of the
        network from index identity with the original."""
        out = self.copy()
        for e in out.edges():
            old = out.virtualinds(e)
            new = list(f(list(old)))
            if len(new) != len(old) or any(
                a.dim != b.dim for a, b in zip(old, new)
            ):
                raise ValueError(
                    "map_virtualinds must return one same-dimension index "
                    "per input index"
                )
            out.set_preserve(e[0], out[e[0]].replaceinds(old, new))
            out.set_preserve(e[1], out[e[1]].replaceinds(old, new))
        return out

    def adapt(self, dtype=None, backend: str | None = None, device=None) -> "TensorNetwork":
        """Move/convert all tensors (reference `Adapt.adapt_structure`,
        `abstracttensornetwork.jl:71-73`)."""

        def f(t: Tensor) -> Tensor:
            if dtype is not None:
                t = t.astype(dtype)
            if backend == "jax":
                t = t.to_jax(device)
            elif backend == "numpy":
                t = t.to_host()
            return t

        return self.map_tensors(f)

    # -- structural edits ---------------------------------------------
    def insert_virtualinds(self, bond_dimension: int = 1) -> "TensorNetwork":
        """Give every index-free edge a trivial bond
        (reference `insert_virtualinds!`, `abstracttensornetwork.jl:75-86`)."""
        out = self.copy()
        for e in out.edges():
            if not out.virtualinds(e):
                l = Index(bond_dimension, "Link")
                p = out._adapt_like(onehot(l, 0))
                out.set_preserve(e[0], out[e[0]] * p)
                out.set_preserve(e[1], out[e[1]] * p)
        return out

    def combine_virtualinds(self) -> "TensorNetwork":
        """Fuse parallel bonds on each edge into a single index
        (reference `combine_virtualinds!`, `abstracttensornetwork.jl:108-119`)."""
        out = self.copy()
        for e in out.edges():
            vinds = out.virtualinds(e)
            if len(vinds) > 1:
                fused = Index(int(np.prod([i.dim for i in vinds])), "Link")
                C = out._adapt_like(identity_tensor([fused], vinds))
                out.set_preserve(e[0], out[e[0]] * C)
                out.set_preserve(e[1], out[e[1]] * C)
        return out

    # -- addition (direct sum; reference `abstracttensornetwork.jl:127-169`)
    def add(self, other: "TensorNetwork") -> "TensorNetwork":
        if self.graph != other.graph:
            raise ValueError("networks must share the same graph to be added")
        es = self.edges()
        new_inds = {}
        for e in es:
            d1 = self.virtualind(e).dim
            d2 = other.virtualind(e).dim
            new_inds[frozenset(e)] = Index(d1 + d2, "Link")
        out = self.copy()
        for v in self.vertices():
            es_v = [e for e in es if v in e]
            a_inds = [self.virtualind(e) for e in es_v]
            b_inds = [other.virtualind(e) for e in es_v]
            n_inds = [new_inds[frozenset(e)] for e in es_v]
            out.set_preserve(v, directsum(self[v], a_inds, other[v], b_inds, n_inds))
        return out

    def __add__(self, other):
        return self.add(other)

    def __repr__(self):
        return f"{type(self).__name__}({self.graph.nv()} vertices, {self.graph.ne()} edges)"


def _infer_graph(tensors: dict) -> NamedGraph:
    g = NamedGraph(tensors.keys())
    vs = list(tensors.keys())
    for i, v in enumerate(vs):
        for u in vs[i + 1:]:
            if commoninds(tensors[v], tensors[u]):
                g.add_edge(v, u)
    return g


def tensornetwork_from_list(tensors: Sequence[Tensor]) -> TensorNetwork:
    return TensorNetwork({i + 1: t for i, t in enumerate(tensors)})


def random_tensornetwork(g: NamedGraph, bond_dimension: int = 1, dtype=np.float64, rng=None) -> TensorNetwork:
    """Random scalar network (reference `tensornetwork.jl:74-86`)."""
    rng = np.random.default_rng() if rng is None else rng
    links = {}
    for e in g.edges():
        l = Index(bond_dimension, "Link")
        links[frozenset(e)] = l
    tensors = {}
    for v in g.vertices():
        inds = [links[frozenset((v, u))] for u in g.neighbors(v)]
        tensors[v] = random_tensor(inds, dtype=dtype, rng=rng)
    return TensorNetwork(tensors, g.copy())


# ----------------------------------------------------------------------
# TensorNetworkState
# ----------------------------------------------------------------------

class TensorNetworkState(TensorNetwork):
    """A wavefunction network: tensors carry physical (site) indices.

    Reference: `src/TensorNetworks/tensornetworkstate.jl:12-15`.
    """

    def __init__(self, tensors: dict, graph: NamedGraph | None = None, site_inds: dict | None = None):
        super().__init__(tensors, graph)
        if site_inds is None:
            site_inds = {v: self.uniqueinds(v) for v in self.vertices()}
        self.site_inds: dict = {v: list(inds) for v, inds in site_inds.items()}

    def siteinds(self, v=None):
        if v is None:
            return self.site_inds
        return self.site_inds[v]

    def copy(self) -> "TensorNetworkState":
        return TensorNetworkState(dict(self.tensors), self.graph.copy(), {v: list(i) for v, i in self.site_inds.items()})

    def __setitem__(self, v, t: Tensor):
        super().__setitem__(v, t)
        for u in self.neighbors(v) + [v]:
            self.site_inds[u] = self.uniqueinds(u)

    def map_tensors(self, f: Callable[[Tensor], Tensor]) -> "TensorNetworkState":
        out = self.copy()
        for v in out.vertices():
            out.set_preserve(v, f(out[v]))
        return out

    # -- BP interface (doubled ket/bra layer) --------------------------
    def norm_factors(self, verts: Sequence, op_strings: Callable | None = None) -> list[Tensor]:
        """Per-vertex factor list of the norm network `<psi|O|psi>`.

        `op_strings(v)` returns "I" (contract ket/bra site directly), "ρ"
        (leave the site open for RDMs), or an operator name.  Reference:
        `src/TensorNetworks/tensornetworkstate.jl:50-67`.
        """
        if op_strings is None:
            op_strings = lambda v: "I"
        factors: list[Tensor] = []
        for v in verts:
            sinds = self.site_inds[v]
            tv = self[v]
            tv_dag = tv.prime().dag()
            o = op_strings(v)
            if o == "ρ" or not sinds:
                factors.extend([tv, tv_dag])
            elif o == "I":
                tv_dag = tv_dag.replaceinds([i.prime() for i in sinds], sinds)
                factors.extend([tv, tv_dag])
            else:
                if len(sinds) != 1:
                    raise ValueError("operator insertion requires one site index per vertex")
                s = sinds[0]
                opt = self._adapt_like(from_matrix(op_matrix(o, s.dim), [s.prime()], [s]))
                factors.extend([tv, tv_dag, opt])
        return factors

    def bp_factors(self, v) -> list[Tensor]:
        return self.norm_factors([v])

    def default_message(self, e: Edge) -> Tensor:
        linds = self.virtualinds(e)
        return self._adapt_like(delta(linds + [i.prime() for i in linds], dtype=self.real_dtype()))

    def gate_vertices(self, t: Tensor) -> list:
        """Vertices whose site indices appear on gate tensor `t`
        (reference `vertices(::ITensor, tns)`, `tensornetworkstate.jl:191-194`)."""
        out = []
        for v in self.vertices():
            if any(t.hasind(s) for s in self.site_inds[v]):
                out.append(v)
        return out


# ----------------------------------------------------------------------
# state constructors (reference `tensornetworkstate.jl:93-189`,
# `tensornetworkstate_constructors.jl`)
# ----------------------------------------------------------------------

def random_tensornetworkstate(
    g: NamedGraph,
    site_inds: dict | str | None = None,
    bond_dimension: int = 1,
    dtype=np.float64,
    rng=None,
) -> TensorNetworkState:
    rng = np.random.default_rng() if rng is None else rng
    if site_inds is None:
        site_inds = default_siteinds(g)
    elif isinstance(site_inds, str):
        site_inds = siteinds(site_inds, g)
    links = {frozenset(e): Index(bond_dimension, "Link") for e in g.edges()}
    tensors = {}
    for v in g.vertices():
        inds = list(site_inds[v]) + [links[frozenset((v, u))] for u in g.neighbors(v)]
        tensors[v] = random_tensor(inds, dtype=dtype, rng=rng)
    return TensorNetworkState(tensors, g.copy(), site_inds)


def tensornetworkstate(
    f: Callable,
    g: NamedGraph,
    site_inds: dict | str | None = None,
    dtype=np.float64,
) -> TensorNetworkState:
    """Product state from per-vertex state labels or coefficient vectors."""
    if site_inds is None:
        site_inds = default_siteinds(g)
    elif isinstance(site_inds, str):
        site_inds = siteinds(site_inds, g)
    tensors = {}
    for v in g.vertices():
        local = f(v)
        s = site_inds[v]
        if len(s) != 1:
            raise ValueError("product-state constructor expects one site index per vertex")
        if isinstance(local, str):
            vec = state_vector(local, s[0].dim)
        else:
            vec = np.asarray(local)
        tensors[v] = Tensor(vec, s).astype(dtype)
    for e in g.edges():
        l = Index(1, "Link")
        p = onehot(l, 0, dtype=np.asarray(tensors[e[0]].data).real.dtype)
        tensors[e[0]] = tensors[e[0]] * p.astype(tensors[e[0]].dtype)
        tensors[e[1]] = tensors[e[1]] * p.astype(tensors[e[1]].dtype)
    return TensorNetworkState(tensors, g.copy(), site_inds)


def zerostate(g: NamedGraph, site_inds: dict | None = None, dtype=np.float64) -> TensorNetworkState:
    """All-spins-up product state (reference
    `tensornetworkstate_constructors.jl:6-10`)."""
    if site_inds is None:
        site_inds = siteinds("S=1/2", g)
    return tensornetworkstate(lambda v: "↑", g, site_inds, dtype=dtype)


def identity_tensornetworkstate(g: NamedGraph, site_inds: dict | None = None, dtype=np.float64) -> TensorNetworkState:
    """Bond-dimension-1 operator-state representing the identity matrix.

    Each vertex holds an even number of physical indices: the first half are
    "ket" (row) and the second half "bra" (column) legs
    (reference `tensornetworkstate_constructors.jl:21-41`).
    """
    if site_inds is None:
        site_inds = siteinds("S=1/2", g, inds_per_site=2)
    links = {frozenset(e): Index(1, f"e{e[0]}_{e[1]}") for e in g.edges()}
    tensors = {}
    for v in g.vertices():
        s = site_inds[v]
        if len(s) % 2 != 0:
            raise ValueError(
                f"Odd number of siteinds on vertex {v} - don't know how to "
                "partition into rows and columns"
            )
        es = [links[frozenset((v, u))] for u in g.neighbors(v)]
        t = delta(es, dtype=dtype)
        n = len(s)
        if n > 0:
            row, col = s[: n // 2], s[n // 2:]
            t = t * identity_tensor(row, col, dtype=dtype)
        tensors[v] = t
    return TensorNetworkState(tensors, g.copy(), site_inds)


def toriccode_groundstate(n: int, site_inds: dict | None = None) -> TensorNetworkState:
    """Exact bond-dimension-2 toric-code ground state on an n x n torus.

    Reference: `tensornetworkstate_constructors.jl:60-91`.
    """
    from .graphs import named_grid

    g = named_grid((n, n), periodic=True)
    if site_inds is None:
        site_inds = siteinds("S=1/2", g)

    def mod1(x, m):
        return ((x - 1) % m) + 1

    e_inds: dict[frozenset, Index] = {frozenset(e): Index(2, "Link") for e in g.edges()}

    def lk(a, b) -> Index:
        return e_inds[frozenset((a, b))]

    tensors = {}
    for v in g.vertices():
        sv = site_inds[v][0]
        north = lk((mod1(v[0] + 1, n), v[1]), v)
        east = lk((v[0], mod1(v[1] + 1, n)), v)
        south = lk(v, (mod1(v[0] - 1, n), v[1]))
        west = lk(v, (v[0], mod1(v[1] - 1, n)))
        inds = [north, east, south, west, sv]
        uniq = []
        for i in inds[:-1]:
            if i not in uniq:
                uniq.append(i)
        if len(uniq) != 4:
            raise ValueError("toric code requires n >= 3 (distinct wrap edges)")

        def oh(ix, k):
            return onehot(ix, k, dtype=np.complex128)

        if (v[0] + v[1]) % 2 == 0:
            a, b = (north, east), (south, west)
        else:
            a, b = (north, west), (south, east)
        plus_a = oh(a[0], 0) * oh(a[1], 0) + oh(a[0], 1) * oh(a[1], 1)
        minus_a = oh(a[0], 0) * oh(a[1], 0) - oh(a[0], 1) * oh(a[1], 1)
        plus_b = oh(b[0], 0) * oh(b[1], 0) + oh(b[0], 1) * oh(b[1], 1)
        minus_b = oh(b[0], 0) * oh(b[1], 0) - oh(b[0], 1) * oh(b[1], 1)
        t = plus_a * plus_b * oh(sv, 0) + minus_a * minus_b * oh(sv, 1)
        tensors[v] = t.permute(inds)
    return TensorNetworkState(tensors, g.copy(), site_inds)


def ising_partitionfunction(g: NamedGraph, beta: float, Js: dict | None = None) -> TensorNetwork:
    """Bond-dimension-2 network contracting to the classical Ising Z(beta).

    Reference: `tensornetworkstate_constructors.jl:113-143` — the symmetric
    square-root factorization of the Boltzmann matrix is distributed onto the
    vertices.
    """
    if Js is None:
        Js = {frozenset(e): 1.0 for e in g.edges()}
    else:
        Js = {frozenset(e): j for e, j in Js.items()}
    links = {frozenset(e): Index(2, "Link") for e in g.edges()}
    sqrt_Ws = {}
    for e in g.edges():
        key = frozenset(e)
        arg = beta * Js[key]
        arg = complex(arg) if np.real(arg) < 0 else arg
        lam1, lam2 = np.cosh(arg), np.sinh(arg)
        alpha = 0.5 * (np.sqrt(lam1) + np.sqrt(lam2))
        phi = 0.5 * (np.sqrt(lam1) - np.sqrt(lam2))
        sqrt_W = np.sqrt(2.0) * np.array([[alpha, phi], [phi, alpha]], dtype=np.complex128)
        W = np.array([[np.exp(arg), np.exp(-arg)], [np.exp(-arg), np.exp(arg)]], dtype=np.complex128)
        if not np.allclose(sqrt_W @ sqrt_W, W, atol=1e-10):
            raise AssertionError("sqrt Boltzmann factorization failed")
        sqrt_Ws[key] = sqrt_W
    tensors = {}
    for v in g.vertices():
        es = [frozenset((v, u)) for u in g.neighbors(v)]
        t = delta([links[k] for k in es], dtype=np.complex128)
        for k in es:
            l = links[k]
            t = (from_matrix(sqrt_Ws[k], [l.prime()], [l]) * t).noprime()
        tensors[v] = t
    return TensorNetwork(tensors, g.copy())
