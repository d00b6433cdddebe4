"""Named graphs, lattice generators and graph algorithms.

TPU-native replacement for the NamedGraphs.jl layer of the reference package
(`/root/reference/Project.toml:15`; generators used in
`src/graph_ops.jl`, algorithms used throughout `src/MessagePassing/`).
Vertices are arbitrary hashable Python objects (lattice generators produce
1-based coordinate tuples, matching the reference's naming so that e.g. the
central site of ``heavy_hexagonal_lattice(5, 5)`` is ``(11, 5)``).

Everything here runs at "plan time" on the host: the graph structure, sweep
schedules, edge colorings, and partitionings are static data that parametrize
the compiled TPU programs.
"""

from __future__ import annotations

import itertools
from collections import OrderedDict, deque
from typing import Any, Hashable, Iterable, Sequence

import networkx as nx

Vertex = Hashable
Edge = tuple  # directed edge (src, dst)


def reverse_edge(e: Edge) -> Edge:
    return (e[1], e[0])


def src(e: Edge):
    return e[0]


def dst(e: Edge):
    return e[1]


class NamedGraph:
    """A simple undirected graph with named (hashable) vertices.

    Insertion order of vertices and edges is preserved (mirrors the ordered
    `Dictionary`-based NamedGraphs behaviour the reference relies on for
    deterministic sweeps).
    """

    def __init__(self, vertices: Iterable[Vertex] = ()):
        self._adj: "OrderedDict[Vertex, OrderedDict[Vertex, None]]" = OrderedDict()
        self._edges: "OrderedDict[tuple, None]" = OrderedDict()
        for v in vertices:
            self.add_vertex(v)

    # -- construction --------------------------------------------------
    def add_vertex(self, v: Vertex) -> "NamedGraph":
        if v not in self._adj:
            self._adj[v] = OrderedDict()
        return self

    def add_edge(self, u: Vertex, v: Vertex) -> "NamedGraph":
        if u == v:
            raise ValueError("self-loops not supported")
        self.add_vertex(u)
        self.add_vertex(v)
        if not self.has_edge(u, v):
            self._adj[u][v] = None
            self._adj[v][u] = None
            self._edges[(u, v)] = None
        return self

    def add_edges(self, edges: Iterable[Edge]) -> "NamedGraph":
        for u, v in edges:
            self.add_edge(u, v)
        return self

    def rem_edge(self, u: Vertex, v: Vertex) -> "NamedGraph":
        if self.has_edge(u, v):
            del self._adj[u][v]
            del self._adj[v][u]
            self._edges.pop((u, v), None)
            self._edges.pop((v, u), None)
        return self

    def rem_vertex(self, v: Vertex) -> "NamedGraph":
        for u in list(self._adj.get(v, ())):
            self.rem_edge(u, v)
        self._adj.pop(v, None)
        return self

    def copy(self) -> "NamedGraph":
        g = NamedGraph()
        g._adj = OrderedDict((v, OrderedDict(nbrs)) for v, nbrs in self._adj.items())
        g._edges = OrderedDict(self._edges)
        return g

    # -- queries -------------------------------------------------------
    def vertices(self) -> list:
        return list(self._adj.keys())

    def edges(self) -> list[Edge]:
        return list(self._edges.keys())

    def all_edges(self) -> list[Edge]:
        """Both orientations of every edge."""
        es = self.edges()
        return es + [reverse_edge(e) for e in es]

    def has_vertex(self, v) -> bool:
        try:
            return v in self._adj
        except TypeError:  # unhashable candidate (e.g. a list of vertices)
            return False

    def has_edge(self, u, v) -> bool:
        return v in self._adj.get(u, ())

    def neighbors(self, v) -> list:
        return list(self._adj[v].keys())

    def degree(self, v) -> int:
        return len(self._adj[v])

    def nv(self) -> int:
        return len(self._adj)

    def ne(self) -> int:
        return len(self._edges)

    def incident_edges(self, v, dir: str = "out") -> list[Edge]:
        """Edges touching `v`, oriented out of (`dir="out"`) or into `v`."""
        if dir == "out":
            return [(v, u) for u in self.neighbors(v)]
        return [(u, v) for u in self.neighbors(v)]

    def __contains__(self, v):
        return self.has_vertex(v)

    def __eq__(self, other):
        if not isinstance(other, NamedGraph):
            return NotImplemented
        if set(self._adj) != set(other._adj):
            return False
        mine = {frozenset(e) for e in self._edges}
        theirs = {frozenset(e) for e in other._edges}
        return mine == theirs

    def __hash__(self):  # pragma: no cover - graphs rarely used as keys
        return hash((frozenset(self._adj), frozenset(frozenset(e) for e in self._edges)))

    def __repr__(self):
        return f"NamedGraph({self.nv()} vertices, {self.ne()} edges)"

    # -- conversions ---------------------------------------------------
    def to_networkx(self) -> "nx.Graph":
        g = nx.Graph()
        g.add_nodes_from(self.vertices())
        g.add_edges_from(self.edges())
        return g

    @staticmethod
    def from_networkx(g: "nx.Graph") -> "NamedGraph":
        out = NamedGraph(g.nodes())
        out.add_edges(g.edges())
        return out

    def subgraph(self, vertices: Iterable[Vertex]) -> "NamedGraph":
        vs = set(vertices)
        out = NamedGraph([v for v in self.vertices() if v in vs])
        for u, v in self.edges():
            if u in vs and v in vs:
                out.add_edge(u, v)
        return out

    def rename_vertices(self, f) -> "NamedGraph":
        out = NamedGraph(f(v) for v in self.vertices())
        for u, v in self.edges():
            out.add_edge(f(u), f(v))
        return out


# ----------------------------------------------------------------------
# basic algorithms
# ----------------------------------------------------------------------

def is_connected(g: NamedGraph) -> bool:
    if g.nv() == 0:
        return True
    return len(connected_components(g)[0]) == g.nv()


def connected_components(g: NamedGraph) -> list[list]:
    seen: set = set()
    comps = []
    for s in g.vertices():
        if s in seen:
            continue
        comp = []
        stack = [s]
        seen.add(s)
        while stack:
            v = stack.pop()
            comp.append(v)
            for u in g.neighbors(v):
                if u not in seen:
                    seen.add(u)
                    stack.append(u)
        comps.append(comp)
    comps.sort(key=len, reverse=True)
    return comps


def is_tree(g: NamedGraph) -> bool:
    return g.nv() >= 1 and g.ne() == g.nv() - 1 and is_connected(g)


def is_line_graph(g: NamedGraph) -> bool:
    """True if `g` is a path (open line).  Reference: `src/utils.jl:2-10`."""
    n = g.nv()
    if n == 1:
        return True
    if not is_tree(g):
        return False
    ds = sorted(g.degree(v) for v in g.vertices())
    return ds == [1, 1] + [2] * (n - 2)


def is_ring_graph(g: NamedGraph) -> bool:
    """True if `g` is a single cycle.  Reference: `src/utils.jl:12-16`."""
    if g.ne() == 0:
        return False
    h = g.copy()
    u, v = h.edges()[0]
    h.rem_edge(u, v)
    return is_line_graph(h)


def bfs_parents(g: NamedGraph, root) -> dict:
    parents = {root: None}
    q = deque([root])
    while q:
        v = q.popleft()
        for u in g.neighbors(v):
            if u not in parents:
                parents[u] = v
                q.append(u)
    return parents


def post_order_dfs_edges(g: NamedGraph, root) -> list[Edge]:
    """Edges of the tree containing `root`, child->parent in post-order.

    On a tree this is the exact BP schedule toward `root` (the reference uses
    NamedGraphs `post_order_dfs_edges`, e.g.
    `src/MessagePassing/boundarympscache.jl:340,507`).
    """
    edges = []
    visited = {root}

    def visit(v, parent):
        for u in g.neighbors(v):
            if u not in visited:
                visited.add(u)
                visit(u, v)
        if parent is not None:
            edges.append((v, parent))

    visit(root, None)
    return edges


def a_star(g: NamedGraph, start, goal) -> list[Edge]:
    """Shortest path from start to goal as a list of directed edges."""
    if start == goal:
        return []
    parents = {start: None}
    q = deque([start])
    while q:
        v = q.popleft()
        if v == goal:
            break
        for u in g.neighbors(v):
            if u not in parents:
                parents[u] = v
                q.append(u)
    if goal not in parents:
        raise ValueError("no path between vertices")
    path = []
    v = goal
    while parents[v] is not None:
        path.append((parents[v], v))
        v = parents[v]
    return list(reversed(path))


def leaf_vertices(g: NamedGraph) -> list:
    return [v for v in g.vertices() if g.degree(v) == 1]


def center(g: NamedGraph) -> list:
    """Graph center (vertices of minimum eccentricity)."""
    return list(nx.center(g.to_networkx()))


def eccentricity_ordered_vertices(g: NamedGraph) -> list:
    ecc = nx.eccentricity(g.to_networkx())
    return sorted(g.vertices(), key=lambda v: ecc[v])


def boundary_edges(g: NamedGraph, vertices: Sequence, dir: str = "in") -> list[Edge]:
    """Edges crossing the boundary of `vertices`.

    `dir="in"`: oriented (outside -> inside); `dir="out"`: (inside -> outside).
    Mirrors NamedGraphs `boundary_edges` as used by `incoming_messages`
    (`src/MessagePassing/abstractbeliefpropagationcache.jl:150-156`).
    """
    inside = set(vertices)
    out = []
    for v in g.vertices():
        if v not in inside:
            continue
        for u in g.neighbors(v):
            if u not in inside:
                out.append((u, v) if dir == "in" else (v, u))
    return out


def steiner_tree(g: NamedGraph, terminals: Sequence) -> NamedGraph:
    """Approximate Steiner tree containing `terminals` (exact on trees)."""
    t = nx.algorithms.approximation.steiner_tree(g.to_networkx(), list(terminals))
    out = NamedGraph(t.nodes())
    out.add_edges(t.edges())
    for v in terminals:
        out.add_vertex(v)
    return out


# ----------------------------------------------------------------------
# forest cover & BP edge sequences
# ----------------------------------------------------------------------

def spanning_forest(g: NamedGraph) -> NamedGraph:
    """A spanning forest (BFS tree per connected component)."""
    f = NamedGraph(g.vertices())
    for comp in connected_components(g):
        parents = bfs_parents(g, comp[0])
        for v, p in parents.items():
            if p is not None:
                f.add_edge(p, v)
    return f


def forest_cover(g: NamedGraph) -> list[NamedGraph]:
    """A set of spanning forests that together cover every edge of `g`."""
    remaining = set(map(frozenset, g.edges()))
    forests = []
    while remaining:
        f = NamedGraph(g.vertices())
        # greedily build a forest from uncovered edges first, then fill with
        # covered edges to span as much as possible
        parent = {v: v for v in g.vertices()}

        def find(v):
            while parent[v] != v:
                parent[v] = parent[parent[v]]
                v = parent[v]
            return v

        def union(u, v):
            ru, rv = find(u), find(v)
            if ru == rv:
                return False
            parent[rv] = ru
            return True

        for e in g.edges():
            if frozenset(e) in remaining and union(*e):
                f.add_edge(*e)
                remaining.discard(frozenset(e))
        for e in g.edges():
            if union(*e):
                f.add_edge(*e)
        forests.append(f)
    if not forests:
        forests.append(NamedGraph(g.vertices()))
    return forests


def forest_cover_edge_sequence(g: NamedGraph) -> list[Edge]:
    """BP sweep schedule from a forest cover of `g`.

    For each forest and each of its trees: a leaf-to-root post-order pass
    followed by the root-to-leaf reversed pass.  On a tree this makes a
    single BP iteration exact; on loopy graphs it is the sequential schedule
    the reference iterates (`src/MessagePassing/beliefpropagationcache.jl:28`).
    """
    seq: list[Edge] = []
    for forest in forest_cover(g):
        for comp in connected_components(forest):
            if len(comp) == 1:
                continue
            tree = forest.subgraph(comp)
            root = comp[len(comp) // 2]
            up = post_order_dfs_edges(tree, root)
            seq.extend(up)
            seq.extend(reverse_edge(e) for e in reversed(up))
    return seq


# ----------------------------------------------------------------------
# edge coloring (gate batching)
# ----------------------------------------------------------------------

def _axis_parity_edge_color(g: NamedGraph) -> list[list[Edge]] | None:
    """Structured coloring for integer-coordinate lattices: color by
    (axis, parity of the lower coordinate), giving exactly 2*ndim colors on
    open hypercubic grids.  Returns None if the graph is not of that form or
    the coloring is improper."""
    groups: dict[tuple, list[Edge]] = {}
    for (u, v) in g.edges():
        if not (isinstance(u, tuple) and isinstance(v, tuple) and len(u) == len(v)):
            return None
        diffs = [k for k in range(len(u)) if u[k] != v[k]]
        if len(diffs) != 1:
            return None
        k = diffs[0]
        a, b = u[k], v[k]
        if not (isinstance(a, int) and isinstance(b, int)):
            return None
        if abs(a - b) == 1:
            key = (k, min(a, b) % 2)
        else:
            key = (k, 2)  # periodic wrap edge
        groups.setdefault(key, []).append((u, v))
    for gr in groups.values():
        touched = [v for e in gr for v in e]
        if len(touched) != len(set(touched)):
            return None
    return [groups[k] for k in sorted(groups.keys())]


def _bipartition(g: NamedGraph) -> dict | None:
    """2-color the vertices by BFS, or None if the graph has an odd cycle."""
    side: dict = {}
    for s in g.vertices():
        if s in side:
            continue
        side[s] = 0
        queue = [s]
        while queue:
            v = queue.pop()
            for u in g.neighbors(v):
                if u not in side:
                    side[u] = 1 - side[v]
                    queue.append(u)
                elif side[u] == side[v]:
                    return None
    return side


def _koenig_edge_color(g: NamedGraph) -> dict | None:
    """Δ-edge-coloring of a bipartite graph (Kőnig's theorem, constructive
    alternating-path proof).  Returns {frozenset(edge): color} or None if the
    graph is not bipartite."""
    if _bipartition(g) is None:
        return None
    delta = max((len(g.neighbors(v)) for v in g.vertices()), default=0)
    # at[v][c] = neighbor joined to v by a c-colored edge (or absent)
    at: dict = {v: {} for v in g.vertices()}

    def free(v) -> int:
        for c in range(delta):
            if c not in at[v]:
                return c
        raise AssertionError("no free color at vertex")  # pragma: no cover

    color: dict = {}
    for (u, v) in g.edges():
        cu, cv = free(u), free(v)
        if cu != cv:
            # flip the maximal cu/cv alternating path starting at v with a
            # cu edge; in a bipartite graph it cannot reach u (u sits on the
            # wrong side for every cu arrival and has no cu edge), so after
            # the flip cu is free at both endpoints.
            path = []
            at_v, want = v, cu
            while want in at[at_v]:
                nxt = at[at_v][want]
                path.append((at_v, nxt, want))
                at_v, want = nxt, (cv if want == cu else cu)
            for a, b, c in path:
                del at[a][c]
                del at[b][c]
            for a, b, c in path:
                newc = cv if c == cu else cu
                color[frozenset((a, b))] = newc
                at[a][newc] = b
                at[b][newc] = a
        fs = frozenset((u, v))
        color[fs] = cu
        at[u][cu] = v
        at[v][cu] = u
    return color


def edge_color(g: NamedGraph, num_colors: int | None = None) -> list[list[Edge]]:
    """Proper edge coloring: partition edges into matchings.

    Bipartite graphs (every lattice used in practice: grids, hex, heavy-hex,
    Lieb, combs — edge subdivision preserves bipartiteness) get an exact
    Δ-coloring via Kőnig's alternating-path construction; otherwise the
    Misra–Gries proof of Vizing's theorem guarantees ≤ Δ+1.  Replaces
    `SimpleGraphAlgorithms.edge_color` (`src/imports.jl:9`, used for
    commuting-gate batching, `docs/src/gates.md:20-28`).  Like the
    reference's `edge_color(g, k)`, if `num_colors` is given and the
    construction needs more colors, a ValueError is raised rather than
    silently regrouping.  For integer-coordinate lattices a structured
    axis/parity coloring (exactly Δ colors on open grids) is tried first.
    """
    structured = _axis_parity_edge_color(g)
    kcol = _koenig_edge_color(g)
    if kcol is not None:
        ncol = 1 + max(kcol.values(), default=-1)
        kgroups: list[list[Edge]] = [[] for _ in range(ncol)]
        for e in g.edges():
            kgroups[kcol[frozenset(e)]].append(e)
        kgroups = [gr for gr in kgroups if gr]
        for gr in kgroups:
            touched = [v for e in gr for v in e]
            assert len(touched) == len(set(touched))
        if structured is not None and len(structured) <= len(kgroups):
            kgroups = structured
        if num_colors is not None and len(kgroups) > num_colors:
            raise ValueError(
                f"graph is not {num_colors}-edge-colorable (needs {len(kgroups)})"
            )
        return kgroups
    color: dict[frozenset, int] = {}

    def colors_at(v) -> set:
        out = set()
        for u in g.neighbors(v):
            c = color.get(frozenset((v, u)))
            if c is not None:
                out.add(c)
        return out

    def free_color(v) -> int:
        used = colors_at(v)
        c = 0
        while c in used:
            c += 1
        return c

    def edge_with_color(v, c, exclude=None):
        for u in g.neighbors(v):
            if u == exclude:
                continue
            if color.get(frozenset((v, u))) == c:
                return u
        return None

    for (u0, v0) in g.edges():
        # maximal fan of u0 starting at v0: each next fan edge's current color
        # must be free at the previous fan vertex
        fan = [v0]
        while True:
            last = fan[-1]
            free_at_last = colors_at(last)
            extended = False
            for w in g.neighbors(u0):
                fs = frozenset((u0, w))
                if w in fan or fs not in color:
                    continue
                if color[fs] not in free_at_last:
                    fan.append(w)
                    extended = True
                    break
            if not extended:
                break
        c = free_color(u0)
        d = free_color(fan[-1])
        if c != d:
            # collect the maximal path from u0 alternating colors d, c, d, ...
            path_edges = []
            at, want, prev = u0, d, None
            while True:
                nxt = edge_with_color(at, want, exclude=prev)
                if nxt is None:
                    break
                path_edges.append(frozenset((at, nxt)))
                prev, at = at, nxt
                want = c if want == d else d
            # swap colors along the path
            for fs in path_edges:
                color[fs] = c if color[fs] == d else d
        # after inversion, find first fan vertex where d is free
        w_idx = len(fan) - 1
        for i, w in enumerate(fan):
            if d not in colors_at(w):
                w_idx = i
                break
        # rotate the fan prefix and color (u0, fan[w_idx]) with d
        for i in range(w_idx):
            color[frozenset((u0, fan[i]))] = color[frozenset((u0, fan[i + 1]))]
        color[frozenset((u0, fan[w_idx]))] = d

    ncol = 1 + max(color.values(), default=-1)
    groups: list[list[Edge]] = [[] for _ in range(ncol)]
    for e in g.edges():
        groups[color[frozenset(e)]].append(e)
    groups = [gr for gr in groups if gr]
    # sanity: proper coloring
    for gr in groups:
        touched = [v for e in gr for v in e]
        if len(touched) != len(set(touched)):  # pragma: no cover
            raise AssertionError("edge_color produced an improper coloring")
    if structured is not None and len(structured) <= len(groups):
        groups = structured
    if num_colors is not None and len(groups) > num_colors:
        raise ValueError(
            f"graph is not {num_colors}-edge-colorable (needs {len(groups)})"
        )
    return groups


# ----------------------------------------------------------------------
# partitioned graphs (boundary MPS supergraph)
# ----------------------------------------------------------------------

class PartitionedGraph:
    """A graph plus a partition of its vertices into named groups.

    Replacement for NamedGraphs `PartitionedGraph`
    (`src/MessagePassing/boundarympscache.jl:1-2,158-175`).  The quotient
    graph has one vertex per group and an edge whenever any member edge
    crosses between two groups.
    """

    def __init__(self, graph: NamedGraph, groups: dict):
        self.graph = graph
        self.groups = {k: list(vs) for k, vs in groups.items()}
        self.group_of = {}
        for k, vs in self.groups.items():
            for v in vs:
                self.group_of[v] = k
        q = NamedGraph(self.groups.keys())
        for u, v in graph.edges():
            gu, gv = self.group_of[u], self.group_of[v]
            if gu != gv:
                q.add_edge(gu, gv)
        self.quotient = q

    def copy(self) -> "PartitionedGraph":
        return PartitionedGraph(self.graph.copy(), {k: list(v) for k, v in self.groups.items()})

    def vertices_of(self, group_key) -> list:
        return list(self.groups[group_key])

    def quotient_edge_of(self, e: Edge) -> Edge:
        return (self.group_of[e[0]], self.group_of[e[1]])


# ----------------------------------------------------------------------
# cycle / generalized-loop enumeration (loop corrections)
# ----------------------------------------------------------------------

def unique_simple_cycles(g: NamedGraph, max_length: int) -> list[list[Edge]]:
    """All simple cycles of length <= max_length, as edge lists."""
    out = []
    for cyc in nx.simple_cycles(g.to_networkx(), length_bound=max_length):
        if len(cyc) < 3:
            continue
        edges = [(cyc[i], cyc[(i + 1) % len(cyc)]) for i in range(len(cyc))]
        out.append(edges)
    return out


def _is_leafless(edge_set: Iterable[frozenset]) -> bool:
    deg: dict = {}
    for e in edge_set:
        for v in e:
            deg[v] = deg.get(v, 0) + 1
    return all(d >= 2 for d in deg.values())


def _connected_leafless_subgraphs(g: NamedGraph, max_edges: int) -> list[frozenset]:
    """All connected edge-induced subgraphs with <= max_edges edges and no
    degree-1 vertices (the configurations of the BP loop series;
    reference: NamedGraphs `leafless_edge_induced_subgraphs` used by
    `src/MessagePassing/loopcorrection.jl:10-11`)."""
    edge_list = [frozenset(e) for e in g.edges()]
    edge_index = {e: i for i, e in enumerate(edge_list)}
    incident: dict = {}
    for e in edge_list:
        for v in e:
            incident.setdefault(v, []).append(e)

    results: set[frozenset] = set()
    seen_states: set[frozenset] = set()

    def n_leaves(es: set) -> int:
        deg: dict = {}
        for e in es:
            for v in e:
                deg[v] = deg.get(v, 0) + 1
        return sum(1 for d in deg.values() if d == 1)

    def grow(current: set, frontier: set):
        key = frozenset(current)
        if key in seen_states:
            return
        seen_states.add(key)
        if len(current) >= 3 and _is_leafless(current):
            results.add(key)
        if len(current) >= max_edges:
            return
        # each added edge can repair at most two degree-1 vertices, so prune
        # states that cannot become leafless within the edge budget
        if len(current) + (n_leaves(current) + 1) // 2 > max_edges:
            return
        min_idx = min(edge_index[e] for e in current)
        for e in list(frontier):
            if e in current:
                continue
            if edge_index[e] < min_idx:
                continue  # canonical: only grow with edges >= the seed edge
            new_frontier = set(frontier)
            for v in e:
                for e2 in incident[v]:
                    new_frontier.add(e2)
            grow(current | {e}, new_frontier)

    for seed in edge_list:
        frontier = set()
        for v in seed:
            frontier.update(incident[v])
        grow({seed}, frontier)
    return sorted(results, key=lambda s: (len(s), sorted(map(sorted, map(list, s)))))


def leafless_edge_induced_subgraphs(g: NamedGraph, max_edges: int) -> list[list[Edge]]:
    """All (possibly disconnected) leafless edge-induced subgraphs with at
    most `max_edges` edges, as lists of edges.  Built from connected leafless
    subgraphs plus vertex-disjoint unions thereof.  Uses the native (C++)
    enumerator when available — the search is exponential in `max_edges`
    (12s in Python vs <0.5s native for a 5x5 grid at W=10)."""
    from . import native as _native

    if _native.have_native():
        verts = g.vertices()
        vidx = {v: i for i, v in enumerate(verts)}
        edge_list = g.edges()
        pairs = [(vidx[u], vidx[v]) for (u, v) in edge_list]
        subs = _native.leafless_subgraphs(len(verts), pairs, max_edges)
        if subs is not None:
            return [[edge_list[i] for i in es] for es in subs]
    connected = _connected_leafless_subgraphs(g, max_edges)
    results: set[frozenset] = set(map(frozenset, connected))

    def verts(es: frozenset) -> frozenset:
        return frozenset(v for e in es for v in e)

    # unions of vertex-disjoint connected components
    pool = list(connected)
    combos = list(results)
    frontier = [(c, verts(c)) for c in pool]
    grown = True
    current_level = frontier
    while grown:
        grown = False
        next_level = []
        for es, vs in current_level:
            for c in pool:
                if len(es) + len(c) > max_edges:
                    continue
                cvs = verts(c)
                if vs & cvs:
                    continue
                u = es | c
                if u not in results:
                    results.add(u)
                    next_level.append((u, vs | cvs))
                    grown = True
        current_level = next_level

    def to_edge_list(es: frozenset) -> list[Edge]:
        return [tuple(e) for e in es]

    return [to_edge_list(es) for es in sorted(results, key=lambda s: (len(s),))]


# ----------------------------------------------------------------------
# lattice generators (reference: `src/graph_ops.jl`, NamedGraphs generators)
# ----------------------------------------------------------------------

def named_grid(dims: Sequence[int], periodic=False) -> NamedGraph:
    """Hypercubic lattice with 1-based tuple vertex names.

    Mirrors NamedGraphs `named_grid` as used across the reference examples
    (`README.md:38`, `examples/3dIsing_dynamics.jl`).  `periodic` is a
    bool (all axes) or a per-axis sequence of bools — e.g.
    ``named_grid((6, 4), periodic=(True, False))`` is a cylinder, the
    ring-quotient geometry of the compiled boundary-MPS tier.
    """
    dims = tuple(int(d) for d in dims)
    # accept any non-string sequence (tuple/list/ndarray/...) as per-axis
    # flags; a bare ndarray previously fell into the scalar-bool branch and
    # raised an opaque truthiness error (advisor r4)
    if isinstance(periodic, str):
        raise TypeError(f"periodic must be a bool or sequence of bools, got {periodic!r}")
    try:
        per = tuple(bool(p) for p in periodic)  # type: ignore[union-attr]
    except TypeError:
        per = (bool(periodic),) * len(dims)
    if len(per) != len(dims):
        raise ValueError(f"periodic {periodic} does not match dims {dims}")
    if len(dims) == 1:
        vs = list(range(1, dims[0] + 1))
        g = NamedGraph(vs)
        for i in range(1, dims[0]):
            g.add_edge(i, i + 1)
        if per[0] and dims[0] > 2:
            g.add_edge(dims[0], 1)
        return g
    vs = list(itertools.product(*[range(1, d + 1) for d in dims]))
    g = NamedGraph(vs)
    for v in vs:
        for k, d in enumerate(dims):
            if v[k] < d:
                u = list(v)
                u[k] += 1
                g.add_edge(v, tuple(u))
            elif per[k] and d > 2:
                u = list(v)
                u[k] = 1
                g.add_edge(v, tuple(u))
    return g


def named_path_graph(n: int) -> NamedGraph:
    return named_grid((n,))


def named_ring_graph(n: int) -> NamedGraph:
    return named_grid((n,), periodic=True)


def named_comb_tree(dims: Sequence[int]) -> NamedGraph:
    """Comb tree: a backbone path with teeth (NamedGraphs `named_comb_tree`)."""
    nx_, ny_ = dims
    g = NamedGraph(itertools.product(range(1, nx_ + 1), range(1, ny_ + 1)))
    for i in range(1, nx_):
        g.add_edge((i, 1), ((i + 1), 1))
    for i in range(1, nx_ + 1):
        for j in range(1, ny_):
            g.add_edge((i, j), (i, j + 1))
    return g


def named_hexagonal_lattice_graph(m: int, n: int, periodic: bool = False) -> NamedGraph:
    """Hexagonal (honeycomb) lattice with 1-based ``(row, col)`` names.

    Mirrors NamedGraphs `named_hexagonal_lattice_graph` (which follows the
    networkx construction) so that `heavy_hexagonal_lattice(5, 5)` has the
    reference's vertex names (`examples/heavyhexIsing_dynamics.jl:6,49`).
    """
    gx = nx.hexagonal_lattice_graph(m, n, periodic=periodic)
    # networkx nodes are (col, row) 0-based; rename to (row, col) 1-based
    mapping = {v: (v[1] + 1, v[0] + 1) for v in gx.nodes()}
    g = NamedGraph(sorted(mapping.values()))
    for u, v in gx.edges():
        g.add_edge(mapping[u], mapping[v])
    return g


def heavy_hexagonal_lattice(nx_: int, ny_: int) -> NamedGraph:
    """Heavy-hexagonal lattice (IBM topology): hexagonal lattice with an
    extra vertex on every edge.  Reference: `src/graph_ops.jl:6-18`."""
    g = named_hexagonal_lattice_graph(nx_, ny_)
    g = g.rename_vertices(lambda v: (2 * v[0] - 1, 2 * v[1] - 1))
    out = NamedGraph(g.vertices())
    for u, v in g.edges():
        mid = ((u[0] + v[0]) / 2, (u[1] + v[1]) / 2)
        mid = tuple(int(x) if float(x).is_integer() else x for x in mid)
        out.add_vertex(mid)
        out.add_edge(u, mid)
        out.add_edge(mid, v)
    return out


def eagle_lattice() -> NamedGraph:
    """IBM Eagle 127-qubit heavy-hex coupling graph (ibm_washington /
    ibm_kyiv family) — the lattice of the kicked-Ising utility experiment
    simulated by the reference (Tindall et al., PRX Quantum 5, 010308
    (2024); reference `examples/heavyhexIsing_dynamics.jl`,
    `README.md:277`): 127 vertices, 144 edges.

    Unlike ``heavy_hexagonal_lattice(nx, ny)`` (reference
    `src/graph_ops.jl:6-18`, rectangular hex patch — 164 qubits at (5,5)),
    the Eagle device clips the boundary rows: qubit rows 1 and 13 have 14
    sites (columns 1-14 and 2-15 respectively), interior rows 3,5,7,9,11
    have 15, and the six connector rows between them have 4 qubits each,
    below columns {1,5,9,13} or {3,7,11,15} alternately.  Vertices are
    1-based ``(row, col)`` tuples; row parity odd = chain rows, even =
    connector rows.
    """
    g = NamedGraph([])
    # chain rows (0-based row index 0..12 even), then 1-base the names
    row_cols = {0: range(0, 14), 12: range(1, 15)}
    for r in (2, 4, 6, 8, 10):
        row_cols[r] = range(0, 15)
    for r, cols in row_cols.items():
        cols = list(cols)
        for c in cols:
            g.add_vertex((r + 1, c + 1))
        for c in cols[:-1]:
            g.add_edge((r + 1, c + 1), (r + 1, c + 2))
    # connector rows: 1,5,9 attach at columns {0,4,8,12}; 3,7,11 at {2,6,10,14}
    for r in (1, 3, 5, 7, 9, 11):
        attach = (0, 4, 8, 12) if r % 4 == 1 else (2, 6, 10, 14)
        for c in attach:
            g.add_vertex((r + 1, c + 1))
            g.add_edge((r, c + 1), (r + 1, c + 1))
            g.add_edge((r + 1, c + 1), (r + 2, c + 1))
    assert g.nv() == 127 and g.ne() == 144
    return g


def lieb_lattice(nx_: int, ny_: int, periodic: bool = False) -> NamedGraph:
    """Lieb lattice: square lattice with decorated edges.

    Reference: `src/graph_ops.jl:25-35`.
    """
    ok = (not periodic and nx_ % 2 == 1 and ny_ % 2 == 1) or (
        periodic and nx_ % 2 == 0 and ny_ % 2 == 0
    )
    if not ok:
        raise ValueError("lieb_lattice: need odd dims (open) or even dims (periodic)")
    g = named_grid((nx_, ny_), periodic=periodic)
    for v in list(g.vertices()):
        if v[0] % 2 == 0 and v[1] % 2 == 0:
            g.rem_vertex(v)
    return g


def topology_to_graph(topology: Sequence[Sequence[int]]) -> NamedGraph:
    """Graph from a list of integer edge pairs (reference `topologytograph`,
    `src/graph_ops.jl:37-46`)."""
    nq = max(max(pair) for pair in topology)
    g = NamedGraph(range(1, nq + 1))
    for i, j in topology:
        g.add_edge(i, j)
    return g


def build_graph_from_gates(circuit: Sequence) -> NamedGraph:
    """Graph induced by the 2-site gates of a circuit.

    Reference: `src/graph_ops.jl:50-66`; errors on disconnected circuits.
    """
    vs = []
    seen = set()
    for gate in circuit:
        for v in gate[1]:
            if v not in seen:
                seen.add(v)
                vs.append(v)
    g = NamedGraph(vs)
    for gate in circuit:
        qubits = list(gate[1])
        if len(qubits) == 2:
            g.add_edge(qubits[0], qubits[1])
    if not is_connected(g):
        raise ValueError(
            "The circuit graph is not connected; the resulting tensor network "
            "would be disconnected, which is not supported. Simulate the "
            "connected components separately."
        )
    return g


build_graph_from_circuit = build_graph_from_gates
