"""Checkpoint / resume for states, BP caches, and compiled engines.

The reference has no persistence layer at all (SURVEY.md §5: states are plain
value types left to Julia serialization).  Here states are pytree-like
containers of dense arrays, so checkpointing is a first-class subsystem:
everything serializes to a single ``.npz`` file (arrays) plus an embedded JSON
header (graph topology, index identities, site metadata).  Index identity is
preserved *relationally* — indices shared between tensors (bonds) or between
a state and its BP messages come back as the same :class:`~tnqs.core.index.Index`
objects, so a restored cache contracts exactly like the original.

Long-running evolutions checkpoint the compiled engine directly
(:func:`save_engine` / :func:`load_engine`): the packed per-degree bucket
tensors and the message array move to host once and restore without repacking.
"""

from __future__ import annotations

import io
import json
import pathlib

import numpy as np

from .core.index import Index
from .core.tensor import Tensor
from .graphs import NamedGraph

_VERSION = 1


# ----------------------------------------------------------------------
# vertex / index (de)serialization
# ----------------------------------------------------------------------

def _enc_vertex(v):
    if isinstance(v, tuple):
        return {"__t__": [_enc_vertex(x) for x in v]}
    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    raise TypeError(f"cannot serialize vertex of type {type(v)!r}")


def _dec_vertex(o):
    if isinstance(o, dict) and "__t__" in o:
        return tuple(_dec_vertex(x) for x in o["__t__"])
    return o


def _enc_index(i: Index):
    return [i.id, i.dim, i.tag, i.plev]


class _IndexTable:
    """Maps saved index ids to freshly allocated Index objects, preserving
    shared identity (same saved id -> same restored base Index)."""

    def __init__(self):
        self._by_id: dict = {}

    def resolve(self, desc) -> Index:
        iid, dim, tag, plev = desc
        base = self._by_id.get(iid)
        if base is None:
            base = Index(dim=int(dim), tag=str(tag))
            self._by_id[iid] = base
        return base.setprime(int(plev))


def _enc_graph(g: NamedGraph):
    return {
        "vertices": [_enc_vertex(v) for v in g.vertices()],
        "edges": [[_enc_vertex(u), _enc_vertex(v)] for (u, v) in g.edges()],
    }


def _dec_graph(d) -> NamedGraph:
    g = NamedGraph(_dec_vertex(v) for v in d["vertices"])
    for u, v in d["edges"]:
        g.add_edge(_dec_vertex(u), _dec_vertex(v))
    return g


def _to_host(a) -> np.ndarray:
    if isinstance(a, np.ndarray):
        return a
    from .utils.transfer import device_get

    return np.asarray(device_get(a))


def _write_npz(path, header: dict, arrays: dict):
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, __meta__=np.frombuffer(json.dumps(header).encode(), dtype=np.uint8), **arrays)


def _read_npz(path):
    data = np.load(path, allow_pickle=False)
    header = json.loads(bytes(data["__meta__"].tobytes()).decode())
    if header.get("version", 0) > _VERSION:
        raise ValueError(f"checkpoint version {header['version']} is newer than supported {_VERSION}")
    return header, data


# ----------------------------------------------------------------------
# states / networks
# ----------------------------------------------------------------------

def save_state(psi, path) -> None:
    """Save a TensorNetwork / TensorNetworkState to ``path`` (.npz)."""
    verts = psi.vertices()
    header = {
        "version": _VERSION,
        "kind": type(psi).__name__,
        "graph": _enc_graph(psi.graph),
        "tensor_inds": [[_enc_index(i) for i in psi[v].inds] for v in verts],
    }
    site_inds = getattr(psi, "site_inds", None)
    if site_inds is not None:
        header["site_inds"] = [[_enc_index(i) for i in site_inds[v]] for v in verts]
    arrays = {f"t{n}": _to_host(psi[v].data) for n, v in enumerate(verts)}
    _write_npz(path, header, arrays)


def load_state(path):
    """Load a state saved by :func:`save_state`."""
    from .networks import TensorNetwork, TensorNetworkState

    header, data = _read_npz(path)
    table = _IndexTable()
    g = _dec_graph(header["graph"])
    verts = g.vertices()
    tensors = {}
    for n, v in enumerate(verts):
        inds = [table.resolve(d) for d in header["tensor_inds"][n]]
        tensors[v] = Tensor(data[f"t{n}"], inds)
    if header["kind"] == "TensorNetwork":
        return TensorNetwork(tensors, g)
    site_inds = None
    if "site_inds" in header:
        site_inds = {
            v: [table.resolve(d) for d in header["site_inds"][n]] for n, v in enumerate(verts)
        }
    return TensorNetworkState(tensors, g, site_inds)


# ----------------------------------------------------------------------
# BP caches (state + converged messages)
# ----------------------------------------------------------------------

def save_bp_cache(bpc, path) -> None:
    """Save a BeliefPropagationCache: the wrapped network plus every stored
    message, with bond-index identity shared between the two."""
    psi = bpc.network
    verts = psi.vertices()
    msg_edges = list(bpc.messages.keys())
    header = {
        "version": _VERSION,
        "kind": "BeliefPropagationCache",
        "network_kind": type(psi).__name__,
        "graph": _enc_graph(psi.graph),
        "tensor_inds": [[_enc_index(i) for i in psi[v].inds] for v in verts],
        "message_edges": [[_enc_vertex(u), _enc_vertex(v)] for (u, v) in msg_edges],
        "message_inds": [[_enc_index(i) for i in bpc.messages[e].inds] for e in msg_edges],
    }
    site_inds = getattr(psi, "site_inds", None)
    if site_inds is not None:
        header["site_inds"] = [[_enc_index(i) for i in site_inds[v]] for v in verts]
    arrays = {f"t{n}": _to_host(psi[v].data) for n, v in enumerate(verts)}
    for n, e in enumerate(msg_edges):
        arrays[f"m{n}"] = _to_host(bpc.messages[e].data)
    _write_npz(path, header, arrays)


def load_bp_cache(path):
    from .bp import BeliefPropagationCache
    from .networks import TensorNetwork, TensorNetworkState

    header, data = _read_npz(path)
    table = _IndexTable()
    g = _dec_graph(header["graph"])
    verts = g.vertices()
    tensors = {}
    for n, v in enumerate(verts):
        inds = [table.resolve(d) for d in header["tensor_inds"][n]]
        tensors[v] = Tensor(data[f"t{n}"], inds)
    if header["network_kind"] == "TensorNetwork":
        psi = TensorNetwork(tensors, g)
    else:
        site_inds = None
        if "site_inds" in header:
            site_inds = {
                v: [table.resolve(d) for d in header["site_inds"][n]]
                for n, v in enumerate(verts)
            }
        psi = TensorNetworkState(tensors, g, site_inds)
    messages = {}
    for n, (eu, ev) in enumerate(header["message_edges"]):
        e = (_dec_vertex(eu), _dec_vertex(ev))
        inds = [table.resolve(d) for d in header["message_inds"][n]]
        messages[e] = Tensor(data[f"m{n}"], inds)
    return BeliefPropagationCache(psi, messages)


# ----------------------------------------------------------------------
# compiled engine (packed buckets + message array)
# ----------------------------------------------------------------------

def save_engine(eng, path) -> None:
    """Save a LatticeEngine mid-evolution: graph, packing layout, the packed
    per-degree bucket tensors, and the BP message array."""
    header = {
        "version": _VERSION,
        "kind": "LatticeEngine",
        "graph": _enc_graph(eng.plan.graph),
        "chi": eng.chi,
        "d": eng.d,
        "dtype": np.dtype(eng.dtype).name,
        "buckets": sorted(int(k) for k in eng.T.keys()),
        # plan-shaping options: edge-id and bucket orderings depend on the
        # BP schedule, so restoring with a different schedule would silently
        # permute T rows and M messages (shapes still match)
        "bp_schedule": eng.plan.bp_schedule,
        "factor_method": eng.factor_method,
    }
    arrays = {f"b{k}": _to_host(arr) for k, arr in eng.T.items()}
    arrays["M"] = _to_host(eng.M)
    _write_npz(path, header, arrays)


def load_engine(path):
    """Restore a LatticeEngine.  The plan is rebuilt from the saved graph
    (vertex/edge insertion order is serialized, so the packing layout is
    reproduced exactly) and the packed arrays are loaded verbatim."""
    import jax.numpy as jnp

    from .engine import LatticeEngine
    from .networks import siteinds, zerostate
    from .utils.transfer import device_put

    header, data = _read_npz(path)
    g = _dec_graph(header["graph"])
    d = int(header["d"])
    sitetype = {2: "S=1/2", 3: "S=1"}.get(d)
    if sitetype is None:
        raise ValueError(f"unsupported site dimension {d}")
    psi = zerostate(g, siteinds(sitetype, g), dtype=np.dtype(header["dtype"]))
    eng = LatticeEngine(
        psi,
        chi=int(header["chi"]),
        dtype=jnp.dtype(header["dtype"]),
        # older checkpoints predate these fields; they were always written
        # by engines built with the defaults below
        factor_method=header.get("factor_method", "auto"),
        bp_schedule=header.get("bp_schedule", "wavefront"),
    )
    for k in header["buckets"]:
        saved = data[f"b{k}"]
        if eng.T[k].shape != saved.shape:
            raise ValueError(
                f"bucket {k} shape mismatch: saved {saved.shape}, rebuilt {eng.T[k].shape}"
            )
        eng.T[k] = device_put(saved)
    eng.M = device_put(data["M"])
    return eng
