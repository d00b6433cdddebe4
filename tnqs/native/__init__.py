"""Native (C++) runtime components, loaded via ctypes.

The compute path is JAX/XLA; these are the *host-side runtime* pieces —
currently the contraction-order planner (`contract_opt.cpp`), the native
replacement for the reference's OMEinsumContractionOrders.jl dependency
(`/root/reference/src/contraction_sequences.jl`).

The shared library is built on demand with g++ (see :func:`build`) and
cached next to the sources.  Everything degrades gracefully: if no compiler
is available or the build fails, ``LIB`` is ``None`` and callers fall back
to the pure-Python planners.  Set ``TNQS_NO_NATIVE=1`` to force the
fallback.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import sys

_DIR = pathlib.Path(__file__).resolve().parent
_SRCS = [_DIR / "contract_opt.cpp", _DIR / "loop_enum.cpp"]
_SO = _DIR / "libtnqs_native.so"

LIB = None


def build(force: bool = False) -> bool:
    """Compile the native library.  Returns True if the .so is usable."""
    if (
        _SO.exists()
        and not force
        and all(_SO.stat().st_mtime >= s.stat().st_mtime for s in _SRCS)
    ):
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", str(_SO)]
            + [str(s) for s in _SRCS],
            check=True,
            capture_output=True,
            timeout=180,
        )
        return True
    except Exception as e:  # missing compiler, sandboxed fs, ...
        print(f"tnqs.native: build skipped ({type(e).__name__})", file=sys.stderr)
        return False


def _load():
    global LIB
    if os.environ.get("TNQS_NO_NATIVE"):
        return
    if not build():
        return
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return
    lib.tnqs_optimal_order.restype = ctypes.c_int
    lib.tnqs_optimal_order.argtypes = [
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.tnqs_greedy_order.restype = ctypes.c_int
    lib.tnqs_greedy_order.argtypes = lib.tnqs_optimal_order.argtypes
    lib.tnqs_sa_order.restype = ctypes.c_int
    lib.tnqs_sa_order.argtypes = [
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
        ctypes.c_double,
        ctypes.c_uint64,
    ]
    lib.tnqs_leafless_subgraphs.restype = ctypes.c_int64
    lib.tnqs_leafless_subgraphs.argtypes = [
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    LIB = lib


_load()


def have_native() -> bool:
    return LIB is not None


def _pack_masks(index_sets, index_order):
    """Bitmask-encode index sets over the given index universe."""
    import numpy as np

    m = len(index_order)
    w = max(1, (m + 63) // 64)
    pos = {i: p for p, i in enumerate(index_order)}
    masks = np.zeros((len(index_sets), w), dtype=np.uint64)
    for k, s in enumerate(index_sets):
        for i in s:
            p = pos[i]
            masks[k, p // 64] |= np.uint64(1) << np.uint64(p % 64)
    return masks, w, m


def optimal_order(index_sets, dims) -> list | None:
    """Exact-DP contraction tree (nested 1-based list) or None on failure.

    `index_sets`: list of iterables of hashable index keys; `dims`: dict
    key -> dimension.  Requires every index on at most two tensors."""
    import math

    import numpy as np

    if LIB is None:
        return None
    n = len(index_sets)
    if n < 2 or n > 20:
        return None
    index_order = list(dims.keys())
    masks, w, m = _pack_masks(index_sets, index_order)
    logdims = np.zeros(w * 64, dtype=np.float64)
    for p, i in enumerate(index_order):
        logdims[p] = math.log(float(dims[i]))
    out = np.zeros(1 << n, dtype=np.int32)
    rc = LIB.tnqs_optimal_order(
        n,
        w,
        masks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        logdims.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        m,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        return None

    def tree(mask: int):
        if mask & (mask - 1) == 0:
            return mask.bit_length()  # 1-based leaf position
        sub = int(out[mask])
        return [tree(sub), tree(mask ^ sub)]

    return tree((1 << n) - 1)


def greedy_order(index_sets, dims) -> list | None:
    """Greedy contraction tree (nested 1-based list) or None on failure."""
    import math

    import numpy as np

    if LIB is None:
        return None
    n = len(index_sets)
    if n < 2:
        return None
    index_order = list(dims.keys())
    masks, w, m = _pack_masks(index_sets, index_order)
    logdims = np.zeros(w * 64, dtype=np.float64)
    for p, i in enumerate(index_order):
        logdims[p] = math.log(float(dims[i]))
    out = np.zeros(2 * (n - 1), dtype=np.int32)
    rc = LIB.tnqs_greedy_order(
        n,
        w,
        masks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        logdims.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        m,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        return None
    nodes: dict[int, object] = {k: k + 1 for k in range(n)}
    nid = n
    for s in range(n - 1):
        a, b = int(out[2 * s]), int(out[2 * s + 1])
        nodes[nid] = [nodes.pop(a), nodes.pop(b)]
        nid += 1
    return nodes[nid - 1]


def leafless_subgraphs(n_vertices, edge_pairs, max_edges) -> list | None:
    """Native enumeration of leafless edge-induced subgraphs.

    `edge_pairs`: list of (u_idx, v_idx) int pairs over 0..n_vertices-1.
    Returns a list of edge-index lists, or None if unavailable."""
    import numpy as np

    if LIB is None:
        return None
    ne = len(edge_pairs)
    if ne == 0 or ne > 1024:
        return None
    edges = np.asarray(edge_pairs, dtype=np.int32).reshape(ne, 2)
    cap = 1 << 20
    while True:
        out = np.zeros(cap, dtype=np.int32)
        written = ctypes.c_int64(0)
        rc = LIB.tnqs_leafless_subgraphs(
            int(n_vertices),
            ne,
            edges.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            int(max_edges),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            cap,
            ctypes.byref(written),
        )
        if rc == -2:
            cap *= 8
            if cap > (1 << 28):
                return None
            continue
        if rc < 0:
            return None
        break
    result = []
    pos = 0
    for _ in range(rc):
        cnt = int(out[pos])
        pos += 1
        result.append([int(x) for x in out[pos : pos + cnt]])
        pos += cnt
    return result


def sa_order(index_sets, dims, n_restarts: int = 32, temperature: float = 1.0, seed: int = 0) -> list | None:
    """Stochastic-greedy contraction tree with restarts (TreeSA-class)."""
    import math

    import numpy as np

    if LIB is None:
        return None
    n = len(index_sets)
    if n < 2:
        return None
    index_order = list(dims.keys())
    masks, w, m = _pack_masks(index_sets, index_order)
    logdims = np.zeros(w * 64, dtype=np.float64)
    for p, i in enumerate(index_order):
        logdims[p] = math.log(float(dims[i]))
    out = np.zeros(2 * (n - 1), dtype=np.int32)
    rc = LIB.tnqs_sa_order(
        n,
        w,
        masks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        logdims.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        m,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        int(n_restarts),
        float(temperature),
        int(seed),
    )
    if rc != 0:
        return None
    nodes: dict[int, object] = {k: k + 1 for k in range(n)}
    nid = n
    for s in range(n - 1):
        a, b = int(out[2 * s]), int(out[2 * s + 1])
        nodes[nid] = [nodes.pop(a), nodes.pop(b)]
        nid += 1
    return nodes[nid - 1]
