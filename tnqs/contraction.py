"""Contraction-sequence optimization.

Replaces OMEinsumContractionOrders.jl in the reference
(`/root/reference/src/contraction_sequences.jl`).  Two algorithms:

* ``alg="optimal"`` — exact dynamic programming over subsets (the netcon-type
  search the reference gets from `ExhaustiveSearch`), used for the small local
  factor lists of BP message updates and regional contractions.  Falls back to
  greedy above `_OPTIMAL_MAX` tensors.
* ``alg="greedy"`` (alias ``"omeinsum"``) — pairwise greedy minimizing the
  intermediate size, used for whole-network exact contractions.

Sequences are nested lists of 1-based leaf positions, e.g. ``[[1, 3], 2]`` —
the same convention as the reference, so cached plans are directly
comparable.
"""

from __future__ import annotations

from math import prod
from typing import Sequence

from .core.index import Index
from .core.tensor import Tensor, contract as _contract
from . import native as _native

_OPTIMAL_MAX = 10
# the native DP prunes in C++; exhaustive search stays tractable further out
_OPTIMAL_MAX_NATIVE = 16
# hand whole-network greedy planning to C++ above this size
_GREEDY_NATIVE_MIN = 24


def _index_sets(tensors: Sequence[Tensor]) -> list[frozenset]:
    return [frozenset(t.inds) for t in tensors]


def _dims(tensors: Sequence[Tensor]) -> dict[Index, int]:
    out: dict[Index, int] = {}
    for t in tensors:
        for i in t.inds:
            out[i] = i.dim
    return out


def contraction_sequence(tensors: Sequence[Tensor], alg: str = "optimal", **kwargs):
    """Find a pairwise contraction tree for `tensors`."""
    n = len(tensors)
    if n == 0:
        raise ValueError("empty tensor list")
    if n == 1:
        return [1]
    if n == 2:
        return [1, 2]
    if alg == "optimal":
        if _native.have_native() and n <= _OPTIMAL_MAX_NATIVE:
            seq = _native.optimal_order(_index_sets(tensors), _dims(tensors))
            if seq is not None:
                return seq
        if n <= _OPTIMAL_MAX:
            return _optimal_sequence(tensors)
    if alg in ("sa", "treesa") and _native.have_native():
        # stochastic greedy with restarts (TreeSA-class annealing search)
        seq = _native.sa_order(
            _index_sets(tensors),
            _dims(tensors),
            n_restarts=int(kwargs.get("n_restarts", 32)),
            temperature=float(kwargs.get("temperature", 1.0)),
            seed=int(kwargs.get("seed", 0)),
        )
        if seq is not None:
            return seq
    if _native.have_native() and n >= _GREEDY_NATIVE_MIN:
        seq = _native.greedy_order(_index_sets(tensors), _dims(tensors))
        if seq is not None:
            return seq
    return _greedy_sequence(tensors)


def _result_inds(s1: frozenset, s2: frozenset) -> frozenset:
    # every index appears on at most two tensors in our networks, so the
    # result of a pairwise contraction keeps the symmetric difference
    return s1 ^ s2


def _optimal_sequence(tensors: Sequence[Tensor]):
    """Exact DP over subsets minimizing total multiply count."""
    n = len(tensors)
    sets = _index_sets(tensors)
    dimsz = _dims(tensors)

    def size(s: frozenset) -> int:
        return prod(dimsz[i] for i in s) if s else 1

    # best[mask] = (cost, inds, tree)
    best: dict[int, tuple[int, frozenset, object]] = {}
    for k in range(n):
        best[1 << k] = (0, sets[k], k + 1)

    full = (1 << n) - 1
    for mask in range(1, full + 1):
        if mask in best or mask & (mask - 1) == 0:
            continue
        entry = None
        sub = (mask - 1) & mask
        while sub > 0:
            other = mask ^ sub
            if sub < other:  # enumerate unordered pairs once
                if sub in best and other in best:
                    c1, s1, t1 = best[sub]
                    c2, s2, t2 = best[other]
                    union = s1 | s2
                    step = prod(dimsz[i] for i in union) if union else 1
                    cost = c1 + c2 + step
                    if entry is None or cost < entry[0]:
                        entry = (cost, _result_inds(s1, s2), [t1, t2])
            sub = (sub - 1) & mask
        if entry is not None:
            best[mask] = entry
    return best[full][2]


def _greedy_sequence(tensors: Sequence[Tensor]):
    """Greedy pairwise contraction minimizing (result size, step cost)."""
    n = len(tensors)
    sets = _index_sets(tensors)
    dimsz = _dims(tensors)

    def size(s: frozenset) -> int:
        return prod(dimsz[i] for i in s) if s else 1

    live = {k: (sets[k], k + 1) for k in range(n)}
    next_id = n
    while len(live) > 1:
        keys = list(live.keys())
        bestpair = None
        bestscore = None
        # prefer pairs that actually share indices
        for a_i in range(len(keys)):
            for b_i in range(a_i + 1, len(keys)):
                a, b = keys[a_i], keys[b_i]
                sa, _ = live[a]
                sb, _ = live[b]
                if not (sa & sb):
                    continue
                res = _result_inds(sa, sb)
                score = (size(res), size(sa | sb))
                if bestscore is None or score < bestscore:
                    bestscore = score
                    bestpair = (a, b)
        if bestpair is None:  # disconnected: contract the two smallest
            keys.sort(key=lambda k: size(live[k][0]))
            bestpair = (keys[0], keys[1])
        a, b = bestpair
        sa, ta = live.pop(a)
        sb, tb = live.pop(b)
        live[next_id] = (_result_inds(sa, sb), [ta, tb])
        next_id += 1
    return next(iter(live.values()))[1]


def contract(tensors: Sequence[Tensor], sequence=None, alg: str = "optimal") -> Tensor:
    """Contract tensors, planning a sequence if not provided."""
    tensors = list(tensors)
    if sequence is None and len(tensors) > 2:
        sequence = contraction_sequence(tensors, alg=alg)
    return _contract(tensors, sequence)
