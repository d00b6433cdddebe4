"""Named-index dense tensors over numpy / JAX arrays.

This is the TPU-native replacement for the ITensors.jl tensor substrate the
reference package is built on (reference: `/root/reference/src/imports.jl:1-51`
pulls `ITensor`, `contract`, `factorize_svd`, `qr`, `eigen`, ...).  Design:

* A :class:`Tensor` is an immutable-ish pair ``(data, inds)`` where ``data``
  is either a ``numpy.ndarray`` (eager host execution: graph-level glue,
  dynamically-shaped flex paths) or a ``jax.Array`` (device execution).  All
  operations dispatch on the array type, so whole networks can be moved to a
  TPU with :func:`tnqs.adapt` exactly like the reference's ``Adapt.adapt``
  GPU hook (`src/TensorNetworks/abstracttensornetwork.jl:71-73`).
* Contraction is einsum-by-index-identity.  Two tensors contract over every
  index they share (same ``id`` and prime level), mirroring ITensor semantics.
* Factorizations (truncated SVD / QR / hermitian eig) follow the reference's
  numerical conventions: truncation error is the discarded fraction of the
  singular-value square sum, and small-precision eigendecompositions are
  promoted to float64 for stability (mirrors `src/utils.jl:94-108`).
"""

from __future__ import annotations

import string
from typing import Iterable, Sequence

import numpy as np

from .index import Index

try:  # JAX is the device backend; keep import lazy-tolerant for docs tooling
    import jax
    import jax.numpy as jnp

    _HAVE_JAX = True
except Exception:  # pragma: no cover
    jax = None
    jnp = None
    _HAVE_JAX = False

_LETTERS = string.ascii_letters


def _xp(data):
    """Array namespace for `data` (numpy for ndarrays, jax.numpy for jax)."""
    if _HAVE_JAX and isinstance(data, jax.Array):
        return jnp
    return np


def is_jax(data) -> bool:
    return _HAVE_JAX and isinstance(data, jax.Array)


class Tensor:
    """A dense tensor with named indices.

    ``inds`` is a tuple of :class:`Index`; ``data.shape[k] == inds[k].dim``.
    """

    __slots__ = ("data", "inds")

    def __init__(self, data, inds: Sequence[Index]):
        inds = tuple(inds)
        if not (isinstance(data, np.ndarray) or is_jax(data)):
            data = np.asarray(data)
        if tuple(data.shape) != tuple(i.dim for i in inds):
            raise ValueError(
                f"shape mismatch: data {tuple(data.shape)} vs inds "
                f"{tuple(i.dim for i in inds)}"
            )
        if len(set(inds)) != len(inds):
            raise ValueError(f"duplicate indices in tensor: {inds}")
        self.data = data
        self.inds = inds

    # ------------------------------------------------------------------
    # basic queries
    # ------------------------------------------------------------------
    @property
    def ndim(self) -> int:
        return len(self.inds)

    @property
    def dtype(self):
        return self.data.dtype

    def __repr__(self):
        return f"Tensor{list(self.inds)}<{self.data.dtype}>"

    def copy(self) -> "Tensor":
        return Tensor(self.data, self.inds)

    def axis(self, ind: Index) -> int:
        for k, i in enumerate(self.inds):
            if i == ind:
                return k
        raise KeyError(f"index {ind} not in tensor {self.inds}")

    def hasind(self, ind: Index) -> bool:
        return any(i == ind for i in self.inds)

    def scalar(self):
        if self.ndim != 0:
            raise ValueError(f"tensor is not a scalar: {self.inds}")
        return self.data[()] if isinstance(self.data, np.ndarray) else self.data.reshape(())

    def item(self):
        s = self.scalar()
        return complex(s) if np.iscomplexobj(self.data) else float(s)

    # ------------------------------------------------------------------
    # index manipulation (all return new Tensors; data is shared)
    # ------------------------------------------------------------------
    def replaceinds(self, old: Sequence[Index], new: Sequence[Index]) -> "Tensor":
        old, new = list(old), list(new)
        if len(old) != len(new):
            raise ValueError("replaceinds: length mismatch")
        mapping = {o: n for o, n in zip(old, new)}
        out = []
        for i in self.inds:
            j = mapping.get(i, i)
            if j is not i and j.dim != i.dim:
                raise ValueError(f"replaceinds: dim mismatch {i} -> {j}")
            out.append(j)
        return Tensor(self.data, out)

    def replaceind(self, old: Index, new: Index) -> "Tensor":
        return self.replaceinds([old], [new])

    def prime(self, n: int = 1, only: Iterable[Index] | None = None) -> "Tensor":
        if only is None:
            return Tensor(self.data, [i.prime(n) for i in self.inds])
        only = set(only)
        return Tensor(self.data, [i.prime(n) if i in only else i for i in self.inds])

    def noprime(self) -> "Tensor":
        new = [i.noprime() for i in self.inds]
        if len(set(new)) != len(new):
            raise ValueError("noprime would create duplicate indices")
        return Tensor(self.data, new)

    def dag(self) -> "Tensor":
        xp = _xp(self.data)
        return Tensor(xp.conj(self.data), self.inds)

    def permute(self, inds: Sequence[Index]) -> "Tensor":
        inds = list(inds)
        if len(inds) != self.ndim:
            raise ValueError("permute: wrong number of indices")
        perm = [self.axis(i) for i in inds]
        xp = _xp(self.data)
        return Tensor(xp.transpose(self.data, perm), inds)

    # ------------------------------------------------------------------
    # arithmetic
    # ------------------------------------------------------------------
    def __mul__(self, other):
        if isinstance(other, Tensor):
            return contract_pair(self, other)
        return Tensor(self.data * other, self.inds)

    __rmul__ = __mul__

    def __truediv__(self, other):
        if isinstance(other, Tensor):
            raise TypeError("use contraction for tensors")
        return Tensor(self.data / other, self.inds)

    def __neg__(self):
        return Tensor(-self.data, self.inds)

    def __add__(self, other: "Tensor"):
        other = other.permute(self.inds) if other.inds != self.inds else other
        if set(other.inds) != set(self.inds):
            raise ValueError("tensor addition requires identical index sets")
        return Tensor(self.data + other.data, self.inds)

    def __sub__(self, other: "Tensor"):
        return self + (-other)

    # ------------------------------------------------------------------
    # norms etc.
    # ------------------------------------------------------------------
    def norm(self) -> float:
        xp = _xp(self.data)
        return float(xp.linalg.norm(self.data.reshape(-1)))

    def normalize(self) -> "Tensor":
        n = self.norm()
        return self if n == 0 else Tensor(self.data / n, self.inds)

    def sum_elements(self):
        xp = _xp(self.data)
        s = xp.sum(self.data)
        return complex(s) if np.iscomplexobj(self.data) else float(s)

    def dot(self, other: "Tensor"):
        """Frobenius inner product <self, other> = sum conj(self) * other."""
        o = other.permute(self.inds)
        xp = _xp(self.data)
        s = xp.sum(xp.conj(self.data) * o.data)
        return complex(s)

    def trace_pairs(self) -> "Tensor":
        """Contract every (i, i') pair of unprimed/primed indices (partial trace)."""
        t = self
        while True:
            pair = None
            for i in t.inds:
                if i.plev == 0 and t.hasind(i.prime()):
                    pair = i
                    break
            if pair is None:
                return t
            a1, a2 = t.axis(pair), t.axis(pair.prime())
            xp = _xp(t.data)
            data = xp.trace(t.data, axis1=a1, axis2=a2)
            rest = [j for j in t.inds if j != pair and j != pair.prime()]
            t = Tensor(data, rest)

    def matricize(self, row_inds: Sequence[Index], col_inds: Sequence[Index] | None = None):
        """Return a 2D backend array grouping `row_inds` / `col_inds`."""
        row_inds = list(row_inds)
        if col_inds is None:
            col_inds = [i for i in self.inds if i not in row_inds]
        col_inds = list(col_inds)
        t = self.permute(row_inds + col_inds)
        r = int(np.prod([i.dim for i in row_inds], dtype=np.int64)) if row_inds else 1
        c = int(np.prod([i.dim for i in col_inds], dtype=np.int64)) if col_inds else 1
        return t.data.reshape(r, c)

    def array(self):
        return self.data

    def to_numpy(self) -> np.ndarray:
        return np.asarray(self.data)

    # ------------------------------------------------------------------
    # backend / dtype transfer (the reference's Adapt analogue)
    # ------------------------------------------------------------------
    def astype(self, dtype) -> "Tensor":
        dtype = np.dtype(dtype)
        if np.iscomplexobj(self.data) and not np.issubdtype(dtype, np.complexfloating):
            # match reference `adapt_gate`: keep complex if data is complex
            dtype = np.dtype(np.complex64) if dtype.itemsize <= 4 else np.dtype(np.complex128)
        return Tensor(self.data.astype(dtype), self.inds)

    def to_jax(self, device=None) -> "Tensor":
        if not _HAVE_JAX:
            raise RuntimeError("jax unavailable")
        if isinstance(self.data, np.ndarray):
            # complex-safe upload (tunneled backends lack complex transfers)
            from ..utils.transfer import device_put

            return Tensor(device_put(self.data, device), self.inds)
        data = self.data
        if device is not None:
            data = jax.device_put(data, device)
        return Tensor(data, self.inds)

    def to_host(self) -> "Tensor":
        if _HAVE_JAX and isinstance(self.data, jax.Array):
            from ..utils.transfer import device_get

            return Tensor(device_get(self.data), self.inds)
        return Tensor(np.asarray(self.data), self.inds)


# ----------------------------------------------------------------------
# constructors
# ----------------------------------------------------------------------

def from_matrix(mat, row_inds: Sequence[Index], col_inds: Sequence[Index]) -> Tensor:
    row_inds, col_inds = list(row_inds), list(col_inds)
    dims = [i.dim for i in row_inds] + [i.dim for i in col_inds]
    xp = _xp(mat) if (isinstance(mat, np.ndarray) or is_jax(mat)) else np
    mat = xp.asarray(mat)
    return Tensor(mat.reshape(dims), row_inds + col_inds)


def delta(inds: Sequence[Index], dtype=np.float64) -> Tensor:
    """Generalized Kronecker delta: 1 where all positions are equal.

    Mirrors ITensors `delta` used for default BP messages
    (`src/TensorNetworks/tensornetwork.jl:62-64`,
    `tensornetworkstate.jl:72-75`).
    """
    inds = list(inds)
    if not inds:
        return Tensor(np.asarray(1.0, dtype=dtype), [])
    dims = [i.dim for i in inds]
    data = np.zeros(dims, dtype=dtype)
    for k in range(min(dims)):
        data[(k,) * len(dims)] = 1.0
    return Tensor(data, inds)


def identity_tensor(row_inds: Sequence[Index], col_inds: Sequence[Index], dtype=np.float64) -> Tensor:
    """Identity between the combined row space and combined column space.

    Reference: `identity_tensor` in `src/utils.jl:40-46`.
    """
    row_inds, col_inds = list(row_inds), list(col_inds)
    r = int(np.prod([i.dim for i in row_inds], dtype=np.int64))
    c = int(np.prod([i.dim for i in col_inds], dtype=np.int64))
    return from_matrix(np.eye(r, c, dtype=dtype), row_inds, col_inds)


def onehot(ind: Index, k: int, dtype=np.float64) -> Tensor:
    data = np.zeros(ind.dim, dtype=dtype)
    data[k] = 1.0
    return Tensor(data, [ind])


def random_tensor(inds: Sequence[Index], dtype=np.float64, rng=None) -> Tensor:
    rng = np.random.default_rng() if rng is None else rng
    inds = list(inds)
    dims = [i.dim for i in inds]
    if np.issubdtype(np.dtype(dtype), np.complexfloating):
        data = rng.standard_normal(dims) + 1j * rng.standard_normal(dims)
    else:
        data = rng.standard_normal(dims)
    return Tensor(data.astype(dtype), inds)


# ----------------------------------------------------------------------
# contraction
# ----------------------------------------------------------------------

def contract_pair(a: Tensor, b: Tensor) -> Tensor:
    """Contract two tensors over all shared indices (einsum by identity)."""
    common = [i for i in a.inds if b.hasind(i)]
    a_only = [i for i in a.inds if not b.hasind(i)]
    b_only = [i for i in b.inds if not a.hasind(i)]

    labels: dict[Index, str] = {}

    def lab(i: Index) -> str:
        if i not in labels:
            labels[i] = _LETTERS[len(labels)]
        return labels[i]

    sub_a = "".join(lab(i) for i in a.inds)
    sub_b = "".join(lab(i) for i in b.inds)
    out_inds = a_only + b_only
    sub_o = "".join(labels[i] for i in out_inds)
    if is_jax(a.data) or is_jax(b.data):
        data = jnp.einsum(f"{sub_a},{sub_b}->{sub_o}", a.data, b.data)
    else:
        data = np.einsum(f"{sub_a},{sub_b}->{sub_o}", a.data, b.data)
    return Tensor(data, out_inds)


def contract(tensors: Sequence[Tensor], sequence=None) -> Tensor:
    """Contract a list of tensors, optionally following a nested sequence.

    `sequence` follows the reference convention
    (`src/contraction_sequences.jl`): a nested list of 1-based leaf positions,
    e.g. ``[[1, 3], 2]``.  Without a sequence, contracts left-to-right.
    """
    tensors = list(tensors)
    if not tensors:
        raise ValueError("cannot contract empty tensor list")
    if sequence is None:
        out = tensors[0]
        for t in tensors[1:]:
            out = contract_pair(out, t)
        return out

    def run(node):
        if isinstance(node, int):
            return tensors[node - 1]
        parts = [run(child) for child in node]
        out = parts[0]
        for p in parts[1:]:
            out = contract_pair(out, p)
        return out

    return run(sequence)


# ----------------------------------------------------------------------
# helpers mirroring ITensors index-set algebra
# ----------------------------------------------------------------------

def commoninds(a: Tensor, b: Tensor) -> list[Index]:
    return [i for i in a.inds if b.hasind(i)]


def uniqueinds(a: Tensor, *others: Tensor) -> list[Index]:
    out = list(a.inds)
    for b in others:
        out = [i for i in out if not b.hasind(i)]
    return out


def hascommoninds(a: Tensor, b: Tensor) -> bool:
    return len(commoninds(a, b)) > 0


def directsum(
    a: Tensor, a_inds: Sequence[Index], b: Tensor, b_inds: Sequence[Index], new_inds: Sequence[Index]
) -> Tensor:
    """Direct sum of `a` and `b` along the paired indices; other indices must match.

    Mirrors `ITensors.directsum` as used by network addition
    (`src/TensorNetworks/abstracttensornetwork.jl:127-169`).
    """
    a_inds, b_inds, new_inds = list(a_inds), list(b_inds), list(new_inds)
    shared = [i for i in a.inds if i not in a_inds]
    b_shared = [i for i in b.inds if i not in b_inds]
    if set(shared) != set(b_shared):
        raise ValueError("directsum: non-summed indices must match")
    a_p = a.permute(a_inds + shared)
    b_p = b.permute(b_inds + shared)
    xp = _xp(a_p.data) if is_jax(a_p.data) else _xp(b_p.data)
    n = len(a_inds)
    out_shape = [ni.dim for ni in new_inds] + [i.dim for i in shared]
    dtype = np.promote_types(a.data.dtype, b.data.dtype)
    data = np.zeros(out_shape, dtype=dtype)
    a_np, b_np = np.asarray(a_p.data), np.asarray(b_p.data)
    sl_a = tuple(slice(0, i.dim) for i in a_inds)
    sl_b = tuple(slice(i.dim, i.dim + j.dim) for i, j in zip(a_inds, b_inds))
    data[sl_a] += a_np
    data[sl_b] += b_np
    out = Tensor(data, new_inds + shared)
    if xp is jnp:
        out = out.to_jax()
    return out
