"""Named tensor indices.

TPU-native re-design of the index layer of ITensors.jl that the reference
package (`/root/reference/src`, see e.g. `src/TensorNetworks/*.jl`) builds on.
An :class:`Index` is a lightweight immutable label for one tensor axis: a
globally unique ``id``, a dimension, a human-readable ``tag`` and a prime
level.  Two indices contract with each other iff they compare equal
(same ``id`` and same prime level).

Unlike ITensors there are no quantum-number arrows here: tensors are plain
dense arrays, and ``dag`` on an index is the identity (conjugation happens at
the tensor level).
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field, replace

_ID_COUNTER = itertools.count(1)


def _next_id() -> int:
    return next(_ID_COUNTER)


@dataclass(frozen=True)
class Index:
    """An immutable named tensor index.

    Attributes:
      dim: the dimension of the axis this index labels.
      tag: free-form human readable tag (used for site/link bookkeeping).
      plev: prime level; ``i.prime()`` returns an index equal to no unprimed
        index but with the same identity otherwise.
      id: globally unique integer identity.
    """

    dim: int
    tag: str = ""
    plev: int = 0
    id: int = field(default_factory=_next_id)

    # -- equality / hashing: identity is (id, plev); dim rides along --
    def __eq__(self, other):
        if not isinstance(other, Index):
            return NotImplemented
        return self.id == other.id and self.plev == other.plev

    def __hash__(self):
        return hash((self.id, self.plev))

    # -- priming ---------------------------------------------------------
    def prime(self, n: int = 1) -> "Index":
        return replace(self, plev=self.plev + n)

    def noprime(self) -> "Index":
        return replace(self, plev=0)

    def setprime(self, n: int) -> "Index":
        return replace(self, plev=n)

    def sim(self) -> "Index":
        """A fresh index with the same dim/tag but a new identity."""
        return Index(dim=self.dim, tag=self.tag, plev=self.plev)

    def with_tag(self, tag: str) -> "Index":
        return replace(self, tag=tag)

    def __repr__(self):
        p = "'" * self.plev if self.plev <= 3 else f"'^{self.plev}"
        t = f"|{self.tag}" if self.tag else ""
        return f"(dim={self.dim}{t}|id={self.id % 100000}){p}"


def prime(i: Index, n: int = 1) -> Index:
    return i.prime(n)


def noprime(i: Index) -> Index:
    return i.noprime()


def sim(i: Index) -> Index:
    return i.sim()
