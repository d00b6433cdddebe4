"""TPU compute kernels for the compiled engine (see `docs/engine.md`)."""

from .factorizations import cholesky_qr, gram_svd

__all__ = ["cholesky_qr", "gram_svd"]
