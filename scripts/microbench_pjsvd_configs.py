"""TPU sweep of pjsvd (precond_sweeps, polish_sweeps) configurations.

The committed microbench (`microbench_svd.py`) pinned two points:
(8, 4) -> 1.96e-6 truncated recon at 79 ms/call (beats XLA QDWH on both
axes) and (6, 2) -> 1.15e-2 (not viable).  This sweep separates the two
knobs — whether the failure was the 6-sweep preconditioner or the 2-sweep
polish — and finds the cheapest configuration that stays at the
LAPACK-f32-class ~2e-6 floor on a saturated kappa=1e4 spectrum.

Run ON TPU (one process!):  python scripts/microbench_pjsvd_configs.py
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp

from tnqs.ops.osj import pjsvd
from tnqs.utils.transfer import device_put

B, N, CHI = 64, 128, 64
REPS = 10


def make_theta(rng, spec):
    s = np.zeros(N)
    s[: len(spec)] = spec
    U, _ = np.linalg.qr(rng.standard_normal((N, N)) + 1j * rng.standard_normal((N, N)))
    V, _ = np.linalg.qr(rng.standard_normal((N, N)) + 1j * rng.standard_normal((N, N)))
    return (U * s[None, :]) @ V.conj().T


def fence(*arrays):
    acc = jnp.zeros((), jnp.float32)
    for a in arrays:
        acc = acc + jnp.sum(jnp.abs(a)).astype(jnp.float32)
    v = float(acc)
    assert np.isfinite(v), "non-finite output"
    return v


def main():
    rng = np.random.default_rng(5)
    spec = np.geomspace(1.0, 1e-4, N)
    A64 = np.stack([make_theta(rng, spec) for _ in range(B)])
    A = device_put(A64.astype(np.complex64))
    U0, s0, Vh0 = np.linalg.svd(A64)
    best = np.einsum("bij,bj,bjk->bik", U0[:, :, :CHI], s0[:, :CHI], Vh0[:, :CHI, :])

    print(f"pjsvd config sweep [{B}, {N}, {N}] c64, kappa 1e4, chi {CHI}:")
    for pre, pol in [(8, 4), (8, 3), (8, 2), (7, 4), (7, 3), (6, 4), (5, 5), (10, 2)]:
        fn = jax.jit(lambda x, a=pre, b=pol: pjsvd(x, precond_sweeps=a, polish_sweeps=b))
        out = fn(A)
        fence(*jax.tree.leaves(out))
        t0 = time.time()
        for _ in range(REPS):
            out = fn(A)
        fence(*jax.tree.leaves(out))
        dt = (time.time() - t0) / REPS
        U, s, Vh = out
        Uh = np.asarray(jax.device_get(jnp.real(U))) + 1j * np.asarray(
            jax.device_get(jnp.imag(U))
        )
        Vhh = np.asarray(jax.device_get(jnp.real(Vh))) + 1j * np.asarray(
            jax.device_get(jnp.imag(Vh))
        )
        sh = np.asarray(jax.device_get(s))
        rec = np.einsum("bij,bj,bjk->bik", Uh[:, :, :CHI], sh[:, :CHI], Vhh[:, :CHI, :])
        recon = np.max(np.linalg.norm((rec - best).reshape(B, -1), axis=1) / s0[:, 0])
        serr = np.max(np.abs(sh - s0) / s0[:, :1])
        print(
            f"  ({pre:2d}, {pol}) {dt * 1e3:8.2f} ms/call   recon {recon:9.2e}   "
            f"s-err {serr:9.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
