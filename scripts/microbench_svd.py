"""TPU microbenchmark of the two-site truncation SVD backends.

Round-3 perf context: with BP fused and the gate chain reworked, the
direct-SVD production path costs ~2.4x the subspace fast mode
(`docs/performance.md`), and the delta is the batched [B, 128, 128] c64
SVD itself — XLA lowers it to QDWH + recursive spectral divide-and-conquer,
which is latency-heavy at these shapes.  This script times, on the real
chip at the benchmark's per-color-group shapes:

    A) jnp.linalg.svd              (XLA QDWH-SVD — the r3 production path)
    B) pjsvd                       (Gram precond + one-sided Jacobi polish)
    C) jacobi_eigh(G) alone        (the preconditioner, for the split)
    D) subspace_eigh(chi) of G     (the fast non-parity mode, for reference)

and reports per-call wall time (steady-state, host-fetch fenced: the axon
tunnel's block_until_ready is a no-op) plus truncated-factor accuracy vs
an f64 host oracle on a saturated kappa=1e4 spectrum.

Run ON TPU (one process!):  python scripts/microbench_svd.py
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp

from tnqs.ops.factorizations import subspace_eigh
from tnqs.ops.jacobi import jacobi_eigh
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
    """Force completion: host-fetch an f32 scalar depending on everything."""
    acc = jnp.zeros((), jnp.float32)
    for a in arrays:
        acc = acc + jnp.sum(jnp.abs(a)).astype(jnp.float32)
    v = float(acc)
    assert np.isfinite(v), "non-finite output"
    return v


def timeit(tag, fn, *args):
    out = fn(*args)
    fence(*jax.tree.leaves(out))  # compile + warm
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    fence(*jax.tree.leaves(out))
    dt = (time.time() - t0) / REPS
    print(f"  {tag:34s} {dt * 1e3:8.2f} ms/call", flush=True)
    return out, dt


def main():
    rng = np.random.default_rng(5)
    spec = np.geomspace(1.0, 1e-4, N)
    A64 = np.stack([make_theta(rng, spec) for _ in range(B)])
    A = device_put(A64.astype(np.complex64))
    U0, s0, Vh0 = np.linalg.svd(A64)

    print(f"theta batch [{B}, {N}, {N}] complex64, kappa 1e4, chi {CHI}:")

    svd_j = jax.jit(lambda x: jnp.linalg.svd(x, full_matrices=False))
    (res_a, t_a) = timeit("A jnp.linalg.svd (QDWH)", svd_j, A)
    (res_b, t_b) = timeit("B pjsvd (precond 8 + polish 4)", pjsvd, A)
    pj2 = jax.jit(lambda x: pjsvd(x, precond_sweeps=6, polish_sweeps=2))
    (res_b2, t_b2) = timeit("B' pjsvd (precond 6 + polish 2)", pj2, A)

    gram = jax.jit(lambda x: jnp.einsum("bki,bkj->bij", jnp.conj(x), x))
    G = gram(A)
    fence(G)
    timeit("C jacobi_eigh(G) sweeps=8", jax.jit(lambda g: jacobi_eigh(g, sweeps=8)), G)
    timeit("D subspace_eigh(chi)(G)", jax.jit(subspace_eigh(CHI)), G)

    acc = {}
    for tag, (U, s, Vh) in (("A", res_a), ("B", res_b), ("B'", res_b2)):
        U = np.asarray(jax.device_get(jnp.real(U))) + 1j * np.asarray(
            jax.device_get(jnp.imag(U))
        )
        Vh = np.asarray(jax.device_get(jnp.real(Vh))) + 1j * np.asarray(
            jax.device_get(jnp.imag(Vh))
        )
        s = np.asarray(jax.device_get(s))
        k = CHI
        rec = np.einsum("bij,bj,bjk->bik", U[:, :, :k], s[:, :k], Vh[:, :k, :])
        best = np.einsum("bij,bj,bjk->bik", U0[:, :, :k], s0[:, :k], Vh0[:, :k, :])
        recon = np.max(np.linalg.norm((rec - best).reshape(B, -1), axis=1) / s0[:, 0])
        serr = np.max(np.abs(s - s0) / s0[:, :1])
        print(f"  {tag:3s} truncated recon {recon:9.2e}   s-err {serr:9.2e}")
        acc[tag] = dict(recon=float(recon), s_err=float(serr))

    # committed artifact (advisor r3: the perf/accuracy table in
    # docs/performance.md must be re-verifiable offline)
    import datetime
    import json

    out = dict(
        shape=[B, N, N], dtype="complex64", kappa=1e4, chi=CHI, reps=REPS,
        ms_per_call={
            "xla_qdwh_svd": round(t_a * 1e3, 1),
            "pjsvd_8_4": round(t_b * 1e3, 1),
            "pjsvd_6_2": round(t_b2 * 1e3, 1),
        },
        accuracy={
            "xla_qdwh_svd": acc["A"],
            "pjsvd_8_4": acc["B"],
            "pjsvd_6_2": acc["B'"],
        },
        device=str(jax.devices()[0]),
        date=datetime.date.today().isoformat(),
    )
    path = pathlib.Path(__file__).parent / "microbench_svd_results.json"
    path.write_text(json.dumps(out, indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
