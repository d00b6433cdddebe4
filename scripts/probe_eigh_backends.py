"""On-TPU accuracy/cost shootout of eigh backends at the engine's gram shapes.

Round-3 parity diagnosis (tests/golden/tpu_parity_chi64.json): the production
chi=64 path deviates 2.3e-3 from f64 where the flex-f32 control floor is
5.3e-6.  The truncation eigensolver is the error source — the Pallas Jacobi
kernel's eigenpair residual (~7e-6 after Newton-Schulz refinement) is ~30x
LAPACK-f32 (2.8e-7), and the un-gauge step amplifies it through 1/sqrt(s_min)
environment factors.  This probe measures, on the REAL TPU backend at the
benchmark's [B, 128, 128] gram shapes, the residual/orthogonality/NaN-count
and wall cost of every candidate LAPACK-class replacement:

    A) jacobi_eigh (refined)        — the current TPU kernel
    B) jnp.linalg.eigh  c64         — XLA QDWH spectral d&c, f32
    C) jnp.linalg.eigh  c128        — same, emulated f64 (if supported)
    D) jnp.linalg.svd   c64 theta   — direct (unsquared) QDWH-SVD

Timing: per CLAUDE.md, the timed region ends with a host fetch of an f32
scalar depending on all outputs (block_until_ready lies under axon).

Run ON TPU (one process!): python scripts/probe_eigh_backends.py
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)  # for variant C; arrays stay narrow

import jax.numpy as jnp

from tnqs.ops.jacobi import jacobi_eigh
from tnqs.utils.transfer import device_put

N = 128
B = 48
REPS = 10


def make_psd(rng, spec):
    s = np.zeros(N)
    s[: len(spec)] = spec
    out = np.empty((B, N, N), np.complex128)
    for b in range(B):
        Q, _ = np.linalg.qr(
            rng.standard_normal((N, N)) + 1j * rng.standard_normal((N, N))
        )
        out[b] = (Q * s[None, :]) @ Q.conj().T
    return 0.5 * (out + np.conj(np.swapaxes(out, -1, -2)))


def fetch_scalar(*arrs):
    acc = jnp.zeros((), jnp.float32)
    for a in arrs:
        acc = acc + jnp.real(jnp.sum(a)).astype(jnp.float32)
    return float(acc)


def residual_report(tag, H64, w, V, seconds):
    w = np.asarray(w, np.float64)
    V = np.asarray(V, np.complex128)
    finite = np.isfinite(w).all(axis=-1) & np.isfinite(V.real).all(axis=(1, 2))
    n_nan = int(B - finite.sum())
    res = ortho = float("nan")
    if finite.any():
        Hk, wk, Vk = H64[finite], w[finite], V[finite]
        R = np.einsum("bij,bjk->bik", Hk, Vk) - Vk * wk[:, None, :]
        res = float(np.max(np.linalg.norm(R, axis=(1, 2)) / np.abs(wk).max(axis=1)))
        G = np.einsum("bji,bjk->bik", np.conj(Vk), Vk) - np.eye(N)[None]
        ortho = float(np.max(np.abs(G)))
    print(
        f"    {tag:24s} nan {n_nan:2d}/{B}  residual {res:9.2e}  "
        f"ortho {ortho:9.2e}  {seconds * 1e3 / REPS:8.1f} ms/call",
        flush=True,
    )


def timed(fn, *args):
    out = fn(*args)  # warm-up / compile
    _ = fetch_scalar(*[o.real if jnp.iscomplexobj(o) else o for o in out])
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    _ = fetch_scalar(*[o.real if jnp.iscomplexobj(o) else o for o in out])
    return out, time.perf_counter() - t0


@jax.jit
def xla_eigh(H):
    return jnp.linalg.eigh(H)


@jax.jit
def xla_eigh64(H):
    return jnp.linalg.eigh(H)


@jax.jit
def xla_svd(A):
    U, s, Vh = jnp.linalg.svd(A, full_matrices=False)
    return U, s, Vh


def main():
    rng = np.random.default_rng(5)
    fams = {
        "saturated kappa 1e2": np.geomspace(1.0, 1e-2, N),
        "saturated kappa 1e8": np.geomspace(1.0, 1e-8, N),
        "rank 16, zeros below": np.concatenate(
            [np.geomspace(1.0, 1e-2, 16), np.zeros(N - 16)]
        ),
    }
    for tag, spec in fams.items():
        H64 = make_psd(rng, np.asarray(spec, float))
        print(f"family: {tag}", flush=True)

        H32 = device_put(H64.astype(np.complex64))
        (w, V), dt = timed(lambda h: jacobi_eigh(h), H32)
        from tnqs.utils.transfer import device_get

        residual_report("jacobi refined", H64, device_get(w), device_get(V), dt)

        (w, V), dt = timed(xla_eigh, H32)
        residual_report("xla eigh c64", H64, device_get(w), device_get(V), dt)

        try:
            H128 = device_put(H64)
            (w, V), dt = timed(xla_eigh64, H128)
            residual_report("xla eigh c128", H64, device_get(w), device_get(V), dt)
        except Exception as e:  # f64 may be unsupported on this backend
            print(f"    xla eigh c128: UNAVAILABLE ({type(e).__name__}: {e})", flush=True)

        # direct SVD of a theta with this singular spectrum (A = U s V^H)
        s = np.zeros(N)
        s[: len(spec)] = np.sqrt(np.asarray(spec, float))  # gram spec = s^2
        Qa, _ = np.linalg.qr(rng.standard_normal((N, N)) + 1j * rng.standard_normal((N, N)))
        Qb, _ = np.linalg.qr(rng.standard_normal((N, N)) + 1j * rng.standard_normal((N, N)))
        A64 = np.broadcast_to((Qa * s[None, :]) @ Qb.conj().T, (B, N, N)).copy()
        A32 = device_put(A64.astype(np.complex64))
        try:
            (U, sv, Vh), dt = timed(xla_svd, A32)
            U = np.asarray(device_get(U), np.complex128)
            sv = np.asarray(device_get(sv), np.float64)
            Vh = np.asarray(device_get(Vh), np.complex128)
            R = np.einsum("bmk,bk,bkn->bmn", U, sv, Vh) - A64
            res = float(np.max(np.linalg.norm(R, axis=(1, 2)) / sv.max(axis=1)))
            serr = float(np.max(np.abs(np.sort(sv, axis=1)[:, ::-1] - s[None, :]) / s.max()))
            print(
                f"    {'xla svd c64 (direct)':24s} recon-res {res:9.2e}  "
                f"s-err {serr:9.2e}              {dt * 1e3 / REPS:8.1f} ms/call",
                flush=True,
            )
        except Exception as e:
            print(f"    xla svd c64: UNAVAILABLE ({type(e).__name__}: {e})", flush=True)


if __name__ == "__main__":
    main()
