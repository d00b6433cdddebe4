"""Reproducer hunt for the Pallas Jacobi NaN on saturated theta spectra.

The full-Jacobi parity run (scripts/tpu_parity_check.py --trunc full) sits at
the f32 floor for layers 1-6 and then jumps to 3e-2 deviation at layer 7 — the
first FULL-RANK, high-condition gram batch — and emits NaN at layer 8.  This
script synthesizes PSD gram batches with spectrum families bracketing that
regime, runs `jacobi_eigh` on the real backend, and reports NaN counts and
residuals per family.

Run ON TPU: python scripts/repro_jacobi_nan.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp

from tnqs.ops.jacobi import jacobi_eigh
from tnqs.utils.transfer import device_put

N = 128
B = 64


def make_psd(rng, spec):
    s = np.zeros(N)
    s[: len(spec)] = spec
    out = np.empty((B, N, N), np.complex128)
    for b in range(B):
        Q, _ = np.linalg.qr(
            rng.standard_normal((N, N)) + 1j * rng.standard_normal((N, N))
        )
        out[b] = (Q * s[None, :]) @ Q.conj().T
    out = 0.5 * (out + np.conj(np.swapaxes(out, -1, -2)))
    return out


def check(tag, H64):
    H = device_put(H64.astype(np.complex64))
    w, V = jacobi_eigh(H)
    w = np.asarray(jax.device_get(w))
    V = np.asarray(jax.device_get(V.real)) + 1j * np.asarray(jax.device_get(V.imag))
    nan_w = int(np.sum(~np.isfinite(w).all(axis=1)))
    nan_v = int(np.sum(~np.isfinite(V).all(axis=(1, 2))))
    # residual on finite items
    ok = np.isfinite(w).all(axis=1) & np.isfinite(V).all(axis=(1, 2))
    res = -1.0
    ortho = -1.0
    if ok.any():
        Hk, wk, Vk = H64[ok], w[ok], V[ok]
        R = np.einsum("bij,bjk->bik", Hk, Vk) - Vk * wk[:, None, :]
        res = float(np.max(np.linalg.norm(R, axis=(1, 2)) / np.abs(wk).max(axis=1)))
        G = np.einsum("bji,bjk->bik", np.conj(Vk), Vk) - np.eye(N)[None]
        ortho = float(np.max(np.abs(G)))
    print(f"{tag:34s} nan_w {nan_w:3d}/{B}  nan_v {nan_v:3d}/{B}  "
          f"residual {res:9.2e}  ortho-defect {ortho:9.2e}", flush=True)


def main():
    rng = np.random.default_rng(3)
    fams = {
        "well-cond kappa 1e4": np.geomspace(1.0, 1e-4, N),
        "saturated kappa 1e8": np.geomspace(1.0, 1e-8, N),
        "saturated kappa 1e12": np.geomspace(1.0, 1e-12, N),
        "kappa 1e12 + 8 degenerate pairs": np.sort(
            np.concatenate([np.geomspace(1.0, 1e-12, N - 8),
                            np.geomspace(1.0, 1e-2, 8)])
        )[::-1],
        "rank 64, zeros below": np.concatenate(
            [np.geomspace(1.0, 1e-6, 64), np.zeros(64)]
        ),
        "rank 64 + subnormal tail": np.concatenate(
            [np.geomspace(1.0, 1e-6, 64), np.full(64, 1e-30)]
        ),
        "flat degenerate (all equal)": np.ones(N),
        "two clusters": np.concatenate([np.ones(64), np.full(64, 1e-6)]),
    }
    for tag, spec in fams.items():
        check(tag, make_psd(rng, np.asarray(spec, float)))


if __name__ == "__main__":
    main()
