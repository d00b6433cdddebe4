"""Synthetic accuracy probe of the engine's truncation eigensolvers.

Round-3 diagnosis of the TPU parity gap (tests/golden/tpu_parity_chi64.json:
engine deviates 2.3e-3 from f64 where the flex-f32 control floor is 5e-6).
The production path truncates theta [B, 128, 128] through a Gram matrix
(`gram_svd` / `subspace_eigh`); Gram methods carry an eps*kappa^2 floor and
the shifted Cholesky orthonormalization can mint phantom singular values on
the rank-deficient (pre-saturation) thetas the padded engine produces.

This script builds thetas with KNOWN f64 spectra matching the benchmark's
layer regimes and measures, for each candidate truncation algorithm, the
error of the resulting rank-chi factors against the f64 truth:

    A) f32 direct SVD           (the flex-f32 floor)
    B) f32 gram_svd, full eigh  (factor_method="gram", trunc_method="full")
    C) f32 subspace_eigh(chi)   (the production TPU path)

Run: JAX_PLATFORMS=cpu python scripts/probe_trunc_accuracy.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from tnqs.ops.factorizations import gram_svd, subspace_eigh

CHI = 64
N = 2 * CHI  # theta is [d*chi, d*chi]
B = 8


def make_theta(rng, spectrum):
    """Random c128 theta with the given singular spectrum (len <= N)."""
    s = np.zeros(N)
    s[: len(spectrum)] = spectrum
    U, _ = np.linalg.qr(rng.standard_normal((N, N)) + 1j * rng.standard_normal((N, N)))
    V, _ = np.linalg.qr(rng.standard_normal((N, N)) + 1j * rng.standard_normal((N, N)))
    return (U * s[None, :]) @ V.conj().T


def truncated_factors_direct(theta, k, f64=False):
    th = jnp.asarray(theta, jnp.complex128 if f64 else jnp.complex64)
    U, s, Vh = jnp.linalg.svd(th, full_matrices=False)
    return np.asarray(U[:, :, :k]), np.asarray(s[:, :k]), np.asarray(Vh[:, :k, :])


def truncated_factors_gram(theta, k):
    th = jnp.asarray(theta, jnp.complex64)
    U, s, Vh = gram_svd(th)
    return np.asarray(U[:, :, :k]), np.asarray(s[:, :k]), np.asarray(Vh[:, :k, :])


def truncated_factors_subspace(theta, k, **kw):
    """Reproduce engine.py phase 3+4 algebra on the n-side Gram."""
    th = jnp.asarray(theta, jnp.complex64)
    G = jnp.einsum("bki,bkj->bij", jnp.conj(th), th)  # A^H A  [n, n]
    w, V, tail = subspace_eigh(k, **kw)(G)
    w = jnp.real(w[..., ::-1])
    V = V[..., ::-1]
    s = jnp.sqrt(jnp.clip(w, 0.0, None))
    smax = s[..., :1]
    eps = 1.1920929e-07
    inv = jnp.where(s > (eps * 8.0) * smax, 1.0 / jnp.where(s > 0, s, 1.0), 0.0)
    Vh = jnp.conj(jnp.swapaxes(V, -1, -2))
    U = jnp.einsum("bmn,bnk->bmk", th, V) * inv[..., None, :].astype(th.dtype)
    return np.asarray(U[:, :, :k]), np.asarray(s[:, :k]), np.asarray(Vh[:, :k, :])


def report(tag, theta, Uk, sk, Vhk, truth):
    U0, s0, Vh0 = truth
    approx = np.einsum("bmk,bk,bkn->bmn", Uk, sk, Vhk)
    best = np.einsum("bmk,bk,bkn->bmn", U0, s0, Vh0)
    smax = s0[:, 0]
    recon = np.linalg.norm((approx - best).reshape(B, -1), axis=1) / smax
    s_err = np.max(np.abs(sk - s0) / smax[:, None], axis=1)
    # weighted factor error: the state update writes U*sqrt(s); junk columns
    # with phantom s contribute sqrt(s)-weighted noise
    r_true = int(np.sum(s0[0] > smax[0] * 1e-12))
    phantom = 0.0 if r_true >= sk.shape[1] else float(np.max(sk[:, r_true:]) / smax.min())
    print(
        f"  {tag:28s} recon-err {np.max(recon):9.2e}   "
        f"s-err {np.max(s_err):9.2e}   phantom-s {phantom:9.2e}"
    )


def run_case(name, spectrum, rng):
    print(f"case {name}: true rank {np.sum(np.asarray(spectrum) > 0)}, "
          f"s_min/s_max {np.min([x for x in spectrum if x > 0]) / np.max(spectrum):.1e}")
    theta = np.stack([make_theta(rng, spectrum) for _ in range(B)])
    truth = truncated_factors_direct(theta, CHI, f64=True)
    report("direct f32 (flex floor)", theta, *truncated_factors_direct(theta, CHI), truth)
    report("gram_svd full-eigh f32", theta, *truncated_factors_gram(theta, CHI), truth)
    report("subspace it=2 (prod)", theta, *truncated_factors_subspace(theta, CHI), truth)
    report("subspace it=4", theta, *truncated_factors_subspace(theta, CHI, iters=4), truth)


def main():
    rng = np.random.default_rng(11)
    # layer-2 regime: rank 4, padded to 128, mild decay
    run_case("presat rank-4", [1.0, 0.7, 0.3, 0.1], rng)
    # layer-4 regime: rank 16
    run_case("presat rank-16", list(np.geomspace(1.0, 1e-2, 16)), rng)
    # saturated: full rank 128, geometric decay to 1e-4
    run_case("saturated kappa=1e4", list(np.geomspace(1.0, 1e-4, N)), rng)
    # saturated, gentle decay near the cut (truncation-chaos regime)
    run_case("saturated kappa=1e2", list(np.geomspace(1.0, 1e-2, N)), rng)


if __name__ == "__main__":
    main()
