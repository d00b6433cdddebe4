"""Analytic FLOP accounting for the compiled engine's Trotter layer.

The benchmark's speed claims were previously only *relative* (vs the flex
tier, vs a derived CPU-Julia bound).  This module prices a layer in real
f32 FLOPs from the engine's own static plan (the same `compile_circuit` +
`build_program` structures `LatticeEngine.make_step` executes), so
`bench.py` can report achieved FLOP/s and an MFU against the chip's
matmul ceiling — quantifying "fast" against hardware rather than against
an interpreted baseline.

Conventions
-----------
- complex64 arithmetic: one complex multiply-add = 4 real multiply-adds
  = **8 real FLOPs** (XLA lowers a c64 matmul to 4 f32 matmuls).
- Dense factorizations are priced with explicit constants (documented on
  each term below); they are *model* constants in the usual LAPACK
  flop-count tradition, not measurements.  The dominant terms (gauge /
  Gram / recombination matmuls, theta build) are exact.
- The matmul ceiling on TPU with `jax_default_matmul_precision=highest`
  (which this package requires for parity — see docs/performance.md) is
  the bf16 peak divided by the 6-pass f32 emulation: v5e's 197 TFLOP/s
  bf16 becomes ~32.8 TFLOP/s effective f32.  Override with
  ``TNQS_PEAK_FLOPS`` (real FLOP/s).

The reference has no FLOP accounting of any kind (its kernels live in
BLAS/LAPACK behind ITensors — `/root/reference/src/Apply/simple_update.jl:21-77`);
this is bench-side observability beyond parity.
"""

from __future__ import annotations

import os

# v5e bf16 peak per chip; 'highest' f32 matmul = 6 bf16 passes.
V5E_BF16_PEAK = 197e12
F32_HIGHEST_PASSES = 6.0

# model constants (real-flop multipliers on n^3-class factorizations)
C_HERM_EIG = 9.0   # hermitian eigendecomposition of an n x n block
C_CHOL = 1.0 / 3.0  # Cholesky of an n x n block
C_SVD = 20.0       # direct SVD (QDWH / one-sided Jacobi to convergence)

_CPX = 8.0  # real FLOPs per complex multiply-add


def peak_flops() -> float:
    env = os.environ.get("TNQS_PEAK_FLOPS")
    if env:
        return float(env)
    return V5E_BF16_PEAK / F32_HIGHEST_PASSES


def _side_flops(Bn: int, k: int, chi: int, d: int) -> tuple[float, int]:
    """Real FLOPs for one side (vertex of degree ``k``) of a two-site
    class of ``Bn`` edges, through gauge -> reduction -> recombination ->
    un-gauge; returns (flops, r) with ``r`` the reduced row count of the
    R factor feeding theta (`engine.py` phase 2: wide sides take R = X,
    tall sides the Q-free Gram reduction)."""
    n = d * chi
    r_env = chi ** (k - 1)
    fl = 0.0
    # bond-environment gauge roots: (k-1) hermitian chi x chi solves
    fl += (k - 1) * Bn * C_HERM_EIG * _CPX * chi**3
    # gauge in + un-gauge out: (k-1) message matmuls on each pass
    fl += 2 * Bn * (k - 1) * _CPX * r_env * d * chi**2
    if r_env > n:  # tall side: Gram reduction + recombination
        fl += Bn * _CPX * r_env * n**2          # X^H X
        fl += Bn * (C_CHOL * 2 + 1) * _CPX * n**3  # rfactor chain + R^-1 solves
        fl += Bn * _CPX * r_env * n**2          # X @ (R^-1 R_new)
        r = n
    else:
        r = r_env
    return fl, r


def layer_flops(eng, circuit, bp_exec_iters: int = 1) -> dict:
    """Price one Trotter layer of ``circuit`` on ``eng`` in real FLOPs.

    Mirrors `LatticeEngine.make_step`'s program construction exactly
    (same `compile_circuit` + `build_program`), so the BP-refresh count
    matches what the compiled step executes.  Returns a breakdown dict;
    ``total`` is the headline number.

    BP fixed points exit early on convergence (`engine._bp_fixed_point`
    is a tolerance-gated `lax.while_loop`; the round-4 ablation measured
    bp_maxiter 25 -> 1 as a ±0.5% wall-clock change), so the
    data-dependent iteration count cannot be priced statically.
    ``bp_exec_iters`` prices each fixed-point call at a fixed iteration
    count — the default 1 is the guaranteed-executed minimum, making the
    returned total (and any MFU derived from it) a certified lower
    bound: extra converging iterations only raise true utilization.
    """
    from ..engine import OneSiteGroup, build_program, compile_circuit

    chi, d = eng.chi, eng.d
    compiled = compile_circuit(eng.plan, circuit, d=d)
    program = build_program(eng.plan, compiled)

    two = one = 0.0
    svd = 0.0
    n_bp_iters = bp_exec_iters  # the final refresh
    for entry in program:
        if entry[0] == "bp":
            n_bp_iters += bp_exec_iters
        elif entry[0] == "one":
            for k, (pos, _, _) in entry[1].per_bucket.items():
                one += len(pos) * _CPX * d**2 * chi ** (k - 1) * d
        else:
            for cls in entry[1].classes:
                Bn = len(cls.u_pos)
                fu, ru = _side_flops(Bn, cls.ku, chi, d)
                fv, rv = _side_flops(Bn, cls.kv, chi, d)
                two += fu + fv
                n = d * chi
                # theta: gate fold (tiny) + one MXU matmul [ru,n]x[n,d*rv*d]
                two += Bn * _CPX * d**4 * rv * chi
                two += Bn * _CPX * ru * n * (d * rv * d)
                m_, n_ = ru * d, rv * d
                svd += Bn * C_SVD * _CPX * m_ * n_ * min(m_, n_)
                # truncation algebra: s-scaled R factors (tiny) + writeback
                two += Bn * _CPX * (m_ + n_) * chi

    # BP message updates: per directed edge from a degree-k vertex,
    # (k-1) env absorptions + the closing contraction, each
    # r_env*d x chi matmuls against chi x chi messages
    bp_per_iter = 0.0
    for k, bucket in eng.plan.buckets.items():
        for _v in bucket:
            r_env = chi ** (k - 1)
            bp_per_iter += k * (k) * _CPX * r_env * d * chi**2
    bp = n_bp_iters * bp_per_iter

    total = two + svd + one + bp
    return {
        "total": total,
        "two_site_dense": two,
        "svd": svd,
        "bp": bp,
        "one_site": one,
        "bp_iters": n_bp_iters,
        "model": (
            "complex madd = 8 flops; C_eig=9, C_svd=20, C_chol=1/3; "
            "BP priced at the guaranteed-executed minimum (lower bound)"
        ),
    }


def mfu(flops_per_layer: float, layers_per_sec: float) -> dict:
    peak = peak_flops()
    achieved = flops_per_layer * layers_per_sec
    return {
        "flops_per_layer": flops_per_layer,
        "achieved_flops": achieved,
        "peak_flops": peak,
        "mfu": achieved / peak,
    }
