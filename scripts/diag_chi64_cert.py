"""Diagnose the chi=64 certified-sampler NaN (round-4: first complete run
of the chi=64 sampler returned p/q = NaN; the chi=8 w2 sampler is fine).

Evolves the flagship state, then fetches every term of the certificate
    poverq = exp(log_tr_last + llog + rlog[nC-1] - log_zbp)
for a handful of samples, plus the norm program's outputs — isolating
which log went non-finite at chi=64.

Run: python scripts/diag_chi64_cert.py   (holds the TPU lock)
"""

import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import bench


def main():
    import jax
    import jax.numpy as jnp

    bench.acquire_tpu_lock()
    bench.wait_for_tpu()
    g, layer, chi = bench.build_workload()
    _, compile_s, eng = bench.bench_engine(g, layer, chi, steps=20)
    print(f"evolved (compile {compile_s:.1f}s)", flush=True)

    from tnqs.bmps_engine import BMPSEngine, BMPSSampler
    from tnqs.utils.transfer import device_get

    sam = BMPSSampler(BMPSEngine(eng, rank=8), proj_rank=16)
    be = sam.bmps
    cp = be.cplan
    nC = len(cp.columns)
    if "norm" not in sam._fns:
        sam._fns["norm"] = sam._build_norm()
    T, M = eng.T, eng.M
    rights, rlog, log_zbp, norm_log = sam._fns["norm"](T, M)
    print("log_zbp =", float(np.asarray(device_get(log_zbp.reshape(1)))[0]), flush=True)
    print("norm_log =", float(np.asarray(device_get(norm_log.reshape(1)))[0]), flush=True)
    rlog_h = np.asarray(device_get(rlog))
    print("rlog finite:", np.isfinite(rlog_h).all(), "rlog[-1] =", rlog_h[-1], flush=True)

    # one full sample with each certificate term fetched separately
    from tnqs.bmps_engine import _EINSUM_BUDGET

    budget = _EINSUM_BUDGET  # single lane: full budget

    def one_sample_terms(T, rights, rlog, log_zbp, key):
        dt = None
        for arr in T.values():
            dt = arr.dtype
        L = []
        llog = jnp.zeros((), dtype=jnp.float32)
        logq = jnp.zeros((), dtype=jnp.float32)
        log_tr_last = None
        for c in range(nC):
            Kp, bits, lq, log_tr = sam._sample_column(
                T, c, L, rights[c], key, dt, budget=budget
            )
            logq = logq + lq
            if c == nC - 1:
                log_tr_last = log_tr
            else:
                L, dlog = be._zip_column(
                    T, c, L, +1, rank=sam.proj_rank,
                    K_of=lambda v, Kp=Kp: Kp[v], budget=budget,
                )
                llog = llog + dlog
        return jnp.stack([log_tr_last, llog, logq])

    jfn = jax.jit(one_sample_terms)
    for s in range(3):
        key = jax.random.split(jax.random.PRNGKey(0), 4)[s]
        t0 = time.time()
        terms = np.asarray(device_get(jfn(T, rights, rlog, log_zbp, key)))
        lt, ll, lq = terms
        lz = float(np.asarray(device_get(log_zbp.reshape(1)))[0])
        rl = rlog_h[-1]
        print(
            f"sample {s}: log_tr_last={lt:.4f} llog={ll:.4f} logq={lq:.4f} "
            f"rlog[-1]={rl:.4f} log_zbp={lz:.4f} "
            f"poverq=exp({lt + ll + rl - lz:.4f})={np.exp(lt + ll + rl - lz):.6g} "
            f"({time.time() - t0:.1f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
