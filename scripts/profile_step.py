"""Decompose the flagship chi=64 production layer cost on-chip (round-4
item 2: the pjsvd-routed headline is 1.83 layers/s vs the 4.2 subspace
fast mode — find where the residual ~310 ms/layer lives).

Times the SAME fused-step program under component-isolating variants:

  - svd_impl in {pjsvd(auto), xla, subspace-trunc}: the truncation axis
  - bp_maxiter in {25, 5, 1}: the interleaved BP refresh axis

Every config is ONE compiled program timed over `steps` layers with the
host-fetch probe (block_until_ready lies under axon).  Results print as
a table + JSON for the docs.

Run: python scripts/profile_step.py   (holds the TPU lock; ~15 min cold)
"""

import json
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import bench


def time_config(g, layer, chi, steps, trunc, bp_maxiter):
    import os

    import jax
    import jax.numpy as jnp

    import tnqs
    from tnqs.engine import LatticeEngine

    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)
    eng = LatticeEngine(psi, chi=chi, dtype=jnp.complex64)
    if trunc is not None:
        eng.trunc_method = trunc
    fuse = 5
    step = eng.make_step(layer, cutoff=1e-12, bp_maxiter=bp_maxiter,
                         layers_per_call=fuse)

    @jax.jit
    def probe(T, M, errors):
        h = jnp.real(jnp.sum(errors))
        h = h + jnp.real(jnp.sum(M)).astype(h.dtype)
        for arr in T.values():
            h = h + jnp.real(jnp.sum(arr)).astype(h.dtype)
        return jnp.full((1, 1), h)

    def fetch(T, M, errors):
        v = float(np.asarray(probe(T, M, errors))[0, 0])
        if not np.isfinite(v):
            raise RuntimeError("non-finite state")
        return v

    t0 = time.time()
    T, M, errors = step(eng.T, eng.M)
    fetch(T, M, errors)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(steps // fuse):
        T, M, errors = step(T, M)
    fetch(T, M, errors)
    dt = (time.time() - t0) / steps
    return dt, compile_s


def main():
    import os

    bench.acquire_tpu_lock()
    bench.wait_for_tpu()
    g, layer, chi = bench.build_workload()
    steps = int(os.environ.get("TNQS_PROFILE_STEPS", "10"))
    rows = []
    configs = [
        ("production pjsvd bp25", None, 25, None),
        ("xla-svd bp25", None, 25, "xla"),
        ("subspace bp25", "subspace", 25, None),
        ("production bp5", None, 5, None),
        ("production bp1", None, 1, None),
        ("subspace bp1", "subspace", 1, None),
    ]
    for name, trunc, bpi, svd_impl in configs:
        if svd_impl is not None:
            os.environ["TNQS_SVD_IMPL"] = svd_impl
        else:
            os.environ.pop("TNQS_SVD_IMPL", None)
        try:
            dt, compile_s = time_config(g, layer, chi, steps, trunc, bpi)
            rows.append(dict(config=name, ms_per_layer=round(dt * 1e3, 1),
                             layers_per_sec=round(1 / dt, 3),
                             compile_s=round(compile_s, 1)))
            print(json.dumps(rows[-1]), flush=True)
        except Exception as e:
            print(f"# {name} failed: {e!r}", flush=True)
    out = pathlib.Path(__file__).parent / "profile_step_results.json"
    out.write_text(json.dumps(rows, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
