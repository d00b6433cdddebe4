"""Isolate the w2-stage vmem OOM (BENCH r4 run: 'Ran out of memory in
memory space vmem. Used 149.65M of 128.00M') and measure the factored-q
sampler with the deterministic exact-SVD emits (commit 492a066) on the
workload-2 state — the config the round-3 verdict item 3 asks to close.

Steps run in one process (one axon client), each fenced:
  1. w2 evolve (compile-cached)
  2. BMPSEngine(rank=10).expect_1site  — NEW exact-emit program
  3. doubled proj_rank=40 sampler, 2 samples   — bench w2 config
  4. factored proj_rank=12, pi=3, 50 samples   — probed-best config
"""
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def fence(name, fn):
    t0 = time.time()
    try:
        out = fn()
        print(f"## {name}: OK in {time.time()-t0:.1f}s -> {out}", flush=True)
        return out
    except Exception as e:
        msg = repr(e)
        if "vmem" in msg or "Ran out of memory" in msg:
            head = msg.split("\\n")[0][:400]
            print(f"## {name}: VMEM-OOM in {time.time()-t0:.1f}s: {head}",
                  flush=True)
        else:
            print(f"## {name}: FAIL in {time.time()-t0:.1f}s: {msg[:400]}",
                  flush=True)
            traceback.print_exc(limit=3)
        return None


def main():
    import jax.numpy as jnp

    import tnqs
    from tnqs.bmps_engine import BMPSEngine, BMPSSampler
    from tnqs.engine import LatticeEngine
    from tnqs.models import heavy_hex_kicked_ising_layer

    g = tnqs.eagle_lattice()
    layer = heavy_hex_kicked_ising_layer(g, float(np.pi / 4), 0.4)
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)
    eng = LatticeEngine(psi, chi=8, dtype=jnp.complex64)
    step = eng.make_step(layer, cutoff=1e-12, bp_maxiter=25)

    def evolve():
        T, M = eng.T, eng.M
        for _ in range(20):
            T, M, _ = step(T, M)
        eng.T, eng.M = T, M
        return "20 layers"

    fence("evolve", evolve)

    def expect10():
        be = BMPSEngine(eng, rank=10)
        z = be.expect_1site("Z", vertices=[(11, 5)])
        return f"Z(11,5)={float(np.real(z[(11, 5)])):.6f}"

    fence("expect rank10 (exact-emit)", expect10)

    def doubled40():
        sam = BMPSSampler(BMPSEngine(eng, rank=10), proj_rank=40)
        cert = sam.sample_directly_certified(2, seed=0, chunk=2)
        pq = np.array([c["poverq"] for c in cert])
        return f"p/q {pq}"

    fence("doubled proj40 n=2", doubled40)

    def factored12():
        be = BMPSEngine(eng, rank=10, oversample=8, power_iters=3)
        sam = BMPSSampler(be, proj_rank=12, q_mode="factored")
        cert = sam.sample_directly_certified(50, seed=0, chunk=10)
        pq = np.array([c["poverq"] for c in cert])
        return (f"p/q mean {pq.mean():.4f} rel-std {pq.std()/pq.mean():.2e} "
                f"min {pq.min():.2e}")

    fence("factored r12 pi3 n=50", factored12)


if __name__ == "__main__":
    main()
