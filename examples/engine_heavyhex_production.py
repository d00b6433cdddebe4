"""Production evolution path: the compiled engine on the heavy-hex
kicked-Ising benchmark, with mid-run checkpointing and on-device
measurement — the TPU-native counterpart of
`/root/reference/examples/heavyhexIsing_dynamics.jl` (see
`examples/heavyhex_ising_dynamics.py` for the flex-tier version).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import os
import tempfile
import time

import numpy as np

import jax.numpy as jnp

import tnqs
from tnqs.engine import LatticeEngine
from tnqs.models import heavy_hex_kicked_ising_layer

FAST = bool(os.environ.get("TNQS_EXAMPLE_FAST"))


def main():
    nx, ny = (2, 2) if FAST else (5, 5)
    chi = 4 if FAST else 64
    steps = 2 if FAST else 20

    g = tnqs.heavy_hexagonal_lattice(nx, ny)
    print(f"heavy-hex lattice with {g.nv()} qubits, chi={chi}")
    layer = heavy_hex_kicked_ising_layer(g, float(np.pi / 4), 0.4)
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)

    eng = LatticeEngine(psi, chi=chi, dtype=jnp.complex64)
    step = eng.make_step(layer, cutoff=1e-12, bp_maxiter=25)

    ckpt = pathlib.Path(tempfile.mkdtemp()) / "engine.npz"
    t0 = time.time()
    for i in range(1, steps + 1):
        eng.T, eng.M, errors = step(eng.T, eng.M)
        if i == steps // 2:
            tnqs.save_engine(eng, ckpt)  # mid-run checkpoint
    z = eng.expect_1site("Z")  # host fetch: forces the chain to completion
    wall = time.time() - t0
    print(f"{steps} layers in {wall:.1f}s ({steps / wall:.2f} layers/s)")

    center = min(g.vertices(), key=lambda v: sum(abs(c) for c in np.subtract(v, np.mean([list(u) for u in g.vertices()], axis=0))))
    print(f"<Z> at {center}: {np.real(z[center]):.6f}")
    zz = eng.expect_2site("Z", "Z")
    e0 = g.edges()[0]
    print(f"<ZZ> on {e0}: {np.real(zz[e0]):.6f}")

    # resume from the checkpoint and verify it replays to the same state
    eng2 = tnqs.load_engine(ckpt)
    step2 = eng2.make_step(layer, cutoff=1e-12, bp_maxiter=25)
    for _ in range(steps - steps // 2):
        eng2.T, eng2.M, _ = step2(eng2.T, eng2.M)
    z2 = eng2.expect_1site("Z")
    diff = max(abs(z[v] - z2[v]) for v in g.vertices())
    print(f"checkpoint resume max <Z> deviation: {diff:.2e}")

    # entanglement structure + BP-quality diagnostics, all on device:
    # per-bond entropies from the converged messages (one batched
    # eigensolve) and the loop-series-corrected partition function
    # (plaquette cycles as batched transfer-matrix ring products)
    S = eng.bond_entropies(alpha=1)
    smax = max(S.items(), key=lambda kv: kv[1])
    print(f"max bond entropy {smax[1]:.4f} on {smax[0]}")
    z_bp = eng.partitionfunction()
    # heavy-hex plaquettes are 12-cycles (shorter sizes find no configs)
    z_loop = eng.loopcorrected_partitionfunction(12)
    print(f"Z_BP = {z_bp:.6e}; loop-corrected relative shift "
          f"{abs(z_loop - z_bp) / abs(z_bp):.2e}")

    # compiled boundary-MPS measurement + certified sampling (the full
    # BASELINE workload-2 pipeline stays on-device; the flex tier remains
    # available via eng.to_state() + tnqs.expect(alg="boundarymps"))
    from tnqs.bmps_engine import BMPSEngine, BMPSSampler

    rank = 4 if FAST else 10
    be = BMPSEngine(eng, rank=rank)
    zb = be.expect_1site("Z")
    print(f"compiled boundary-MPS <Z> at {center}: {zb[center].real:.6f}")
    sam = BMPSSampler(be, proj_rank=4 * rank)
    cert = sam.sample_directly_certified(10 if FAST else 50, seed=0)
    pq = np.array([c["poverq"] for c in cert])
    print(f"certified sampling: mean(p/q)={pq.mean():.4f} rel-std={pq.std()/pq.mean():.2e}")
    sz_is = sum(
        c["poverq"] * (1 - 2 * c["bitstring"][center]) for c in cert
    ) / pq.sum()
    print(f"importance-sampled <Z> at {center}: {sz_is:.4f}")


if __name__ == "__main__":
    main()
