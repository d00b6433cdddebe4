"""Finite-temperature hexagonal-lattice Heisenberg model via imaginary-time
simple update of a purified operator state.

Mirrors `/root/reference/examples/hexagonal_heisenbergmodel_thermalstate.jl`:
the BP free-energy density is compared against the 4th-order HTSE.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import os

import numpy as np

import tnqs
from tnqs.models import heisenberg_imaginary_time_gates, htse_free_energy_density_4th

FAST = bool(os.environ.get("TNQS_EXAMPLE_FAST"))


def main():
    chi = 8 if FAST else 32
    g = tnqs.named_hexagonal_lattice_graph(2, 2, periodic=True)
    s = tnqs.siteinds("S=1/2", g, inds_per_site=2)
    psi = tnqs.identity_tensornetworkstate(g, s, dtype=np.float64)
    bpc = tnqs.BeliefPropagationCache(psi).update()

    print("Finite temp simulation of hexagonal Heisenberg model")
    dbeta, J = 0.01, 1.0
    gates = heisenberg_imaginary_time_gates(g, s, J, dbeta)
    apply_kwargs = dict(maxdim=chi, cutoff=1e-14, normalize_tensors=False)

    nsteps = 10 if FAST else 25
    logz = -bpc.freenergy()
    bpc.rescale_()
    for i in range(1, nsteps + 1):
        bpc, errs = tnqs.apply_gates(gates, bpc, apply_kwargs=apply_kwargs)
        logz -= bpc.freenergy()
        bpc.rescale_()
        if i % 5 == 0:
            beta = 2 * i * dbeta  # doubled: sqrt-state measured over the norm
            f_bp = np.real(logz) / g.nv()
            f_htse = htse_free_energy_density_4th(J, beta)
            print(f"beta = {beta:.2f}: BP free-energy density {f_bp:.8f}")
            print(f"    |BP - 4th-order HTSE| = {abs(f_htse - f_bp):.3e}")

    # the same workload on the compiled engine: folded operator sites
    # (d = 4), one XLA program per Trotter layer, per-step on-device
    # freenergy + rescale accounting
    import jax

    from tnqs.engine import LatticeEngine
    from tnqs.models import heisenberg_thermal_layer

    # C128 is not a supported TPU type; the engine demo runs f64-precision
    # on CPU and c64 on an accelerator backend
    eng_dtype = (
        np.complex128 if jax.default_backend() == "cpu" else np.complex64
    )
    eng = LatticeEngine(
        tnqs.identity_tensornetworkstate(g, s, dtype=np.float64),
        chi=chi, dtype=eng_dtype,
    )
    eng.bp_update(maxiter=30)
    step = eng.make_step(
        heisenberg_thermal_layer(g, J, dbeta), cutoff=1e-14, normalize=False
    )
    logz_e = -eng.freenergy()
    eng.rescale()
    for i in range(1, nsteps + 1):
        eng.T, eng.M, _ = step(eng.T, eng.M)
        logz_e -= eng.freenergy()
        eng.rescale()
    f_eng = np.real(logz_e) / g.nv()
    beta = 2 * nsteps * dbeta
    print(f"compiled engine at beta = {beta:.2f}: {f_eng:.8f} "
          f"(|engine - flex| = {abs(f_eng - np.real(logz) / g.nv()):.3e})")


if __name__ == "__main__":
    main()
