"""External-truth anchor for the TRUNCATED regime (round-4 item 7).

`tests/golden/golden_truncated_oracle.json` holds a dense-statevector
<Z> trajectory (explicit numpy matrices, qiskit conventions — nothing
from the repo's tensor numerics) for the flagship kicked-Ising dynamics
(J=pi/4, theta_h=0.4, the Tindall et al. / `heavyhexIsing_dynamics.jl`
config) on a 21-qubit heavy-hex patch over 6 Trotter layers.  Here the
flex tier and the compiled engine evolve the SAME circuit at chi=4 —
truncation is active from layer 3 (exact bond dimension would be 2^6) —
and are gated against that external truth:

* truncation must actually bite (reported truncation errors > 0), so
  the anchor covers the regime the chi=64 parity goldens gate;
* flex <Z> (boundary-MPS readout, near-exact at these bond dims) must
  sit within the committed deviation envelope of the dense truth — the
  envelope is physics (simple-update truncation error), measured once
  and committed, not tuned;
* the compiled engine must agree with flex far below that envelope
  (cross-tier consistency transfers the anchor to the engine).

Reference discipline being mirrored: `test/test_expect.jl:33-35` gates
against an external truth; `simple_update.jl:21-77` is the truncated
evolution whose error this measures.
"""

import json
import pathlib

import numpy as np
import pytest

jax = pytest.importorskip("jax")

import tnqs
from tnqs.engine import LatticeEngine
from tnqs.models import heavy_hex_kicked_ising_layer

GOLDEN = pathlib.Path(__file__).parent / "golden" / "golden_truncated_oracle.json"

# the deviation envelope lives in the golden ("envelope": 1.5e-3): max
# |flex - dense| measured 6.3e-4 over all 21 vertices after 6 chi=4
# layers (total truncation weight 1.2e-3), committed with ~2.4x headroom
# so the gate detects regressions (a broken truncation path lands orders
# of magnitude above it), not noise


def test_truncated_trajectory_vs_dense_statevector():
    gold = json.loads(GOLDEN.read_text())
    J, th, layers = gold["J"], gold["theta_h"], gold["layers"]
    g = tnqs.heavy_hexagonal_lattice(1, 2)
    verts = list(g.vertices())
    assert sorted(gold["vertices"]) == sorted(str(v) for v in verts)
    layer = heavy_hex_kicked_ising_layer(g, J, th)
    chi = 4

    # -- flex tier (reference execution model), truncation active --------
    psi = tnqs.zerostate(g, dtype=np.complex128)
    bpc = tnqs.BeliefPropagationCache(psi)
    total_trunc = 0.0
    for _ in range(layers):
        bpc, errs = tnqs.apply_gates(
            layer, bpc, apply_kwargs=dict(cutoff=1e-14, maxdim=chi)
        )
        total_trunc += float(np.sum(np.asarray(errs, dtype=float)))
    assert total_trunc > 1e-6, "truncation never bit; oracle regime lost"

    z_flex = tnqs.expect(
        bpc.network, [("Z", [v]) for v in verts],
        alg="boundarymps", mps_bond_dimension=64,
    )
    z_dense = {v: gold["z_dense"][-1][str(v)] for v in verts}
    dev_flex = max(abs(np.real(z) - z_dense[v]) for z, v in zip(z_flex, verts))

    env = gold["envelope"]
    assert dev_flex < env, (
        f"flex truncated trajectory deviates {dev_flex:.4f} from the dense "
        f"statevector truth (committed envelope {env})"
    )

    # -- compiled engine: same circuit, same chi --------------------------
    eng = LatticeEngine(
        tnqs.zerostate(g, dtype=np.complex128), chi=chi, dtype=np.complex128
    )
    eng.bp_update(maxiter=30)
    eng.evolve(layer, num_layers=layers, cutoff=1e-14, bp_maxiter=30)
    z_eng_flex = tnqs.expect(
        eng.to_state(), [("Z", [v]) for v in verts],
        alg="boundarymps", mps_bond_dimension=64,
    )
    dev_eng = max(abs(np.real(z) - z_dense[v]) for z, v in zip(z_eng_flex, verts))
    assert dev_eng < env, (
        f"engine truncated trajectory deviates {dev_eng:.4f} from the dense "
        f"truth (committed envelope {env})"
    )
    # cross-tier: the two truncated trajectories must agree far inside the
    # envelope (they run the same math; only factorization details differ)
    xgap = max(
        abs(np.real(a) - np.real(b)) for a, b in zip(z_flex, z_eng_flex)
    )
    assert xgap < env / 3, f"flex/engine truncated trajectories split by {xgap:.4f}"
