"""Analytic FLOP accounting (`tnqs/utils/flops.py`) — bench observability
(round-5 verdict item 5: quantify speed against hardware, not just the
interpreted baseline).  Pure host-side plan arithmetic; no device work."""

import numpy as np
import pytest

import tnqs
from tnqs.utils.flops import layer_flops, mfu, peak_flops


@pytest.fixture(scope="module")
def small_engine():
    import jax.numpy as jnp

    from tnqs.engine import LatticeEngine
    from tnqs.models import heavy_hex_kicked_ising_layer

    g = tnqs.heavy_hexagonal_lattice(2, 2)
    layer = heavy_hex_kicked_ising_layer(g, float(np.pi / 4), 0.4)
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)
    return LatticeEngine(psi, chi=8, dtype=jnp.complex64), layer


def test_breakdown_sums_and_positivity(small_engine):
    eng, layer = small_engine
    fl = layer_flops(eng, layer)
    parts = fl["two_site_dense"] + fl["svd"] + fl["bp"] + fl["one_site"]
    assert fl["total"] == pytest.approx(parts)
    for key in ("two_site_dense", "svd", "bp", "one_site"):
        assert fl[key] > 0


def test_bp_lower_bound_monotone(small_engine):
    eng, layer = small_engine
    lo = layer_flops(eng, layer, bp_exec_iters=1)
    hi = layer_flops(eng, layer, bp_exec_iters=5)
    assert hi["bp"] == pytest.approx(5 * lo["bp"])
    assert hi["total"] > lo["total"]
    # non-BP terms are iteration-independent
    assert hi["two_site_dense"] == pytest.approx(lo["two_site_dense"])


def test_chi_scaling(small_engine):
    """Dense two-site work grows superlinearly in chi (chi^3-class gauge
    and theta matmuls dominate)."""
    import jax.numpy as jnp

    from tnqs.engine import LatticeEngine
    from tnqs.models import heavy_hex_kicked_ising_layer

    g = tnqs.heavy_hexagonal_lattice(2, 2)
    layer = heavy_hex_kicked_ising_layer(g, float(np.pi / 4), 0.4)
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)
    f8 = layer_flops(LatticeEngine(psi, chi=8, dtype=jnp.complex64), layer)
    f16 = layer_flops(LatticeEngine(psi, chi=16, dtype=jnp.complex64), layer)
    assert f16["two_site_dense"] > 4 * f8["two_site_dense"]


def test_mfu_math(monkeypatch):
    monkeypatch.setenv("TNQS_PEAK_FLOPS", "1e12")
    assert peak_flops() == 1e12
    r = mfu(5e11, 2.0)
    assert r["achieved_flops"] == pytest.approx(1e12)
    assert r["mfu"] == pytest.approx(1.0)
    monkeypatch.delenv("TNQS_PEAK_FLOPS")
    assert peak_flops() == pytest.approx(197e12 / 6.0)
