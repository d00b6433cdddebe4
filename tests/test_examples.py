"""Run all example scripts end-to-end in fast mode (mirrors reference
`test/test_examples.jl`)."""

import os
import pathlib
import subprocess
import sys

import pytest

EXAMPLES_DIR = pathlib.Path(__file__).resolve().parent.parent / "examples"

SCRIPTS = [
    "ising_2d_dynamics.py",
    "ising_3d_dynamics.py",
    "heavyhex_ising_dynamics.py",
    "hexagonal_heisenberg_thermalstate.py",
    "heisenberg_picture_dynamics.py",
    "boundarymps_convergence.py",
    "loop_corrections.py",
    "engine_heavyhex_production.py",
    "variational_groundstate.py",
]


def test_all_examples_listed():
    """Every script in examples/ must be in SCRIPTS (and so smoke-tested)."""
    on_disk = {p.name for p in EXAMPLES_DIR.glob("*.py")}
    assert on_disk == set(SCRIPTS)


@pytest.mark.parametrize("script", SCRIPTS)
def test_example_runs(script):
    env = dict(os.environ)
    env["TNQS_EXAMPLE_FAST"] = "1"
    env["PYTHONPATH"] = str(EXAMPLES_DIR.parent) + os.pathsep + env.get("PYTHONPATH", "")
    # pin the subprocess to CPU: force both the env var and skip the
    # tunneled-TPU sitecustomize registration (which overrides the var)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    out = subprocess.run(
        [sys.executable, str(EXAMPLES_DIR / script)],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, f"{script} failed:\n{out.stdout}\n{out.stderr}"
