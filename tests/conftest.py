"""Test configuration.

Force JAX onto a virtual 8-device CPU mesh so multi-chip sharding paths can
be exercised without TPU hardware (the driver separately dry-runs the
multichip path).  Must run before jax is imported anywhere.
"""

import os

# Unconditionally pin the suite to CPU: the ambient environment may pin an
# accelerator platform (observed: JAX_PLATFORMS=axon plus a sitecustomize
# that registers a tunneled-TPU backend and routes every XLA compile through
# the tunnel, which makes the suite ~50x slower and serializes against any
# real TPU job).  Tests exercise multi-chip sharding on the virtual 8-device
# CPU mesh; the driver separately dry-runs the TPU path.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# the sitecustomize may already have overwritten jax_platforms ("axon,cpu");
# re-pin before any backend initializes
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
