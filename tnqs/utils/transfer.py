"""Device<->host transfer helpers.

The axon TPU backend (tunneled single chip) implements device-to-host copies
for real dtypes only; complex transfers raise UNIMPLEMENTED.  `device_get`
therefore splits complex arrays into real/imag float transfers on device and
recombines on host.  All engine readback paths go through this.
"""

from __future__ import annotations

import numpy as np


def device_get(x):
    """jax.device_get that works for complex arrays on the axon backend."""
    import jax
    import jax.numpy as jnp

    if isinstance(x, dict):
        return {k: device_get(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return type(x)(device_get(v) for v in x)
    if not isinstance(x, jax.Array):
        return np.asarray(x)
    if jnp.iscomplexobj(x):
        re = np.asarray(jax.device_get(jnp.real(x)))
        im = np.asarray(jax.device_get(jnp.imag(x)))
        return re + 1j * im
    return np.asarray(jax.device_get(x))
