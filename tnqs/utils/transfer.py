"""Device<->host transfer helpers.

The axon TPU backend (tunneled single chip) implements host<->device copies
for real dtypes only; complex transfers raise UNIMPLEMENTED *asynchronously*
— the poisoned array surfaces the error only when a value is finally read,
so a complex `jnp.asarray` can silently invalidate an entire computation.
`device_get` splits complex arrays into real/imag float transfers on device
and recombines on host; `device_put` does the reverse (two float uploads
combined by a tiny jitted kernel).  All engine transfer paths go through
these.
"""

from __future__ import annotations

import numpy as np

_COMBINE = None


def _combine():
    global _COMBINE
    if _COMBINE is None:
        import jax

        # lax.complex keeps the input width (f32 -> c64, f64 -> c128);
        # `r + 1j*i` would promote to complex128 under jax_enable_x64,
        # which TPUs cannot execute
        _COMBINE = jax.jit(lambda r, i: jax.lax.complex(r, i))
    return _COMBINE


def device_put(x, device=None):
    """jax.device_put that works for complex arrays on the axon backend."""
    import jax
    import jax.numpy as jnp

    x = np.asarray(x)
    if np.iscomplexobj(x):
        target = jnp.complex128 if x.dtype == np.complex128 else jnp.complex64
        real_t = np.float64 if x.dtype == np.complex128 else np.float32
        re = jax.device_put(np.ascontiguousarray(x.real.astype(real_t)), device)
        im = jax.device_put(np.ascontiguousarray(x.imag.astype(real_t)), device)
        return _combine()(re, im).astype(target)
    return jax.device_put(x, device)


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
