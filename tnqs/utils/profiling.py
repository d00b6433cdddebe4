"""Profiling hooks: JAX profiler traces around hot regions.

The reference has no profiling framework — only ad-hoc `@timed` prints under
`verbose=true` (`/root/reference/src/Apply/apply_gates.jl:76,87`).  The
TPU-native equivalent is an xprof/TensorBoard trace: wrap any region in
:func:`trace` (or set ``TNQS_PROFILE=<dir>`` to arm :func:`trace_from_env`,
which `bench.py` wraps around its timed loop) and load the resulting
directory in TensorBoard's profile plugin or Perfetto.

On tunneled (axon) backends device-side traces may be unavailable; the trace
then still records host-side XLA dispatch, which is what the compile/launch
overruns show up in.
"""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def trace(log_dir: str | None):
    """Context manager: jax.profiler trace into `log_dir` (no-op if falsy)."""
    if not log_dir:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    # Only the profiler ENTRY is guarded: an exception raised by the user's
    # code inside the region must propagate unchanged (a blanket try around
    # the yield would make this generator yield twice and contextlib would
    # replace the real exception with "generator didn't stop after throw()").
    ctx = jax.profiler.trace(log_dir)
    try:
        ctx.__enter__()
        armed = True
    except Exception:
        # profiling must never take down the run (tunneled backends can
        # reject device tracing); fall through un-traced
        armed = False
    try:
        yield
    finally:
        if armed:
            try:
                ctx.__exit__(None, None, None)
            except Exception:
                pass


def trace_from_env(var: str = "TNQS_PROFILE"):
    """`trace()` armed by an environment variable holding the log dir."""
    return trace(os.environ.get(var))


@contextlib.contextmanager
def annotate(name: str):
    """Named sub-region inside an active trace (TraceAnnotation)."""
    import jax

    try:
        ctx = jax.profiler.TraceAnnotation(name)
    except Exception:
        yield
        return
    with ctx:
        yield
