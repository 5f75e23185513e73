"""Profiling hooks: thin wrapper over the JAX profiler.

The reference has no tracing/profiling at all (SURVEY §5); here any solve
or batched sweep can be captured to a Perfetto/XPlane trace::

    with profile_trace("/tmp/pockit-trace"):
        res = ipm.solve_batch(system, guesses)

View with TensorBoard's profile plugin or ui.perfetto.dev.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax


@contextmanager
def profile_trace(log_dir: str):
    """Context manager capturing a device/host profile of the enclosed ops."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
