"""Tracing and timing utilities.

The reference has no profiling subsystem (only ad-hoc ``timeit`` spans in a
test, reference tests/test_model_to_sdf.py:200-204); for a TPU library the
equivalents are XLA profiler traces plus honest device timing.  Two gotchas
this module encodes:

- On tunneled TPU platforms ``jax.block_until_ready`` may return before the
  device finishes; :func:`device_time` forces a scalar host fetch instead.
- Per-dispatch overhead (tens of ms over a tunnel) dwarfs small kernels, so
  :func:`device_time` chains ``reps`` iterations inside one jitted
  ``lax.scan`` and pays a single dispatch.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA profiler trace viewable in TensorBoard/Perfetto:

    >>> with profiling.trace("/tmp/trace"):
    ...     robot(points)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", log_dir)


@contextlib.contextmanager
def span(name: str, sink: Optional[Dict[str, float]] = None):
    """Named wall-clock span (also emitted as a TraceAnnotation so it shows up
    inside profiler traces)."""
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    dt = time.perf_counter() - t0
    if sink is not None:
        sink[name] = sink.get(name, 0.0) + dt
    logger.info("%s: %.3f ms", name, dt * 1e3)


def device_time(fn: Callable, *args, reps: int = 10) -> float:
    """Seconds per call of ``fn(*args)`` measured on device.

    ``fn`` must return something reducible to a scalar (a float, or any
    array pytree — it is summed).  The function is chained ``reps`` times
    inside one jitted ``lax.scan`` with an iteration-dependent perturbation
    piped through the carry so XLA cannot CSE the repeats, then timed with a
    scalar host fetch.
    """

    def scalarize(out):
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(leaf) for leaf in leaves)

    if not any(jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating)
               for leaf in jax.tree_util.tree_leaves(args)):
        raise ValueError(
            "device_time needs at least one floating-point argument to "
            "perturb per iteration — with data captured in fn's closure the "
            "scan body is loop-invariant and XLA hoists it, reporting ~0 "
            "(measured 10,000x under-report).  Pass the data as *args.")

    @jax.jit
    def run(*a):
        def body(carry, i):
            # iteration-dependent but numerically-inert scale: stops XLA from
            # hoisting the body out of the scan (0.0 * i would be simplified
            # away algebraically; 1e-12 * i survives but is < f32 epsilon)
            scale = 1.0 + 1e-12 * i
            out = fn(*jax.tree_util.tree_map(
                lambda x: x * scale if jnp.issubdtype(jnp.asarray(x).dtype,
                                                      jnp.floating) else x, a))
            return carry + scalarize(out), None

        total, _ = jax.lax.scan(body, jnp.float32(0),
                                jnp.arange(reps, dtype=jnp.float32))
        return total

    float(run(*args))  # compile + warm
    t0 = time.perf_counter()
    acc = float(run(*args))  # scalar fetch = real completion barrier
    dt = (time.perf_counter() - t0) / reps
    logger.debug("device_time: %.3f ms/call (acc=%g)", dt * 1e3, acc)
    return dt
