"""Jit-compatible runtime self-checks (``jax.experimental.checkify``).

The reference's only online sanitizer is ``CachedSDF(debug_check_sdf=True)``
(reference sdf.py:573-590), a host-side numpy assertion after each call — our
:meth:`CachedSDF._debug_check` mirrors it.  This module adds the pure-device
analog: NaN/inf and gradient-sanity guards that run *inside* the compiled
program, so they work under ``jit``/``vmap``/sharding where host asserts
cannot see intermediate values.

>>> checked = checked_query(sdf)            # raises ValueError on bad output
>>> val, grad = checked(points)

For hot loops, get the raw checkified function (error as a value, no host
sync) with ``checked_query(sdf, throw=False)``:

>>> err, (val, grad) = fn(points)
>>> err.throw()   # or inspect err.get()
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
from jax.experimental import checkify

# SDF gradients are unit directions (analytic paths) or interpolations of
# unit directions (trilinear caches), so anything much above 1 is a bug.
# Learned fields (models.NeuralSDF) are NOT eikonal-constrained between
# training samples; they advertise a looser bound via the
# ``max_grad_norm_hint`` class attribute, which :func:`checked_query`
# honors when the caller does not pass an explicit bound.
DEFAULT_MAX_GRAD_NORM = 1.0 + 1e-3


def guarded_raw_query(raw_query: Callable,
                      max_grad_norm: float = DEFAULT_MAX_GRAD_NORM) -> Callable:
    """Wrap a ``raw_query(pts) -> (val, grad)`` with in-graph checks:
    finite inputs, finite outputs, and ``|grad| <= max_grad_norm``.

    The result must be run through :func:`checkify.checkify` (or use
    :func:`checked_query` which does it for you)."""

    def checked(pts):
        checkify.check(jnp.all(jnp.isfinite(pts)),
                       "non-finite query points")
        val, grad = raw_query(pts)
        checkify.check(jnp.all(jnp.isfinite(val)),
                       "non-finite SDF values")
        checkify.check(jnp.all(jnp.isfinite(grad)),
                       "non-finite SDF gradients")
        gn = jnp.linalg.norm(grad, axis=-1)
        checkify.check(jnp.all(gn <= max_grad_norm),
                       "SDF gradient norm {m} exceeds the unit-direction "
                       "bound", m=jnp.max(gn))
        return val, grad

    return checked


def checked_query(sdf, max_grad_norm: float = None,
                  throw: bool = True) -> Callable:
    """Self-checking version of ``sdf.raw_query`` (any ``ObjectFrameSDF``).

    With ``throw=True`` returns ``fn(pts) -> (val, grad)`` that raises
    ``checkify.JaxRuntimeError`` when a guard trips (one host sync per call).
    With ``throw=False`` returns the raw checkified
    ``fn(pts) -> (err, (val, grad))`` — jit/vmap/shard it freely and decide
    when to pay the sync.

    ``max_grad_norm`` defaults to the SDF's ``max_grad_norm_hint`` attribute
    if present (learned fields set a loose bound), else the unit-direction
    bound exact fields must satisfy.

    SDFs with big per-instance tables (``raw_query_aux``) are guarded
    through ``raw_query_with`` with the tables threaded as ARGUMENTS of an
    internal jit, so wrapping a large ``CachedSDF``/``NarrowBandMeshSDF``
    never bakes its tables in as compile-time constants (CLAUDE.md rule;
    ~60 s vs ~10 s compile per retrace measured at 200 MB)."""
    import jax

    if max_grad_norm is None:
        max_grad_norm = getattr(sdf, "max_grad_norm_hint",
                                DEFAULT_MAX_GRAD_NORM)
    aux = sdf.raw_query_aux() if hasattr(sdf, "raw_query_aux") else None
    if aux is not None:
        leaves, treedef = jax.tree_util.tree_flatten(aux)

        def guarded(pts, *aux_leaves):
            def raw(p):
                return sdf.raw_query_with(
                    jax.tree_util.tree_unflatten(treedef, aux_leaves), p)

            return guarded_raw_query(raw, max_grad_norm)(pts)

        inner = jax.jit(checkify.checkify(guarded))
        fn = lambda pts: inner(pts, *leaves)
    else:
        raw = sdf.raw_query if hasattr(sdf, "raw_query") else sdf
        fn = checkify.checkify(guarded_raw_query(raw, max_grad_norm))
    if not throw:
        return fn

    def run(pts):
        err, out = fn(pts)
        err.throw()
        return out

    return run
