"""Multi-device sharding for SDF query and optimization workloads.

The reference is single-device (SURVEY §2.3: no collectives anywhere); this
layer is new, TPU-first design: batched robot-SDF queries are sharded over a
``jax.sharding.Mesh`` with a ``config`` axis (data parallelism over joint
configurations) and a ``point`` axis (parallelism over query points), with
mesh triangle / voxel-grid data replicated.  XLA's SPMD partitioner inserts
the collectives: the forward min-union is fully local; joint-angle gradients
are all-reduced over the ``point`` axis in the backward pass, riding ICI on a
TPU slice.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P



CONFIG_AXIS = "config"
POINT_AXIS = "point"


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids=None) -> Tuple[int, int]:
    """Initialize multi-host JAX (one process per host on a TPU pod slice)
    and return ``(process_index, process_count)``.

    On TPU pods ``jax.distributed.initialize`` auto-detects every argument
    from the environment, so ``init_distributed()`` with no arguments is the
    whole ceremony; afterwards ``jax.devices()`` is the *global* device list
    and :func:`make_device_mesh` builds cross-host meshes whose collectives
    ride ICI within a slice and DCN across slices.

    Single-process runs (no coordinator given, no cluster environment) are a
    no-op returning ``(0, 1)`` — library code can call this unconditionally.
    Calling again after initialization is also a no-op.
    """
    import os
    explicit = coordinator_address is not None or num_processes is not None
    workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    cluster_env = (len(workers.split(",")) > 1
                   or any(v in os.environ for v in (
                       "COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
                       "MEGASCALE_COORDINATOR_ADDRESS")))
    if not explicit and not cluster_env:
        return jax.process_index(), jax.process_count()
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id,
                                   local_device_ids=local_device_ids)
    except RuntimeError as e:
        msg = str(e).lower()
        # "already"/"once": repeat call after successful init — idempotent
        # no-op.  "must be called before": the XLA backend is already up
        # in-process; benign for auto-detected single-process sessions, but
        # a REAL error when the caller explicitly requested a multi-host
        # setup we can no longer honor.
        repeat_call = "already" in msg or "once" in msg
        backend_up = "must be called before" in msg
        if not (repeat_call or (backend_up and not explicit)):
            raise
    except ValueError:
        # auto-detection from a cluster-looking environment came up short
        # (e.g. no coordinator address); with explicit arguments that is a
        # real configuration error, otherwise fall back to single-process
        if explicit:
            raise
    return jax.process_index(), jax.process_count()


def make_device_mesh(n_config: Optional[int] = None, n_point: Optional[int] = None,
                     devices=None) -> Mesh:
    """Build a 2D (config, point) device mesh.

    Defaults: all devices on the ``config`` axis (configuration batches are
    the natural outermost data-parallel axis; queries/s scale linearly since
    the forward pass needs no cross-device communication).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_config is None and n_point is None:
        n_config, n_point = n, 1
    elif n_config is None:
        n_config = n // n_point
    elif n_point is None:
        n_point = n // n_config
    if n_config * n_point != n:
        raise ValueError(f"mesh {n_config}x{n_point} != {n} devices")
    arr = np.asarray(devices).reshape(n_config, n_point)
    return Mesh(arr, (CONFIG_AXIS, POINT_AXIS))


def _pad_to_multiple(x: jnp.ndarray, multiple: int, axis: int):
    size = x.shape[axis]
    target = math.ceil(size / multiple) * multiple
    if target == size:
        return x, size
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - size)
    return jnp.pad(x, pad), size


def pad_for_mesh(x: jnp.ndarray, mesh: Mesh, axis_name: str, axis: int = 0,
                 segment: int = 1):
    """Pad ``x`` along ``axis`` (zeros) so its size divides the mesh axis
    ``axis_name`` with a per-device chunk that is a multiple of ``segment``
    (``segment=4`` for the coherent brick path, whose 4-point segments must
    not straddle device boundaries).  Returns ``(padded, original_size)`` —
    slice the outputs back with ``out[..:original_size]``."""
    return _pad_to_multiple(x, mesh.shape[axis_name] * segment, axis)


def sharded_robot_query(robot_sdf, mesh: Mesh) -> Callable:
    """The fused FK→transform→SDF→min-union query with configs sharded over
    ``config`` and points over ``point``; everything else replicated.

    Built with ``shard_map``, NOT bare GSPMD in/out shardings: each device
    runs the whole local program on its (config block, point block), which
    makes the forward communication-free BY CONSTRUCTION.  Under GSPMD the
    per-child ``reshape(batch * F, 3)`` flatten (compose_query) merges the
    config- and point-sharded axes and the partitioner inserts
    all-gather/all-to-all resharding around every mesh-link sweep (measured:
    7 all-to-alls + 4 all-gathers in the 4-link forward — caught by
    ``parallel.audit``, which now pins zero collectives).

    Returns ``fn(q [A, M], pts [P, 3]) -> (val [A, P], grad [A, P, 3])``.
    ``A`` must divide by the config-axis size and ``P`` by the point-axis size
    (pad with :func:`pad_for_mesh` otherwise).
    """
    fn, leaves = robot_sdf.fused_query_fn()
    jitted = jax.jit(jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(CONFIG_AXIS, None), P(POINT_AXIS, None))
        + tuple(P() for _ in leaves),
        out_specs=(P(CONFIG_AXIS, POINT_AXIS),
                   P(CONFIG_AXIS, POINT_AXIS, None))))

    def run(q, pts):
        return jitted(q, pts, *leaves)

    # expose the jit object + bound table arguments for AOT lowering
    # (parallel.audit counts cross-device collectives in the optimized HLO)
    run.jitted, run.extra_args = jitted, tuple(leaves)
    return run


def sharded_robot_query_coherent(robot_sdf, mesh: Mesh,
                                 values_only: bool = False,
                                 seg: int = 4) -> Callable:
    """Like :func:`sharded_robot_query` but on the segmented brick-gather
    fast path (``compose_query_coherent``) for spatially-coherent point
    sweeps.  ``P`` must divide into per-device chunks that are multiples of
    ``seg`` so point groups stay intact under the point-axis sharding
    (contiguous chunk per device).  ``seg``: points per brick row — 4 for
    raster lines, or the tile size from ``voxel.get_coherent_tile_points``.
    ``values_only=True`` returns just ``val [A, P]`` (gradients stopped;
    skips the winner-gradient rows — collision checks / occupancy rasters)."""
    from pytorch_volumetric_tpu.sdf import (coherent_fast_tables,
                                            coherent_generic_aux,
                                            compose_query_coherent)

    children = tuple(robot_sdf.sdf.sdfs)

    def fn(q, pts, fast_tables, generic_aux):
        m, m_inv = robot_sdf._link_transforms(q)
        return compose_query_coherent(children, m, m_inv, q.shape[0], pts,
                                      fast_tables=fast_tables,
                                      values_only=values_only,
                                      generic_aux=generic_aux, seg=seg)

    # shard_map (not bare GSPMD): zero-collective forward by construction —
    # see sharded_robot_query's docstring
    val_spec = P(CONFIG_AXIS, POINT_AXIS)
    jitted = jax.jit(jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(CONFIG_AXIS, None), P(POINT_AXIS, None),
                  P(),   # tables replicated
                  P()),
        out_specs=val_spec if values_only else
        (val_spec, P(CONFIG_AXIS, POINT_AXIS, None))))
    ft = coherent_fast_tables(children)
    ga = coherent_generic_aux(children)
    n_pt = mesh.shape[POINT_AXIS]

    def run(q, pts):
        # groups are `seg` consecutive points; the point axis must split into
        # equal contiguous per-device chunks of whole groups, or GSPMD
        # would silently tear groups across device boundaries.
        n = pts.shape[0]
        if n % n_pt != 0 or (n // n_pt) % seg != 0:
            raise ValueError(
                f"coherent sharding needs the point count ({n}) to split "
                f"into per-device chunks that are multiples of {seg} over "
                f"the {n_pt}-way '{POINT_AXIS}' axis (got chunk "
                f"{n / n_pt:g}); pad with pad_for_mesh(pts, mesh, "
                f"POINT_AXIS, segment={seg}) to a multiple of {seg * n_pt}")
        return jitted(q, pts, ft, ga)

    run.jitted, run.extra_args = jitted, (ft, ga)  # for parallel.audit
    return run


def sharded_neural_robot_query(model, mesh: Mesh) -> Callable:
    """Shard a learned configuration-space field
    (``models.ConfigSpaceNeuralSDF``) like :func:`sharded_robot_query`:
    configs over ``config``, points over ``point``, weights replicated.
    The forward is pure MXU matmuls, so scaling is embarrassingly parallel;
    returns ``fn(q [A, M], pts [P, 3]) -> (val [A, P], grad [A, P, 3])``.
    shard_map (not bare GSPMD): zero-collective forward by construction —
    see sharded_robot_query's docstring."""
    def body(q, pts):
        # the model's spatial gradient is an in-body jax.vjp w.r.t. pts; pts
        # arrives config-UNVARIED (replicated over that mesh axis), so the
        # vjp transpose would insert a psum over `config` — summing the
        # gradients of DIFFERENT configurations across devices.  Promoting
        # pts to config-varying first makes each device's copy independent
        # (values unchanged; measured: without this, sharded gradients were
        # the cross-device config-sum, 100% mismatched).
        pts = jax.lax.pvary(pts, (CONFIG_AXIS,))
        return model.query(q, pts)

    jitted = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(CONFIG_AXIS, None), P(POINT_AXIS, None)),
        out_specs=(P(CONFIG_AXIS, POINT_AXIS),
                   P(CONFIG_AXIS, POINT_AXIS, None))))

    def run(q, pts):
        return jitted(q, pts)

    run.jitted, run.extra_args = jitted, ()  # for parallel.audit
    return run


def sharded_sdf_query(sdf, mesh: Mesh) -> Callable:
    """Shard a plain ``ObjectFrameSDF`` query's flat point batch across every
    device of the mesh (both axes).  Big per-instance tables ride in as
    replicated ARGUMENTS via the raw_query_aux/raw_query_with protocol
    (capturing them would bake multi-hundred-MB constants into the program;
    see CLAUDE.md)."""
    aux = sdf.raw_query_aux()
    # shard_map (not bare GSPMD), so per-point chunking (lax.map in the
    # triangle sweep) happens on each device's LOCAL block: zero-collective
    # forward by construction — see sharded_robot_query's docstring
    val_spec = P((CONFIG_AXIS, POINT_AXIS))
    pts_spec = P((CONFIG_AXIS, POINT_AXIS), None)
    out_specs = (val_spec, pts_spec)
    if aux is None:
        jitted = jax.jit(jax.shard_map(
            lambda pts: sdf.raw_query(pts), mesh=mesh,
            in_specs=(pts_spec,), out_specs=out_specs))

        def run(pts):
            return jitted(pts)

        run.jitted, run.extra_args = jitted, ()
        return run
    leaves, treedef = jax.tree_util.tree_flatten(aux)

    def fn(pts, *aux_leaves):
        return sdf.raw_query_with(
            jax.tree_util.tree_unflatten(treedef, aux_leaves), pts)

    jitted = jax.jit(jax.shard_map(
        fn, mesh=mesh,
        in_specs=(pts_spec, *(P() for _ in leaves)),
        out_specs=out_specs))

    def run(pts):
        return jitted(pts, *leaves)

    run.jitted, run.extra_args = jitted, tuple(leaves)  # for parallel.audit
    return run


def make_collision_step(robot_sdf, optimizer, margin: float = 0.1,
                        mesh: Optional[Mesh] = None) -> Callable:
    """Build a full sharded training step: minimize penetration/clearance loss
    of the robot (over a batch of configurations) against a point cloud, by
    gradient descent on the joint configurations.

    The loss ``mean(relu(margin - sdf(q, pts))^2)`` needs the analytic SDF
    gradients w.r.t. joint angles — the chain FK → point transform →
    ``custom_vjp`` SDF gradient.  With a mesh given, configs shard over
    ``config`` and points over ``point``; the joint-gradient all-reduce over
    the point axis is inserted by the SPMD partitioner and overlaps the
    backward pass.

    Returns ``step(q [A, M], opt_state, pts [P, 3]) -> (q', opt_state', loss)``.
    """
    query_fn, leaves = robot_sdf.fused_query_fn()
    if mesh is not None:
        # shard_map'd forward (zero collectives — sharded_robot_query's
        # docstring); the loss mean OUTSIDE the shard_map and the transpose
        # of the config-sharded/point-replicated q block give the backward
        # its all-reduce set (exactly the psums parallel.audit expects)
        sharded_query = jax.shard_map(
            query_fn, mesh=mesh,
            in_specs=(P(CONFIG_AXIS, None), P(POINT_AXIS, None))
            + tuple(P() for _ in leaves),
            out_specs=(P(CONFIG_AXIS, POINT_AXIS),
                       P(CONFIG_AXIS, POINT_AXIS, None)))

    def loss_fn(q, pts, aux):
        fn = query_fn if mesh is None else sharded_query
        val, _ = fn(q, pts, *aux)
        return jnp.mean(jax.nn.relu(margin - val) ** 2)

    def step(q, opt_state, pts, aux):
        loss, g = jax.value_and_grad(loss_fn)(q, pts, aux)
        updates, opt_state = optimizer.update(g, opt_state, q)
        q = jax.tree_util.tree_map(lambda p, u: p + u, q, updates)
        return q, opt_state, loss

    if mesh is None:
        jitted = jax.jit(step)
    else:
        # q-shaped optimizer-state leaves (adam moments) shard WITH q: a
        # replicated opt_state would all-gather the config-sharded moments
        # every step (caught by parallel.audit); sharded, the whole update
        # is local and the step's only collectives are the backward's
        # all-reduces.  Shardings depend on the state pytree, so the jit is
        # built lazily on first call.
        q_sh = NamedSharding(mesh, P(CONFIG_AXIS, None))
        pts_sh = NamedSharding(mesh, P(POINT_AXIS, None))
        repl = NamedSharding(mesh, P())
        _cache = {}

        def build(q, opt_state):
            def leaf_sh(leaf):
                shaped = getattr(leaf, "shape", ()) == q.shape
                return q_sh if shaped else repl

            state_sh = jax.tree_util.tree_map(leaf_sh, opt_state)
            aux_sh = jax.tree_util.tree_map(lambda _: repl, leaves)
            return jax.jit(step,
                           in_shardings=(q_sh, state_sh, pts_sh, aux_sh),
                           out_shardings=(q_sh, state_sh, repl))

        def jitted(q, opt_state, pts, aux):
            key = (q.shape,
                   jax.tree_util.tree_structure((opt_state, aux)))
            if key not in _cache:
                _cache[key] = build(q, opt_state)
            return _cache[key](q, opt_state, pts, aux)

    def run(q, s, pts):
        return jitted(q, s, pts, leaves)

    def lower(q, s, pts, aux):  # parallel.audit entry (AOT lowering)
        fn = jitted if mesh is None else build(q, s)
        return fn.lower(q, s, pts, aux)

    run.jitted = type("_L", (), {"lower": staticmethod(lower)})()
    run.extra_args = (leaves,)
    return run
