"""Distill an exact robot SDF into a learned configuration-space field.

Workflow shown here:

1. Build the exact oracle: procedural 7-DOF arm -> `RobotSDF` with cached
   link fields (the parity path, matching the reference's
   model_to_sdf.py:12-125 semantics).
2. Distill it: `fit_config_space_sdf` samples (q, x, d, grad) tuples from
   the oracle and trains `f(q, x)` — a sine MLP on Fourier-lifted points —
   with direct value+gradient supervision, as one jitted `lax.scan`.
3. Use it like a `RobotSDF` (same query API) inside a gradient-descent
   collision-clearance step: per-point cost is a few MXU matmuls,
   independent of link/triangle/voxel counts, and `jax.grad` w.r.t. the
   joint configuration goes through plain autodiff instead of
   FK + voxel-field custom VJPs.

Run:  python examples/neural_distillation.py      (CPU ~2 min, TPU faster)
"""

import os
import sys
import tempfile
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

import pytorch_volumetric_tpu as pv
from pytorch_volumetric_tpu.models import fit_config_space_sdf
from pytorch_volumetric_tpu.utils.robots import make_serial_arm

# PVT_EXAMPLE_SMOKE=1: tiny model/budget for the CI smoke test
SMOKE = bool(os.environ.get("PVT_EXAMPLE_SMOKE"))


def main():
    # -- 1. exact oracle -----------------------------------------------------
    d = tempfile.mkdtemp(prefix="pvt_neural_")
    urdf_path, end_link = make_serial_arm(d, num_joints=7)
    chain = pv.build_serial_chain_from_urdf(open(urdf_path).read(), end_link)
    robot = pv.RobotSDF(
        chain, path_prefix=d,
        link_sdf_cls=pv.cache_link_sdf_factory(
            resolution=0.06 if SMOKE else 0.03, padding=0.15,
            cache_path=os.path.join(d, "cache.npz")))

    # -- 2. distillation -----------------------------------------------------
    t0 = time.perf_counter()
    model, losses = fit_config_space_sdf(
        robot, key=0, width=32 if SMOKE else 128, depth=3 if SMOKE else 4,
        fourier=16 if SMOKE else 64, n_configs=8 if SMOKE else 128,
        pts_per_config=64 if SMOKE else 1024, steps=30 if SMOKE else 1500,
        batch=256 if SMOKE else 4096, lr=1e-3)
    print(f"distilled in {time.perf_counter() - t0:.1f}s; "
          f"loss {float(losses[:50].mean()):.4f} -> "
          f"{float(losses[-50:].mean()):.4f}")

    # accuracy on held-out configurations
    rng = np.random.default_rng(7)
    lims = robot.chain.get_joint_limits()
    qs = jnp.asarray(rng.uniform(lims[:, 0], lims[:, 1], (8, 7)),
                     dtype=jnp.float32)
    pts = jnp.asarray(rng.uniform(-0.8, 0.8, (2048, 3)), dtype=jnp.float32)
    robot.set_joint_configuration(qs)
    v_gt, _ = robot(pts)
    v, _ = model.set_joint_configuration(qs)(pts)
    err = np.asarray(v - v_gt)
    shell = np.abs(np.asarray(v_gt)) < 0.1
    losses_fl = float(losses[-1])
    assert np.isfinite(losses_fl), losses_fl
    print(f"held-out rmse: overall {np.sqrt((err**2).mean()):.4f}, "
          f"near-surface {np.sqrt((err[shell]**2).mean()):.4f}")

    # -- 3. clearance descent through the learned field ----------------------
    obstacles = jnp.asarray(
        np.array([0.35, 0.0, 0.7], dtype=np.float32)
        + 0.12 * rng.normal(size=(256, 3)).astype(np.float32))
    margin = 0.08

    def clearance_loss(q):
        dvals = model.value(q, obstacles)
        return jnp.mean(jax.nn.relu(margin - dvals) ** 2)

    q = jnp.asarray(rng.uniform(-0.3, 0.3, (7,)), dtype=jnp.float32)
    opt = optax.adam(3e-2)
    state = opt.init(q)

    @jax.jit
    def step(q, state):
        loss, g = jax.value_and_grad(clearance_loss)(q)
        updates, state = opt.update(g, state, q)
        return optax.apply_updates(q, updates), state, loss

    for it in range(10 if SMOKE else 60):
        q, state, loss = step(q, state)
    print(f"clearance loss after descent: {float(loss):.3e}")

    # verify against the EXACT field: did the descent through the learned
    # model actually clear the obstacles?
    robot.set_joint_configuration(q[None])
    v_exact, _ = robot(obstacles)
    print(f"exact min clearance at solution: {float(v_exact.min()):.4f} "
          f"(margin target {margin})")
    return float(v_exact.min())


if __name__ == "__main__":
    main()
