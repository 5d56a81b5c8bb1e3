"""Export a robot SDF for serving; consume it without the library's build
deps.

Producer side: build the robot (URDF + mesh + voxel-cache sweep), then
`export_robot_query` writes two files — a StableHLO artifact of the fused
FK → per-link SDF → min-union program, and an `.npz` sidecar with the
per-link tables.

Consumer side: `load_robot_query` needs only those two files.  No URDF
parsing, no mesh I/O, no cache rebuild, no tracing — and the artifact is
serialized with its VJP, so `jax.grad` w.r.t. joint angles works for
gradient-based planning in the serving process.

Run:  python examples/serving_export.py       (CPU or TPU, ~1 min)
"""

import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp

import pytorch_volumetric_tpu as pv
from pytorch_volumetric_tpu.utils.robots import make_serial_arm
from pytorch_volumetric_tpu.utils.serving import (export_robot_query,
                                                  load_robot_query)

SMOKE = bool(os.environ.get("PVT_EXAMPLE_SMOKE"))


def main():
    d = tempfile.mkdtemp(prefix="pvt_serving_")

    # -- producer ------------------------------------------------------------
    urdf_path, end_link = make_serial_arm(d, num_joints=3 if SMOKE else 7)
    chain = pv.build_serial_chain_from_urdf(open(urdf_path).read(), end_link)
    robot = pv.RobotSDF(
        chain, path_prefix=d,
        link_sdf_cls=pv.cache_link_sdf_factory(
            resolution=0.06 if SMOKE else 0.03, padding=0.15,
            cache_path=os.path.join(d, "cache.npz")))
    artifact = os.path.join(d, "arm_query.bin")
    export_robot_query(robot, n_configs=16, n_points=1024, path=artifact)
    print(f"artifact: {os.path.getsize(artifact)} B, tables sidecar: "
          f"{os.path.getsize(artifact + '.tables.npz')} B")

    # -- consumer (only the two files) ---------------------------------------
    query = load_robot_query(artifact)
    rng = np.random.default_rng(0)
    M = 3 if SMOKE else 7
    q = jnp.asarray(rng.uniform(-0.5, 0.5, (16, M)), dtype=jnp.float32)
    pts = jnp.asarray(rng.uniform(-0.6, 0.6, (1024, 3)), dtype=jnp.float32)
    val, grad = query(q, pts)
    print(f"query ok: val {val.shape}, grad {grad.shape}, "
          f"min clearance {float(val.min()):.4f}")

    # gradient-based planning in the serving process: push one config away
    # from the points
    def loss(qq):
        return jnp.sum(jax.nn.relu(0.05 - query(qq, pts)[0]) ** 2)

    g = jax.grad(loss)(q)
    print(f"joint-angle gradient through the artifact: |g| = "
          f"{float(jnp.abs(g).sum()):.4f}")


if __name__ == "__main__":
    main()
