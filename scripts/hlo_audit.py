"""Static scaling proof artifact: cross-device collective census of every
sharded entry point's optimized HLO on an 8-device mesh.

Multi-chip hardware is unavailable here, so the >= 90%-linear-scaling north
star (BASELINE.md) is proven statically: the sharded FORWARD queries must
compile to ZERO cross-device collectives (pure data parallelism — per-chip
wall-clock is then independent of chip count by construction), and the
collision TRAINING step must carry exactly all-reduces (the joint-gradient /
loss psums) and nothing else.  ``tests/test_parallel.py::
test_hlo_collective_audit`` pins these properties in CI; this script writes
the round's committed evidence.

Usage: python scripts/hlo_audit.py [OUT.json]
"""

import json
import os
import sys
import tempfile

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

import pytorch_volumetric_tpu as pv  # noqa: E402
from pytorch_volumetric_tpu import parallel  # noqa: E402
from pytorch_volumetric_tpu.utils.robots import make_serial_arm  # noqa: E402


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "artifacts_r05/hlo_collective_audit.json"
    d = tempfile.mkdtemp(prefix="pvt_audit_")
    rng = np.random.default_rng(0)
    rows = {}

    mesh = parallel.make_device_mesh(n_config=4, n_point=2)
    q = jnp.asarray(rng.uniform(-1, 1, (8, 3)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-0.5, 0.5, (64, 3)).astype(np.float32))

    # 1. fused plain query (4 MeshSDF links, exact triangle sweeps)
    urdf_path, end_link = make_serial_arm(d, num_joints=3, link_length=0.2,
                                          segments=10, rings=3)
    chain = pv.build_serial_chain_from_urdf(open(urdf_path).read(), end_link)
    robot = pv.RobotSDF(chain, path_prefix=d)
    fn = parallel.sharded_robot_query(robot, mesh)
    rows["sharded_robot_query_forward"] = parallel.audit_sharded_callable(
        fn, q, pts)

    # 2. coherent brick path (cached links)
    d2 = os.path.join(d, "arm2")
    urdf2, end2 = make_serial_arm(d2, num_joints=3, segments=8, rings=2)
    chain2 = pv.build_serial_chain_from_urdf(open(urdf2).read(), end2)
    crobot = pv.RobotSDF(chain2, path_prefix=d2,
                         link_sdf_cls=pv.cache_link_sdf_factory(
                             resolution=0.04, padding=0.3,
                             cache_path=os.path.join(d, "c.npz")))
    cpts, _ = pv.get_coherent_grid_points(
        0.02, np.array([[-0.4, 0.2], [0.0, 0.0], [-0.1, 0.5]]))
    cfn = parallel.sharded_robot_query_coherent(crobot, mesh)
    rows["sharded_robot_query_coherent_forward"] = (
        parallel.audit_sharded_callable(cfn, q, cpts))

    # 3. plain flat-batch SDF query, all 8 devices on the point axis
    mesh8 = parallel.make_device_mesh()
    sfn = parallel.sharded_sdf_query(crobot.sdf.sdfs[0], mesh8)
    spts = jnp.asarray(rng.uniform(-0.3, 0.3, (128, 3)).astype(np.float32))
    rows["sharded_sdf_query_forward"] = parallel.audit_sharded_callable(
        sfn, spts)

    # 4. collision training step: forward + backward + adam update
    step = parallel.make_collision_step(robot, optax.adam(0.05), margin=0.15,
                                        mesh=mesh)
    state = optax.adam(0.05).init(q[:4])
    rows["collision_training_step"] = parallel.audit_sharded_callable(
        step, q[:4], state, pts)

    # assert the properties this artifact exists to prove
    for name in ("sharded_robot_query_forward",
                 "sharded_robot_query_coherent_forward",
                 "sharded_sdf_query_forward"):
        parallel.assert_collectives(rows[name], allowed=())
    parallel.assert_collectives(rows["collision_training_step"],
                                allowed=("all-reduce",),
                                require=("all-reduce",))

    artifact = {
        "mesh": "4x2 (config x point), 8 virtual CPU devices",
        "claim": ("forward queries compile to ZERO cross-device collectives "
                  "(pure DP -> linear scaling by construction); the training "
                  "step's only collectives are the backward all-reduces"),
        "collective_counts": rows,
        "pinned_by": "tests/test_parallel.py::test_hlo_collective_audit",
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()
