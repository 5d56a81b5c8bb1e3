"""AOT export/load of the fused robot query (utils/serving): the serving
process needs only the artifact + table sidecar — no URDF, meshes, or
cache rebuild — and results match the live query exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pytorch_volumetric_tpu as pv
from pytorch_volumetric_tpu.utils.serving import (export_robot_query,
                                                  load_robot_query)
from pytorch_volumetric_tpu.utils.robots import make_serial_arm


@pytest.fixture(scope="module")
def robot(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("arm"))
    urdf, end = make_serial_arm(d, num_joints=3, segments=6, rings=2)
    chain = pv.build_serial_chain_from_urdf(open(urdf).read(), end)
    return pv.RobotSDF(
        chain, path_prefix=d,
        link_sdf_cls=pv.cache_link_sdf_factory(
            resolution=0.05, padding=0.2,
            cache_path=str(tmp_path_factory.mktemp("c") / "cache.npz")))


def test_export_load_roundtrip(robot, tmp_path):
    path = str(tmp_path / "arm_query.bin")
    export_robot_query(robot, n_configs=4, n_points=64, path=path)
    query = load_robot_query(path)

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.uniform(-1, 1, (4, 3)), dtype=jnp.float32)
    pts = jnp.asarray(rng.uniform(-0.4, 0.4, (64, 3)), dtype=jnp.float32)
    v, g = query(q, pts)
    robot.set_joint_configuration(q)
    v_ref, g_ref = robot(pts)
    assert v.shape == (4, 64) and g.shape == (4, 64, 3)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-6)


def test_artifact_excludes_tables(robot, tmp_path):
    """The per-link tables live in the sidecar, not the artifact: the
    serialized program stays small and compiles fast on the consumer."""
    import os

    path = str(tmp_path / "arm_query.bin")
    export_robot_query(robot, n_configs=2, n_points=32, path=path)
    with np.load(path + ".tables.npz") as d:
        raw_table_bytes = sum(d[k].nbytes for k in d.files if k != "n_leaves")
    artifact_bytes = os.path.getsize(path)
    # the program itself must not embed the link grids; its size is fixed
    # StableHLO overhead (~25 KB for 8 links) while the raw tables are
    # already 4x that at this tiny test resolution (and GBs in production)
    assert raw_table_bytes > 2 * artifact_bytes, (artifact_bytes,
                                                  raw_table_bytes)
