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


def test_artifact_excludes_tables(robot, tmp_path, tmp_path_factory):
    """The per-link tables live in the sidecar, not the artifact: doubling
    the grid resolution (~8x table bytes) must leave the serialized program
    size unchanged."""
    import os

    def table_bytes(p):
        with np.load(p + ".tables.npz") as d:
            return sum(d[k].nbytes for k in d.files if k != "n_leaves")

    path = str(tmp_path / "arm_query.bin")
    export_robot_query(robot, n_configs=2, n_points=32, path=path)

    d = str(tmp_path_factory.mktemp("arm_fine"))
    urdf, end = make_serial_arm(d, num_joints=3, segments=6, rings=2)
    chain = pv.build_serial_chain_from_urdf(open(urdf).read(), end)
    robot_fine = pv.RobotSDF(
        chain, path_prefix=d,
        link_sdf_cls=pv.cache_link_sdf_factory(
            resolution=0.025, padding=0.2,
            cache_path=str(tmp_path / "cache_fine.npz")))
    path_fine = str(tmp_path / "arm_query_fine.bin")
    export_robot_query(robot_fine, n_configs=2, n_points=32, path=path_fine)

    assert table_bytes(path_fine) > 4 * table_bytes(path)
    a0, a1 = os.path.getsize(path), os.path.getsize(path_fine)
    assert abs(a1 - a0) < 0.2 * a0, (a0, a1)


def test_loaded_artifact_differentiable(robot, tmp_path):
    """Gradient-based planning on the serving side: jax.grad w.r.t. joint
    angles works through the deserialized artifact (vjp_order=1)."""
    path = str(tmp_path / "arm_query_g.bin")
    export_robot_query(robot, n_configs=2, n_points=16, path=path)
    query = load_robot_query(path)
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 3)), dtype=jnp.float32)
    pts = jnp.asarray(rng.uniform(-0.3, 0.3, (16, 3)), dtype=jnp.float32)

    gq = jax.grad(lambda qq: query(qq, pts)[0].sum())(q)
    robot.set_joint_configuration(q)
    # reference joint gradient from the live fused path
    gq_ref = jax.grad(lambda qq: robot.query(qq, pts)[0].sum())(q)
    assert gq.shape == (2, 3)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(gq_ref), atol=1e-5)


def test_export_grid_query_roundtrip(robot, tmp_path):
    """Grid-sweep (collision field) export: loaded artifact reproduces
    query_grid exactly, value+grad and values-only variants."""
    from pytorch_volumetric_tpu.utils.serving import (
        export_robot_grid_query, load_robot_grid_query)

    qr = np.array([[-0.3, 0.1], [0.0, 0.0], [-0.1, 0.3]])
    path = str(tmp_path / "grid.bin")
    export_robot_grid_query(robot, n_configs=3, query_range=qr,
                            resolution=0.025, path=path)
    query = load_robot_grid_query(path)

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.uniform(-0.5, 0.5, (3, 3)).astype(np.float32))
    v, g = query(q)
    v_ref, g_ref = robot.query_grid(q, qr, 0.025)
    assert v.shape == v_ref.shape and g.shape == g_ref.shape
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(g), np.asarray(g_ref))
    # differentiable on the consumer side (vjp_order=1)
    gq = jax.grad(lambda qq: query(qq)[0].sum())(q)
    assert np.isfinite(np.asarray(gq)).all()

    # values-only variant
    path_v = str(tmp_path / "grid_v.bin")
    export_robot_grid_query(robot, n_configs=3, query_range=qr,
                            resolution=0.025, path=path_v, values_only=True)
    v_only = load_robot_grid_query(path_v)(q)
    np.testing.assert_array_equal(np.asarray(v_only), np.asarray(v))

    # too-coarse sweep is rejected at export time
    with pytest.raises(ValueError, match="too coarse"):
        export_robot_grid_query(robot, n_configs=3, query_range=qr,
                                resolution=0.05, path=str(tmp_path / "x.bin"))
