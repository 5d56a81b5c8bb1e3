"""Sharding tests on the virtual 8-device CPU mesh (conftest sets
--xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import pytorch_volumetric_tpu as pv
from pytorch_volumetric_tpu import parallel
from pytorch_volumetric_tpu import mesh as m
from pytorch_volumetric_tpu.utils.robots import make_serial_arm


@pytest.fixture(scope="module")
def robot(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("arm"))
    urdf_path, end_link = make_serial_arm(d, num_joints=3, link_length=0.2,
                                          segments=10, rings=3)
    chain = pv.build_serial_chain_from_urdf(open(urdf_path).read(), end_link)
    return pv.RobotSDF(chain, path_prefix=d)


def test_device_count():
    assert len(jax.devices()) == 8


def test_sharded_robot_query_matches_single(robot):
    mesh = parallel.make_device_mesh(n_config=4, n_point=2)
    fn = parallel.sharded_robot_query(robot, mesh)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.uniform(-1, 1, (8, 3)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-0.5, 0.5, (64, 3)).astype(np.float32))
    v_sh, g_sh = fn(q, pts)
    assert v_sh.shape == (8, 64)
    v_ref, g_ref = robot.query(q, pts)
    assert np.allclose(np.asarray(v_sh), np.asarray(v_ref), atol=1e-6)
    assert np.allclose(np.asarray(g_sh), np.asarray(g_ref), atol=1e-6)
    # outputs actually sharded over the mesh
    assert len(v_sh.sharding.device_set) == 8


def test_sharded_sdf_query(tmp_path):
    p = str(tmp_path / "s.obj")
    m.save_obj(m.icosphere_mesh(0.2, 2), p)
    sdf = pv.MeshSDF(pv.MeshObjectFactory(p))
    mesh = parallel.make_device_mesh()  # 8x1
    fn = parallel.sharded_sdf_query(sdf, mesh)
    pts = jnp.asarray(np.random.default_rng(1).uniform(-0.4, 0.4, (128, 3)),
                      dtype=jnp.float32)
    v, g = fn(pts)
    v_ref, g_ref = sdf(pts)
    assert np.allclose(np.asarray(v), np.asarray(v_ref), atol=1e-6)
    assert len(v.sharding.device_set) == 8


def test_collision_training_step(robot):
    """Full sharded training step: loss decreases over iterations and the
    joint gradients all-reduce correctly (match unsharded step)."""
    mesh = parallel.make_device_mesh(n_config=2, n_point=4)
    opt = optax.adam(0.05)
    step = parallel.make_collision_step(robot, opt, margin=0.15, mesh=mesh)
    step_ref = parallel.make_collision_step(robot, opt, margin=0.15, mesh=None)

    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.uniform(-0.3, 0.3, (4, 3)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-0.3, 0.3, (64, 3)).astype(np.float32))
    state = opt.init(q)
    q_r, state_r = q, opt.init(q)

    losses = []
    for _ in range(5):
        q, state, loss = step(q, state, pts)
        q_r, state_r, loss_r = step_ref(q_r, state_r, pts)
        assert np.allclose(float(loss), float(loss_r), atol=1e-6)
        assert np.allclose(np.asarray(q), np.asarray(q_r), atol=1e-5)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
