"""Neural SDF model family (models/neural_sdf): distillation from exact
SDFs — a learned-model family beyond the reference (SURVEY §2 has none).

Kept small/fast for CPU: tiny nets, short fits, loose-but-meaningful
tolerances (the sphere's exact field is analytic)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_volumetric_tpu as pv
from pytorch_volumetric_tpu.models import (
    ConfigSpaceNeuralSDF, NeuralSDF, fit_config_space_sdf, fit_neural_sdf)


@pytest.fixture(scope="module")
def sphere_fit():
    sdf = pv.SphereSDF(0.5)
    model, losses = fit_neural_sdf(
        sdf, key=0, padding=0.2, width=64, depth=3, fourier=32,
        n_samples=20_000, steps=400, batch=2048, lr=1e-3)
    return sdf, model, losses


def test_neural_sdf_value_accuracy(sphere_fit):
    sdf, model, losses = sphere_fit
    # training converged
    assert float(losses[-50:].mean()) < 0.5 * float(losses[:50].mean())
    pts = jnp.asarray(np.random.default_rng(0).uniform(-0.6, 0.6, (500, 3)),
                      dtype=jnp.float32)
    v_gt, g_gt = sdf(pts)
    v, g = model(pts)
    rmse = float(jnp.sqrt(jnp.mean((v - v_gt) ** 2)))
    assert rmse < 0.03, rmse
    # gradient direction agrees away from the center singularity
    mask = jnp.linalg.norm(pts, axis=-1) > 0.15
    cos = jnp.sum(g * g_gt, axis=-1) / jnp.maximum(
        jnp.linalg.norm(g, axis=-1), 1e-9)
    assert float(jnp.mean(jnp.where(mask, cos, 1.0))) > 0.95


def test_neural_sdf_is_object_frame_sdf(sphere_fit):
    _, model, _ = sphere_fit
    assert isinstance(model, pv.ObjectFrameSDF)
    # batched protocol shape contract
    pts = jnp.zeros((4, 7, 3))
    v, g = model(pts)
    assert v.shape == (4, 7) and g.shape == (4, 7, 3)
    bb = np.asarray(model.surface_bounding_box(padding=0.1))
    assert bb.shape == (3, 2) and (bb[:, 1] > bb[:, 0]).all()


def test_neural_sdf_grad_consistency(sphere_fit):
    """raw_query's gradient equals jax.grad of the value network."""
    _, model, _ = sphere_fit
    pts = jnp.asarray([[0.3, 0.2, -0.1], [0.0, 0.45, 0.1]], dtype=jnp.float32)
    _, g = model.raw_query(pts)
    g_ad = jax.vmap(jax.grad(lambda p: model.value(p[None])[0]))(pts)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ad), atol=1e-5)


@pytest.fixture(scope="module")
def arm_fit(tmp_path_factory):
    from pytorch_volumetric_tpu.utils.robots import make_serial_arm

    d = str(tmp_path_factory.mktemp("csdf"))
    urdf, end = make_serial_arm(d, num_joints=2, segments=6, rings=2)
    chain = pv.build_serial_chain_from_urdf(open(urdf).read(), end)
    robot = pv.RobotSDF(chain, path_prefix=d)
    model, losses = fit_config_space_sdf(
        robot, key=0, width=96, depth=4, fourier=48, n_configs=64,
        pts_per_config=1024, steps=1200, batch=4096, lr=1e-3)
    return robot, model, losses


def test_config_space_sdf_fit(arm_fit):
    robot, model, losses = arm_fit
    assert float(losses[-50:].mean()) < 0.5 * float(losses[:50].mean())
    # accuracy against the exact oracle on fresh configs/points
    rng = np.random.default_rng(3)
    lims = robot.chain.get_joint_limits()
    qs = jnp.asarray(rng.uniform(lims[:, 0], lims[:, 1], (4, 2)),
                     dtype=jnp.float32)
    pts = jnp.asarray(rng.uniform(-0.5, 0.5, (256, 3)), dtype=jnp.float32)
    robot.set_joint_configuration(qs)
    v_gt, _ = robot(pts)
    v, g = model.set_joint_configuration(qs)(pts)
    assert v.shape == v_gt.shape == (4, 256)
    assert g.shape == (4, 256, 3)
    rmse = float(jnp.sqrt(jnp.mean((v - v_gt) ** 2)))
    assert rmse < 0.2, rmse
    # the shell around the surface is where the samples concentrate and
    # where collision queries live: much tighter there
    shell = jnp.abs(v_gt) < 0.1
    shell_rmse = float(jnp.sqrt(
        jnp.sum(jnp.where(shell, (v - v_gt) ** 2, 0.0)) / jnp.sum(shell)))
    assert shell_rmse < 0.05, shell_rmse


def test_config_space_sdf_q_differentiable(arm_fit):
    """The learned field is differentiable in the joint configuration."""
    _, model, _ = arm_fit
    pts = jnp.asarray([[0.1, 0.0, 0.2]], dtype=jnp.float32)

    def loss(q):
        return jnp.sum(model.value(q, pts))

    g = jax.grad(loss)(jnp.asarray([0.3, -0.2], dtype=jnp.float32))
    assert g.shape == (2,) and bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.abs(g).max()) > 0.0


def test_neural_sdf_save_load(sphere_fit, tmp_path):
    _, model, _ = sphere_fit
    p = str(tmp_path / "m.npz")
    model.save(p)
    loaded = NeuralSDF.load(p)
    pts = jnp.asarray(np.random.default_rng(5).uniform(-0.5, 0.5, (64, 3)),
                      dtype=jnp.float32)
    v0, g0 = model(pts)
    v1, g1 = loaded(pts)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))


def test_config_space_sdf_save_load(arm_fit, tmp_path):
    _, model, _ = arm_fit
    p = str(tmp_path / "c.npz")
    model.save(p)
    loaded = ConfigSpaceNeuralSDF.load(p)
    q = jnp.asarray([[0.2, -0.4]], dtype=jnp.float32)
    pts = jnp.asarray(np.random.default_rng(6).uniform(-0.4, 0.4, (32, 3)),
                      dtype=jnp.float32)
    v0, _ = model.set_joint_configuration(q)(pts)
    v1, _ = loaded.set_joint_configuration(q)(pts)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(loaded.q_lo),
                                  np.asarray(model.q_lo))


def test_config_space_1d_config_matches_robot_sdf_contract(arm_fit):
    """A 1-D joint config must yield outputs with NO leading config dim,
    exactly like RobotSDF (reference model_to_sdf.py:117-125 semantics);
    extra leading batch dims are preserved."""
    _, model, _ = arm_fit
    pts = jnp.zeros((5, 3))
    v, g = model.set_joint_configuration(jnp.asarray([0.1, 0.2]))(pts)
    assert v.shape == (5,) and g.shape == (5, 3)
    v2, g2 = model.set_joint_configuration(jnp.zeros((2, 3, 2)))(pts)
    assert v2.shape == (2, 3, 5) and g2.shape == (2, 3, 5, 3)


def test_load_kind_mismatch_raises(sphere_fit, arm_fit, tmp_path):
    _, sphere_model, _ = sphere_fit
    _, arm_model, _ = arm_fit
    ps = str(tmp_path / "s.npz")
    pc = str(tmp_path / "c.npz")
    sphere_model.save(ps)
    arm_model.save(pc)
    with pytest.raises(ValueError, match="neural_sdf"):
        NeuralSDF.load(pc)
    with pytest.raises(ValueError, match="config_space"):
        ConfigSpaceNeuralSDF.load(ps)


def test_checked_query_on_neural_model(sphere_fit):
    """The checkify sanitizer honors the learned field's looser gradient
    bound instead of spuriously tripping the unit-direction check."""
    from pytorch_volumetric_tpu.utils.debug import checked_query

    _, model, _ = sphere_fit
    pts = jnp.asarray(np.random.default_rng(9).uniform(-0.6, 0.6, (128, 3)),
                      dtype=jnp.float32)
    v, g = checked_query(model)(pts)
    assert v.shape == (128,)


def test_at_config_is_object_frame_sdf(arm_fit):
    """at_config pins the field to one q and plugs into the full
    ObjectFrameSDF toolkit (slice drawing, voxel views, filtered points)."""
    robot, model, _ = arm_fit
    bound = model.at_config(jnp.asarray([0.3, -0.1]))
    assert isinstance(bound, pv.ObjectFrameSDF)
    pts = jnp.zeros((2, 6, 3))
    v, g = bound(pts)
    assert v.shape == (2, 6) and g.shape == (2, 6, 3)
    # matches the batched query API at the same configuration
    v2, _ = model.set_joint_configuration(jnp.asarray([0.3, -0.1]))(pts)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v2), atol=1e-6)
    # a protocol tool built on raw_query works end-to-end
    from pytorch_volumetric_tpu.visualization import draw_sdf_slice
    out = draw_sdf_slice(
        bound, np.array([[-0.4, 0.4], [0.0, 0.0], [-0.3, 0.3]]),
        resolution=0.1, do_plot=False)
    assert np.isfinite(np.asarray(out[0])).all()
    with pytest.raises(ValueError, match="single"):
        model.at_config(jnp.zeros((2, 2)))


def test_robot_distill_convenience(arm_fit):
    """RobotSDF.distill is discoverable sugar for fit_config_space_sdf."""
    robot, _, _ = arm_fit
    model, losses = robot.distill(key=1, width=32, depth=3, fourier=16,
                                  n_configs=8, pts_per_config=64, steps=20,
                                  batch=128)
    assert isinstance(model, ConfigSpaceNeuralSDF)
    assert losses.shape == (20,)


def test_at_config_shares_one_compiled_program(arm_fit):
    """Different configurations reuse one jitted (q, pts) program — no
    per-configuration recompile (planners call at_config per candidate)."""
    _, model, _ = arm_fit
    pts = jnp.zeros((8, 3))
    b1 = model.at_config(jnp.asarray([0.1, 0.2]))
    b2 = model.at_config(jnp.asarray([-0.3, 0.4]))
    b1(pts)
    fn = model._bound_jit
    n_traces = fn._cache_size()
    b2(pts)
    assert model._bound_jit is fn
    # the second configuration reuses the first's trace (same shapes)
    assert fn._cache_size() == n_traces


def test_activation_validation():
    from pytorch_volumetric_tpu.models import mlp_init

    with pytest.raises(ValueError, match="activation"):
        mlp_init(jax.random.PRNGKey(0), 8, 16, 3, activation="ReLU")


def test_distill_restores_joint_configuration(arm_fit):
    """fit_config_space_sdf re-poses the robot for the oracle sweep; the
    caller's configuration must survive (distill is side-effect free)."""
    robot, _, _ = arm_fit
    q0 = jnp.asarray([0.25, -0.5])
    robot.set_joint_configuration(q0)
    pts = jnp.zeros((4, 3))
    v_before, _ = robot(pts)
    robot.distill(key=2, width=16, depth=3, fourier=8, n_configs=4,
                  pts_per_config=32, steps=5, batch=64)
    v_after, _ = robot(pts)
    assert v_after.shape == v_before.shape
    np.testing.assert_array_equal(np.asarray(v_before), np.asarray(v_after))
