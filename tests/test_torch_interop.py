"""Reference users arrive with torch tensors; every query surface accepts
them (MIGRATION.md "General deltas").  torch is CPU-only in this image."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

import pytorch_volumetric_tpu as pv


def test_sphere_sdf_accepts_torch_tensors():
    sdf = pv.SphereSDF(0.5)
    t = torch.randn(4, 7, 3, generator=torch.Generator().manual_seed(0))
    v, g = sdf(t)
    assert v.shape == (4, 7) and g.shape == (4, 7, 3)
    v2, g2 = sdf(jnp.asarray(t.numpy()))
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v2))


def test_robot_sdf_accepts_torch_configs_and_points(tmp_path):
    from pytorch_volumetric_tpu.utils.robots import make_serial_arm

    d = str(tmp_path)
    urdf, end = make_serial_arm(d, num_joints=2, segments=6, rings=2)
    chain = pv.build_serial_chain_from_urdf(open(urdf).read(), end)
    robot = pv.RobotSDF(chain, path_prefix=d)
    q = torch.tensor([[0.3, -0.2], [0.0, 0.5]])
    pts = torch.randn(16, 3, generator=torch.Generator().manual_seed(1)) * 0.3
    robot.set_joint_configuration(q)
    v, g = robot(pts)
    assert v.shape == (2, 16) and g.shape == (2, 16, 3)
    # results convert back to torch losslessly (copy: jax buffers are
    # read-only and torch warns on non-writable views)
    vt = torch.from_numpy(np.array(v))
    assert torch.isfinite(vt).all()
