import jax
import jax.numpy as jnp
import numpy as np

import pytorch_volumetric_tpu.transforms as tfm


def test_quaternion_roundtrip():
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (32, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    q = jnp.where(q[:, :1] < 0, -q, q)
    m = tfm.quaternion_to_matrix(q)
    # orthonormality
    eye = jnp.eye(3)
    mn = np.asarray(m)
    assert np.allclose(mn @ mn.transpose(0, 2, 1), np.tile(eye, (32, 1, 1)), atol=1e-5)
    assert np.allclose(np.linalg.det(np.asarray(m)), 1.0, atol=1e-5)
    q2 = tfm.matrix_to_quaternion(m)
    assert np.allclose(q, q2, atol=1e-5)


def test_euler_and_rpy():
    a = jnp.array([0.3, -0.5, 1.2])
    m = tfm.euler_angles_to_matrix(a, "XYZ")
    back = tfm.matrix_to_euler_angles_xyz(m)
    assert np.allclose(a, back, atol=1e-6)
    # rpy is fixed-axis XYZ = Rz Ry Rx
    mr = tfm.rpy_to_matrix(a)
    expected = (np.asarray(tfm._axis_rotation(a[2], "Z"))
                @ np.asarray(tfm._axis_rotation(a[1], "Y"))
                @ np.asarray(tfm._axis_rotation(a[0], "X")))
    assert np.allclose(mr, expected)


def test_axis_angle():
    m = tfm.axis_angle_to_matrix(jnp.array([0.0, 0.0, 1.0]), jnp.pi / 2)
    p = jnp.array([1.0, 0.0, 0.0])
    assert np.allclose(np.asarray(m) @ np.asarray(p),
                       np.array([0.0, 1.0, 0.0]), atol=1e-6)


def test_invert_and_compose():
    key = jax.random.PRNGKey(1)
    R = tfm.random_rotations(key, 8)
    t = jax.random.normal(jax.random.PRNGKey(2), (8, 3))
    m = tfm.make_tf(pos=t, rot=R)
    inv = tfm.invert_tf(m)
    assert np.allclose(np.asarray(m) @ np.asarray(inv),
                       np.tile(np.eye(4), (8, 1, 1)), atol=1e-5)


def test_transform_points_and_normals():
    key = jax.random.PRNGKey(3)
    R = tfm.random_rotation(key)
    t = jnp.array([1.0, -2.0, 0.5])
    m = tfm.make_tf(pos=t, rot=R)
    pts = jax.random.normal(jax.random.PRNGKey(4), (10, 3))
    out = tfm.transform_points(m, pts)
    assert np.allclose(out, np.asarray(pts) @ np.asarray(R).T + np.asarray(t),
                       atol=1e-5)
    # rigid: normals transform by R, lengths preserved
    n = tfm.transform_normals(m, pts)
    assert np.allclose(n, np.asarray(pts) @ np.asarray(R).T, atol=1e-4)
    # round trip through inverse
    back = tfm.transform_points(tfm.invert_tf(m), out)
    assert np.allclose(back, pts, atol=1e-5)


def test_transform3d_class():
    t1 = tfm.Translate(0.1, 0, 0)
    t2 = tfm.Translate(-0.2, 0, 0.2)
    both = t1.stack(t2)
    assert both.get_matrix().shape == (2, 4, 4)
    pts = jnp.zeros((5, 3))
    out = both.transform_points(pts)
    assert out.shape == (2, 5, 3)
    assert np.allclose(out[0, :, 0], 0.1)
    assert np.allclose(out[1, :, 2], 0.2)

    # compose: offset applied first
    a = tfm.Transform3d(pos=jnp.array([1.0, 0, 0]))
    b = tfm.Transform3d(rot=tfm.axis_angle_to_matrix(jnp.array([0., 0, 1.]), jnp.pi / 2))
    c = a.compose(b)  # rotate then translate
    p = jnp.array([[1.0, 0, 0]])
    assert np.allclose(c.transform_points(p)[0], jnp.array([[1.0, 1.0, 0.0]]), atol=1e-6)


def test_sample_perturbations():
    base = tfm.Transform3d(pos=jnp.array([0.5, 0, 0]))
    pert = base.sample_perturbations(64, radian_sigma=0.05, translation_sigma=0.01,
                                     key=jax.random.PRNGKey(7))
    m = pert.get_matrix()
    assert m.shape == (64, 4, 4)
    # still valid rotations
    R = np.asarray(m[:, :3, :3])
    assert np.allclose(R @ R.transpose(0, 2, 1), np.tile(np.eye(3), (64, 1, 1)), atol=1e-5)
    # translations near the base
    assert np.abs(np.asarray(m[:, :3, 3]) - np.array([0.5, 0, 0])).max() < 0.1


def test_rotation_6d():
    m = tfm.random_rotations(jax.random.PRNGKey(9), 4)
    r6 = tfm.matrix_to_rotation_6d(m)
    assert r6.shape == (4, 6)
    assert np.allclose(r6[:, :3], m[:, 0, :])
