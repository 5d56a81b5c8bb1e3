import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_volumetric_tpu as pv
from pytorch_volumetric_tpu.utils.robots import make_serial_arm, make_free_object_urdf
from pytorch_volumetric_tpu import mesh as m


@pytest.fixture(scope="module")
def arm(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("arm"))
    urdf_path, end_link = make_serial_arm(d, num_joints=3, link_length=0.2)
    return d, urdf_path, end_link


def test_parse_and_frames(arm):
    d, urdf_path, end_link = arm
    chain = pv.build_chain_from_urdf(open(urdf_path).read())
    assert chain.get_joint_parameter_names() == ["joint1", "joint2", "joint3"]
    names = chain.get_frame_names()
    assert names[0] == "link0" and names[-1] == "link3"
    frame = chain.find_frame("link1")
    assert frame.link.visuals[0].geom_type == "mesh"
    assert frame.link.visuals[0].geom_param[0] == "link1.obj"


def test_fk_zero_config(arm):
    d, urdf_path, end_link = arm
    chain = pv.build_serial_chain_from_urdf(open(urdf_path).read(), end_link)
    tf = chain.forward_kinematics(jnp.zeros(3))
    # all joints at zero: links stack along z (base 0.1, then 0.2 each)
    m3 = tf["link3"].get_matrix()[0]
    assert np.allclose(m3[:3, 3], [0, 0, 0.1 + 0.2 + 0.2], atol=1e-6)
    assert np.allclose(m3[:3, :3], np.eye(3), atol=1e-6)


def test_fk_single_rotation(arm):
    d, urdf_path, end_link = arm
    chain = pv.build_serial_chain_from_urdf(open(urdf_path).read(), end_link)
    # joint2 rotates about y at height 0.3; bend 90 deg: link3 extends along +x
    q = jnp.array([0.0, math.pi / 2, 0.0])
    tf = chain.forward_kinematics(q)
    m3 = tf["link3"].get_matrix()[0]
    assert np.allclose(m3[:3, 3], [0.2, 0, 0.3], atol=1e-5)


def test_fk_batched_matches_loop(arm):
    d, urdf_path, end_link = arm
    chain = pv.build_serial_chain_from_urdf(open(urdf_path).read(), end_link)
    rng = np.random.default_rng(0)
    qs = jnp.asarray(rng.uniform(-1, 1, (8, 3)).astype(np.float32))
    batched = chain.forward_kinematics(qs)["link3"].get_matrix()
    for i in range(8):
        single = chain.forward_kinematics(qs[i])["link3"].get_matrix()[0]
        assert np.allclose(batched[i], single, atol=1e-6)


def test_fk_differentiable(arm):
    d, urdf_path, end_link = arm
    chain = pv.build_serial_chain_from_urdf(open(urdf_path).read(), end_link)

    def end_height(q):
        return chain.fk_matrices(q)["link3"][2, 3]

    g = jax.grad(end_height)(jnp.zeros(3))
    # finite-difference check
    eps = 1e-3
    for j in range(3):
        dq = jnp.zeros(3).at[j].set(eps)
        fd = (end_height(dq) - end_height(-dq)) / (2 * eps)
        assert abs(float(g[j]) - float(fd)) < 1e-3


def test_free_object_urdf(tmp_path):
    d = str(tmp_path)
    m.save_obj(m.wrench_mesh(), f"{d}/wrench.obj")
    urdf_path, obj_name = make_free_object_urdf(d, "wrench.obj")
    chain = pv.build_serial_chain_from_urdf(open(urdf_path).read(), obj_name)
    assert len(chain.get_joint_parameter_names()) == 6
    # pose = (trans, euler): check FK matches make_tf
    trans = jnp.array([0.1, -0.2, 0.3])
    rot = jnp.array([0.2, 0.1, -0.4])
    th = jnp.concatenate([trans, rot])
    tf = chain.forward_kinematics(th)[obj_name].get_matrix()[0]
    expected = np.eye(4)
    expected[:3, :3] = np.asarray(pv.euler_angles_to_matrix(rot, "XYZ"))
    expected[:3, 3] = np.asarray(trans)
    assert np.allclose(tf, expected, atol=1e-5)
