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


MIMIC_URDF = """
<robot name="gripper">
  <link name="base"/><link name="f1"/><link name="f2"/>
  <joint name="j1" type="revolute">
    <parent link="base"/><child link="f1"/>
    <origin xyz="0.1 0 0"/><axis xyz="0 0 1"/>
    <limit lower="-1.0" upper="1.0"/>
  </joint>
  <joint name="j2" type="revolute">
    <parent link="base"/><child link="f2"/>
    <origin xyz="-0.1 0 0"/><axis xyz="0 0 1"/>
    <mimic joint="j1" multiplier="-1.0" offset="0.2"/>
  </joint>
</robot>
"""

NO_MIMIC_URDF = MIMIC_URDF.replace(
    '<mimic joint="j1" multiplier="-1.0" offset="0.2"/>', "")


def test_mimic_joint_fk():
    """A <mimic> joint is not an independent DOF; its value is
    multiplier * q[master] + offset (gripper URDF pattern)."""
    import pytorch_volumetric_tpu as pv

    chain = pv.build_chain_from_urdf(MIMIC_URDF)
    assert chain.get_joint_parameter_names() == ["j1"]
    ref = pv.build_chain_from_urdf(NO_MIMIC_URDF)
    assert ref.get_joint_parameter_names() == ["j1", "j2"]

    q1 = jnp.asarray([0.37], dtype=jnp.float32)
    fk = chain.fk_matrices(q1)
    fk_ref = ref.fk_matrices(jnp.asarray([0.37, -0.37 + 0.2],
                                         dtype=jnp.float32))
    for name in ("f1", "f2"):
        np.testing.assert_allclose(np.asarray(fk[name]),
                                   np.asarray(fk_ref[name]), atol=1e-6)
    # limits exclude the driven joint
    assert chain.get_joint_limits().shape == (1, 2)


def test_mimic_unknown_master_raises():
    import pytorch_volumetric_tpu as pv

    bad = MIMIC_URDF.replace('joint="j1" multiplier', 'joint="nope" multiplier')
    with pytest.raises(ValueError, match="unknown"):
        pv.build_chain_from_urdf(bad)
