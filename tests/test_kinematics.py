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
    assert frame.link.visuals[0].geom_param[0] == "link_cap.obj"


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


def test_prismatic_axis_normalized():
    """A non-unit prismatic axis translates by q along the UNIT axis
    (pytorch_kinematics normalizes every joint axis at construction)."""
    urdf = """
    <robot name="r"><link name="base"/><link name="slider"/>
      <joint name="s" type="prismatic">
        <origin xyz="0 0 0"/><parent link="base"/><child link="slider"/>
        <axis xyz="0 0 2"/>
        <limit lower="-1" upper="1" effort="1" velocity="1"/>
      </joint></robot>"""
    chain = pv.build_chain_from_urdf(urdf)
    fk = chain.fk_matrices(jnp.array([0.5]))
    assert np.allclose(np.asarray(fk["slider"])[:3, 3], [0, 0, 0.5], atol=1e-6)


def test_limit_parsing_variants():
    """<limit> with only one bound defaults the other to 0 (URDF spec);
    effort/velocity-only limits stay unbounded (common on continuous)."""
    urdf = """
    <robot name="r"><link name="a"/><link name="b"/><link name="c"/>
      <joint name="j1" type="revolute">
        <parent link="a"/><child link="b"/><axis xyz="0 0 1"/>
        <limit effort="10" velocity="1" lower="-1"/>
      </joint>
      <joint name="j2" type="continuous">
        <parent link="b"/><child link="c"/><axis xyz="0 0 1"/>
        <limit effort="10" velocity="1"/>
      </joint></robot>"""
    chain = pv.build_chain_from_urdf(urdf)
    lims = chain.get_joint_limits(fallback=9.0)
    assert np.allclose(lims[0], [-1.0, 0.0])
    assert np.allclose(lims[1], [-9.0, 9.0])  # unbounded -> fallback


def test_serial_chain_prunes_mimic_master(caplog):
    """A kept mimic joint whose master lives on a pruned branch becomes an
    independent DOF instead of failing Chain construction."""
    urdf = """
    <robot name="g"><link name="palm"/><link name="fa"/><link name="fb"/>
      <joint name="ja" type="revolute">
        <parent link="palm"/><child link="fa"/><axis xyz="0 0 1"/>
        <limit lower="-1" upper="1" effort="1" velocity="1"/>
      </joint>
      <joint name="jb" type="revolute">
        <parent link="palm"/><child link="fb"/><axis xyz="0 0 1"/>
        <limit lower="-1" upper="1" effort="1" velocity="1"/>
        <mimic joint="ja" multiplier="-1"/>
      </joint></robot>"""
    full = pv.build_chain_from_urdf(urdf)
    assert full.get_joint_parameter_names() == ["ja"]  # jb driven by ja
    serial = pv.build_serial_chain_from_urdf(urdf, "fb")
    assert serial.get_joint_parameter_names() == ["jb"]  # promoted
    fk = serial.fk_matrices(jnp.array([0.3]))
    assert "fb" in fk


def test_sdf_world_anchored_model():
    """SDF joints whose parent is the implicit 'world' link synthesize an
    empty root instead of raising 'must have exactly one root link'."""
    sdf_xml = """
    <sdf version="1.6"><model name="m">
      <link name="base"><pose>1 0 0 0 0 0</pose></link>
      <link name="arm"><pose>1 0 0.5 0 0 0</pose></link>
      <joint name="anchor" type="fixed">
        <parent>world</parent><child>base</child>
      </joint>
      <joint name="j" type="revolute">
        <parent>base</parent><child>arm</child>
        <axis><xyz>0 0 1</xyz></axis>
      </joint>
    </model></sdf>"""
    chain = pv.build_chain_from_sdf(sdf_xml)
    fk = chain.fk_matrices(jnp.zeros(1))
    # base keeps its model-frame pose through the synthesized world root
    assert np.allclose(np.asarray(fk["base"])[:3, 3], [1, 0, 0], atol=1e-6)
    assert np.allclose(np.asarray(fk["arm"])[:3, 3], [1, 0, 0.5], atol=1e-6)


def test_mjcf_default_class_resolution():
    """Joints whose type/axis/range come from a <default> class parse with
    the class attributes, not the builtin hinge/z fallbacks."""
    mjcf = """
    <mujoco><compiler angle="radian"/>
      <default>
        <joint type="hinge" axis="0 1 0"/>
        <default class="slider">
          <joint type="slide" axis="1 0 0" range="-2 2"/>
        </default>
      </default>
      <worldbody>
        <body name="a" pos="0 0 0">
          <joint name="ja" class="slider"/>
          <geom type="sphere" size="0.1"/>
          <body name="b" pos="0 0 1" childclass="slider">
            <joint name="jb"/>
            <geom type="sphere" size="0.1"/>
          </body>
        </body>
      </worldbody></mujoco>"""
    chain = pv.build_chain_from_mjcf(mjcf)
    assert chain.get_joint_parameter_names() == ["ja", "jb"]
    lims = chain.get_joint_limits()
    assert np.allclose(lims, [[-2, 2], [-2, 2]])
    # ja slides along x (class attr), not the builtin z hinge
    fk = chain.fk_matrices(jnp.array([0.5, 0.25]))
    assert np.allclose(np.asarray(fk["a"])[:3, 3], [0.5, 0, 0], atol=1e-6)
    assert np.allclose(np.asarray(fk["b"])[:3, 3], [0.75, 0, 1], atol=1e-6)
