"""SDF (Gazebo) and MJCF (MuJoCo) chain parsing: FK equivalence with URDF.

The reference reaches these formats through pytorch_kinematics
(build_chain_from_sdf / build_chain_from_mjcf); here the three parsers must
produce identical kinematics for the same physical robot.
"""

import numpy as np
import jax.numpy as jnp

import pytorch_volumetric_tpu as pv
from pytorch_volumetric_tpu.kinematics import (
    build_chain_from_mjcf, build_chain_from_sdf, build_chain_from_urdf,
)

URDF = """
<robot name="two_link">
  <link name="base"/>
  <link name="l1">
    <visual><origin xyz="0 0 0.1"/><geometry><box size="0.1 0.1 0.2"/></geometry></visual>
  </link>
  <link name="l2">
    <visual><geometry><sphere radius="0.05"/></geometry></visual>
  </link>
  <joint name="j1" type="revolute">
    <origin xyz="0 0 0.1"/>
    <parent link="base"/><child link="l1"/>
    <axis xyz="0 0 1"/>
    <limit lower="-2" upper="2" effort="1" velocity="1"/>
  </joint>
  <joint name="j2" type="prismatic">
    <origin xyz="0 0 0.2"/>
    <parent link="l1"/><child link="l2"/>
    <axis xyz="0 1 0"/>
    <limit lower="-0.5" upper="0.5" effort="1" velocity="1"/>
  </joint>
</robot>
"""

SDF = """
<sdf version="1.6">
  <model name="two_link">
    <link name="base"><pose>0 0 0 0 0 0</pose></link>
    <link name="l1">
      <pose>0 0 0.1 0 0 0</pose>
      <visual name="v1"><pose>0 0 0.1 0 0 0</pose>
        <geometry><box><size>0.1 0.1 0.2</size></box></geometry></visual>
    </link>
    <link name="l2">
      <pose>0 0 0.3 0 0 0</pose>
      <visual name="v2"><geometry><sphere><radius>0.05</radius></sphere></geometry></visual>
    </link>
    <joint name="j1" type="revolute">
      <parent>base</parent><child>l1</child>
      <axis><xyz>0 0 1</xyz><limit><lower>-2</lower><upper>2</upper></limit></axis>
    </joint>
    <joint name="j2" type="prismatic">
      <parent>l1</parent><child>l2</child>
      <axis><xyz>0 1 0</xyz><limit><lower>-0.5</lower><upper>0.5</upper></limit></axis>
    </joint>
  </model>
</sdf>
"""

MJCF = """
<mujoco model="two_link">
  <compiler angle="radian"/>
  <worldbody>
    <body name="l1" pos="0 0 0.1">
      <joint name="j1" type="hinge" axis="0 0 1" range="-2 2"/>
      <geom type="box" size="0.05 0.05 0.1" pos="0 0 0.1"/>
      <body name="l2" pos="0 0 0.2">
        <joint name="j2" type="slide" axis="0 1 0" range="-0.5 0.5"/>
        <geom type="sphere" size="0.05"/>
      </body>
    </body>
  </worldbody>
</mujoco>
"""


def _fk(chain, q, frames):
    out = chain.forward_kinematics(jnp.asarray(q, dtype=jnp.float32))
    return [np.asarray(out[f].get_matrix()) for f in frames]


def test_sdf_matches_urdf():
    cu = build_chain_from_urdf(URDF)
    cs = build_chain_from_sdf(SDF)
    assert cs.get_joint_parameter_names() == ["j1", "j2"]
    q = np.array([[0.3, -0.2], [0.0, 0.0], [-1.1, 0.4]], dtype=np.float32)
    for mu, ms in zip(_fk(cu, q, ["l1", "l2"]), _fk(cs, q, ["l1", "l2"])):
        np.testing.assert_allclose(ms, mu, atol=1e-6)


def test_mjcf_matches_urdf():
    cu = build_chain_from_urdf(URDF)
    cm = build_chain_from_mjcf(MJCF)
    assert cm.get_joint_parameter_names() == ["j1", "j2"]
    q = np.array([[0.3, -0.2], [0.7, 0.1]], dtype=np.float32)
    for mu, mm in zip(_fk(cu, q, ["l1", "l2"]), _fk(cm, q, ["l1", "l2"])):
        np.testing.assert_allclose(mm, mu, atol=1e-6)


def test_mjcf_joint_pos_offset_conjugation():
    # hinge located at pos (0, 0.05, 0) inside the body frame: rotation about
    # the offset point, not the body origin
    doc = """
    <mujoco><compiler angle="radian"/><worldbody>
      <body name="b" pos="0.1 0 0">
        <joint name="j" type="hinge" axis="0 0 1" pos="0 0.05 0"/>
        <geom type="sphere" size="0.02"/>
      </body>
    </worldbody></mujoco>
    """
    c = build_chain_from_mjcf(doc)
    th = 0.9
    m = np.asarray(c.forward_kinematics(jnp.asarray([th]))["b"].get_matrix())[0]
    # manual: T(0.1,0,0) @ T(0,0.05,0) @ Rz(th) @ T(0,-0.05,0)
    def T(x, y, z):
        t = np.eye(4); t[:3, 3] = (x, y, z); return t
    Rz = np.eye(4)
    Rz[:2, :2] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
    expected = T(0.1, 0, 0) @ T(0, 0.05, 0) @ Rz @ T(0, -0.05, 0)
    np.testing.assert_allclose(m, expected, atol=1e-6)


def test_sdf_joint_pose_offset():
    # joint frame offset inside the child link (SDF <pose> under <joint>)
    doc = """
    <sdf version="1.6"><model name="m">
      <link name="base"/>
      <link name="b"><pose>0.1 0 0 0 0 0</pose></link>
      <joint name="j" type="revolute">
        <pose>0 0.05 0 0 0 0</pose>
        <parent>base</parent><child>b</child>
        <axis><xyz>0 0 1</xyz></axis>
      </joint>
    </model></sdf>
    """
    c = build_chain_from_sdf(doc)
    th = -0.4
    m = np.asarray(c.forward_kinematics(jnp.asarray([th]))["b"].get_matrix())[0]
    def T(x, y, z):
        t = np.eye(4); t[:3, 3] = (x, y, z); return t
    Rz = np.eye(4)
    Rz[:2, :2] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
    expected = T(0.1, 0, 0) @ T(0, 0.05, 0) @ Rz @ T(0, -0.05, 0)
    np.testing.assert_allclose(m, expected, atol=1e-6)


def test_mjcf_degrees_and_euler():
    doc = """
    <mujoco><worldbody>
      <body name="b" pos="0 0 0" euler="0 0 90">
        <joint name="j" type="hinge" axis="0 0 1" range="-90 90"/>
        <geom type="capsule" size="0.03 0.1"/>
      </body>
    </worldbody></mujoco>
    """
    c = build_chain_from_mjcf(doc)
    f = c.find_frame("b")
    np.testing.assert_allclose(f.joint.limits, (-np.pi / 2, np.pi / 2))
    m = np.asarray(c.forward_kinematics(jnp.asarray([0.0]))["b"].get_matrix())[0]
    np.testing.assert_allclose(m[:3, :3],
                               [[0, -1, 0], [1, 0, 0], [0, 0, 1]], atol=1e-6)
    # capsule half-sizes converted to (radius, full length)
    v = f.link.visuals[0]
    assert v.geom_type == "capsule"
    np.testing.assert_allclose(v.geom_param, (0.03, 0.2))


def test_robot_sdf_from_mjcf_primitives():
    # a capsule-arm robot defined in MJCF drives RobotSDF end to end
    doc = """
    <mujoco><compiler angle="radian"/><worldbody>
      <body name="l1" pos="0 0 0.05">
        <joint name="j1" type="hinge" axis="0 0 1"/>
        <geom type="capsule" size="0.04 0.08" pos="0 0 0.08"/>
        <body name="l2" pos="0 0 0.16">
          <joint name="j2" type="hinge" axis="0 1 0"/>
          <geom type="capsule" size="0.03 0.06" pos="0 0 0.06"/>
        </body>
      </body>
    </worldbody></mujoco>
    """
    chain = build_chain_from_mjcf(doc)
    robot = pv.RobotSDF(chain)
    q = jnp.asarray(np.array([[0.0, 0.0], [0.5, -0.7]], dtype=np.float32))
    robot.set_joint_configuration(q)
    pts = jnp.asarray(np.array([[0.0, 0.0, 0.13], [0.5, 0.5, 0.5]],
                               dtype=np.float32))
    val, grad = robot(pts)
    assert val.shape == (2, 2) and grad.shape == (2, 2, 3)
    # first point is on the capsule axis inside link1 -> negative SDF
    assert float(val[0, 0]) < 0
    assert np.all(np.isfinite(np.asarray(grad)))


def test_mjcf_fromto_capsule():
    # the standard MuJoCo capsule idiom (e.g. humanoid.xml)
    doc = """
    <mujoco><compiler angle="radian"/><worldbody>
      <body name="b" pos="0 0 0">
        <joint name="j" type="hinge" axis="0 0 1"/>
        <geom type="capsule" fromto="0 0 0 0 0.2 0" size="0.05"/>
      </body>
    </worldbody></mujoco>
    """
    c = build_chain_from_mjcf(doc)
    v = c.find_frame("b").link.visuals[0]
    assert v.geom_type == "capsule"
    np.testing.assert_allclose(v.geom_param, (0.05, 0.2), atol=1e-7)
    # capsule axis (local +z) maps onto the segment direction (+y)
    np.testing.assert_allclose(v.offset[:3, 3], [0, 0.1, 0], atol=1e-7)
    np.testing.assert_allclose(v.offset[:3, :3] @ [0, 0, 1], [0, 1, 0],
                               atol=1e-7)


def test_mjcf_orientation_attributes():
    doc = """
    <mujoco><compiler angle="radian"/><worldbody>
      <body name="aa" pos="0 0 0" axisangle="0 0 1 1.5707963">
        <joint type="hinge"/><geom type="sphere" size="0.01"/>
      </body>
      <body name="xy" pos="0 0 0" xyaxes="0 1 0 -1 0 0">
        <joint type="hinge"/><geom type="sphere" size="0.01"/>
      </body>
      <body name="za" pos="0 0 0" zaxis="1 0 0">
        <joint type="hinge"/><geom type="sphere" size="0.01"/>
      </body>
    </worldbody></mujoco>
    """
    c = build_chain_from_mjcf(doc)
    q = jnp.zeros((3,))
    fk = c.forward_kinematics(q)
    Rz90 = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    np.testing.assert_allclose(np.asarray(fk["aa"].get_matrix())[0, :3, :3],
                               Rz90, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fk["xy"].get_matrix())[0, :3, :3],
                               Rz90, atol=1e-6)
    m = np.asarray(fk["za"].get_matrix())[0, :3, :3]
    np.testing.assert_allclose(m @ [0, 0, 1], [1, 0, 0], atol=1e-6)
