"""Branching kinematic trees through RobotSDF: FK correctness and
batched-vs-loop equality on a non-serial chain (a torso with two arms)."""

import numpy as np
import jax.numpy as jnp
import pytest

import pytorch_volumetric_tpu as pv
from pytorch_volumetric_tpu.kinematics import build_chain_from_urdf

URDF = """
<robot name="two_arm">
  <link name="base"/>
  <link name="torso">
    <visual><origin xyz="0 0 0.15"/>
      <geometry><cylinder radius="0.06" length="0.3"/></geometry></visual>
  </link>
  <link name="arm_l">
    <visual><origin xyz="0 0.1 0"/>
      <geometry><box size="0.05 0.2 0.05"/></geometry></visual>
  </link>
  <link name="arm_r">
    <visual><origin xyz="0 -0.1 0"/>
      <geometry><box size="0.05 0.2 0.05"/></geometry></visual>
  </link>
  <link name="hand_r">
    <visual><geometry><sphere radius="0.04"/></geometry></visual>
  </link>
  <joint name="waist" type="revolute">
    <origin xyz="0 0 0.05"/><parent link="base"/><child link="torso"/>
    <axis xyz="0 0 1"/><limit lower="-3" upper="3" effort="1" velocity="1"/>
  </joint>
  <joint name="shoulder_l" type="revolute">
    <origin xyz="0 0.08 0.3"/><parent link="torso"/><child link="arm_l"/>
    <axis xyz="1 0 0"/><limit lower="-3" upper="3" effort="1" velocity="1"/>
  </joint>
  <joint name="shoulder_r" type="revolute">
    <origin xyz="0 -0.08 0.3"/><parent link="torso"/><child link="arm_r"/>
    <axis xyz="1 0 0"/><limit lower="-3" upper="3" effort="1" velocity="1"/>
  </joint>
  <joint name="wrist_r" type="prismatic">
    <origin xyz="0 -0.2 0"/><parent link="arm_r"/><child link="hand_r"/>
    <axis xyz="0 -1 0"/><limit lower="0" upper="0.2" effort="1" velocity="1"/>
  </joint>
</robot>
"""


@pytest.fixture(scope="module")
def chain():
    return build_chain_from_urdf(URDF)


def test_tree_structure(chain):
    assert chain.get_joint_parameter_names() == [
        "waist", "shoulder_l", "shoulder_r", "wrist_r"]
    torso = chain.find_frame("torso")
    assert {c.name for c in torso.children} == {"arm_l", "arm_r"}


def test_branch_fk_manual(chain):
    th = np.array([0.5, 0.3, -0.7, 0.1], dtype=np.float32)
    fk = chain.forward_kinematics(jnp.asarray(th))

    def T(x, y, z):
        t = np.eye(4); t[:3, 3] = (x, y, z); return t

    def Rz(a):
        m = np.eye(4)
        m[:2, :2] = [[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]]
        return m

    def Rx(a):
        m = np.eye(4)
        m[1:3, 1:3] = [[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]]
        return m

    torso = T(0, 0, 0.05) @ Rz(th[0])
    arm_l = torso @ T(0, 0.08, 0.3) @ Rx(th[1])
    arm_r = torso @ T(0, -0.08, 0.3) @ Rx(th[2])
    hand_r = arm_r @ T(0, -0.2, 0) @ T(0, -th[3], 0)

    for name, expected in [("torso", torso), ("arm_l", arm_l),
                           ("arm_r", arm_r), ("hand_r", hand_r)]:
        np.testing.assert_allclose(np.asarray(fk[name].get_matrix())[0],
                                   expected, atol=1e-6,
                                   err_msg=name)


def test_branching_robot_sdf_batch_vs_loop(chain):
    robot = pv.RobotSDF(chain)  # primitive links: cylinder + 2 boxes + sphere
    assert len(robot.sdf.sdfs) == 4
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.uniform(-0.8, 0.8, (5, 4)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-0.5, 0.5, (128, 3)).astype(np.float32))
    v_batch, g_batch = robot.query(q, pts)
    assert v_batch.shape == (5, 128)
    for i in range(5):
        v_i, g_i = robot.query(q[i], pts)
        np.testing.assert_allclose(np.asarray(v_batch[i]), np.asarray(v_i),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(g_batch[i]), np.asarray(g_i),
                                   atol=1e-6)


def test_branching_robot_link_bounding_boxes(chain):
    robot = pv.RobotSDF(chain)
    robot.set_joint_configuration(jnp.zeros((2, 4)))
    bbs = robot.link_bounding_boxes()
    assert bbs.shape == (2, 4, 8, 3)
