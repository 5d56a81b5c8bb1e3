"""Rigid-transform and rotation utilities (pure jnp, batched, differentiable).

TPU-native replacement for the subset of ``pytorch_kinematics.transforms``
that the reference library uses (see reference ``sdf.py:333-433``,
``chamfer.py:12-59``, ``model_to_sdf.py:99-115``).  Everything here is a pure
function on ``jnp`` arrays with arbitrary leading batch dimensions, using the
column-vector convention::

    p_world = R @ p_local + t        # matrix = [[R, t], [0, 1]]

A thin :class:`Transform3d` pytree wrapper mirrors the reference's OO API so
user code ports directly, but the functional layer is what kernels and jitted
code paths use.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

# Rigid-transform math must stay true float32: TPU's DEFAULT matmul
# precision runs f32 matmuls through bf16 passes (~1e-3 relative error),
# far beyond this library's 1e-4 surface tolerances.  These tiny 3x3/4x4
# contractions are nowhere near the FLOP budget, so force full precision.
MM_PRECISION = jax.lax.Precision.HIGHEST

ArrayLike = Union[Array, np.ndarray, Sequence[float], float]


def mm(a: ArrayLike, b: ArrayLike) -> Array:
    """Full-precision matmul for transform chains (see MM_PRECISION)."""
    return jnp.matmul(jnp.asarray(a), jnp.asarray(b), precision=MM_PRECISION)


def precise_einsum(spec: str, *args) -> Array:
    """Full-precision einsum for transform/rotation contractions."""
    return jnp.einsum(spec, *args, precision=MM_PRECISION)


# ---------------------------------------------------------------------------
# Rotation conversions
# ---------------------------------------------------------------------------

def quaternion_to_matrix(quat_wxyz: ArrayLike) -> Array:
    """Convert unit quaternions ``[..., 4]`` in (w, x, y, z) order to rotation
    matrices ``[..., 3, 3]``."""
    q = jnp.asarray(quat_wxyz)
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def quaternion_xyzw_to_matrix(quat_xyzw: ArrayLike) -> Array:
    """Convert quaternions given in (x, y, z, w) order (the convention the
    reference's ``ObjectFactory.vis_frame_rot`` uses, reference sdf.py:110-111)."""
    q = jnp.asarray(quat_xyzw)
    return quaternion_to_matrix(jnp.stack(
        [q[..., 3], q[..., 0], q[..., 1], q[..., 2]], axis=-1))


def matrix_to_quaternion(matrix: ArrayLike) -> Array:
    """Rotation matrices ``[..., 3, 3]`` to quaternions ``[..., 4]`` (w,x,y,z).

    Uses the numerically-stable branch-free variant: build all four candidate
    quaternions and select by the largest pivot.
    """
    m = jnp.asarray(matrix)
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-24))

    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)
    pivots = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                        1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    case = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # [..., 4(case), 4(quat)]
    q = jnp.take_along_axis(cands, case[..., None, None], axis=-2)[..., 0, :]
    pivot = jnp.take_along_axis(pivots, case[..., None], axis=-1)
    q = q * (0.5 / safe_sqrt(pivot))
    # canonical sign: w >= 0
    q = jnp.where(q[..., :1] < 0, -q, q)
    return q


_EULER_AXES = {"X": 0, "Y": 1, "Z": 2}


def _axis_rotation(angle: Array, axis: str) -> Array:
    c, s = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(c), jnp.zeros_like(c)
    if axis == "X":
        rows = [one, zero, zero, zero, c, -s, zero, s, c]
    elif axis == "Y":
        rows = [c, zero, s, zero, one, zero, -s, zero, c]
    else:
        rows = [c, -s, zero, s, c, zero, zero, zero, one]
    return jnp.stack(rows, axis=-1).reshape(angle.shape + (3, 3))


def euler_angles_to_matrix(angles: ArrayLike, convention: str = "XYZ") -> Array:
    """Extrinsic-matrix product of per-axis rotations, matching the semantics
    of ``pytorch_kinematics.euler_angles_to_matrix`` (R = R0 @ R1 @ R2 for
    convention "XYZ" with angles ``[..., 3]``)."""
    a = jnp.asarray(angles)
    ms = [_axis_rotation(a[..., i], convention[i]) for i in range(3)]
    return mm(mm(ms[0], ms[1]), ms[2])


def matrix_to_euler_angles_xyz(matrix: ArrayLike) -> Array:
    """Inverse of euler_angles_to_matrix for the "XYZ" convention (used by the
    URDF writer/tests; matches rpy semantics for ZYX when reversed)."""
    m = jnp.asarray(matrix)
    y = jnp.arcsin(jnp.clip(m[..., 0, 2], -1.0, 1.0))
    x = jnp.arctan2(-m[..., 1, 2], m[..., 2, 2])
    z = jnp.arctan2(-m[..., 0, 1], m[..., 0, 0])
    return jnp.stack([x, y, z], axis=-1)


def rpy_to_matrix(rpy: ArrayLike) -> Array:
    """URDF roll-pitch-yaw (fixed-axis XYZ): R = Rz(yaw) @ Ry(pitch) @ Rx(roll)."""
    a = jnp.asarray(rpy)
    return mm(mm(_axis_rotation(a[..., 2], "Z"),
                  _axis_rotation(a[..., 1], "Y")),
               _axis_rotation(a[..., 0], "X"))


def axis_angle_to_matrix(axis: ArrayLike, angle: ArrayLike) -> Array:
    """Rodrigues formula; ``axis [..., 3]`` (need not be normalized),
    ``angle [...]`` -> ``[..., 3, 3]``."""
    u = jnp.asarray(axis, dtype=jnp.result_type(axis, jnp.float32))
    u = u / jnp.maximum(jnp.linalg.norm(u, axis=-1, keepdims=True), 1e-12)
    angle = jnp.asarray(angle)
    c = jnp.cos(angle)[..., None, None]
    s = jnp.sin(angle)[..., None, None]
    ux, uy, uz = u[..., 0], u[..., 1], u[..., 2]
    zero = jnp.zeros_like(ux)
    K = jnp.stack([zero, -uz, uy, uz, zero, -ux, -uy, ux, zero],
                  axis=-1).reshape(u.shape[:-1] + (3, 3))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=u.dtype), K.shape)
    outer = u[..., :, None] * u[..., None, :]
    return c * eye + s * K + (1.0 - c) * outer


def matrix_to_rotation_6d(matrix: ArrayLike) -> Array:
    """First two rows of the rotation matrix flattened: ``[..., 6]``
    (continuous rotation representation; reference chamfer.py:15)."""
    m = jnp.asarray(matrix)
    return m[..., :2, :].reshape(m.shape[:-2] + (6,))


def random_rotation(key: jax.Array, dtype=jnp.float32) -> Array:
    """Uniform random rotation matrix via a random unit quaternion."""
    q = jax.random.normal(key, (4,), dtype=dtype)
    return quaternion_to_matrix(q)


def random_rotations(key: jax.Array, n: int, dtype=jnp.float32) -> Array:
    q = jax.random.normal(key, (n, 4), dtype=dtype)
    return quaternion_to_matrix(q)


# ---------------------------------------------------------------------------
# Homogeneous 4x4 transform operations
# ---------------------------------------------------------------------------

def make_tf(pos: Optional[ArrayLike] = None, rot: Optional[ArrayLike] = None,
            dtype=jnp.float32) -> Array:
    """Build ``[..., 4, 4]`` from a translation ``[..., 3]`` and/or a rotation
    given as a matrix ``[..., 3, 3]`` or quaternion ``[..., 4]`` (w,x,y,z)."""
    if rot is None:
        R = jnp.eye(3, dtype=dtype)
    else:
        rot = jnp.asarray(rot, dtype=dtype)
        R = rot if rot.shape[-1] == 3 and rot.ndim >= 2 and rot.shape[-2] == 3 \
            else quaternion_to_matrix(rot)
    if pos is None:
        t = jnp.zeros(3, dtype=dtype)
    else:
        t = jnp.asarray(pos, dtype=dtype)
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    m = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.zeros(batch + (1, 4), dtype=m.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([m, bottom], axis=-2)


def translation_tf(x: float, y: float, z: float, dtype=jnp.float32) -> Array:
    return make_tf(pos=jnp.array([x, y, z], dtype=dtype))


def invert_tf(matrix: ArrayLike) -> Array:
    """Invert rigid transforms exploiting the [R, t] block structure
    (R^T, -R^T t) — cheaper and more accurate than a general 4x4 inverse."""
    m = jnp.asarray(matrix)
    R = m[..., :3, :3]
    t = m[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    t_inv = -precise_einsum("...ij,...j->...i", Rt, t)
    out = jnp.concatenate([Rt, t_inv[..., :, None]], axis=-1)
    bottom = jnp.zeros(m.shape[:-2] + (1, 4), dtype=m.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([out, bottom], axis=-2)


def compose_tf(*matrices: ArrayLike) -> Array:
    """Left-to-right application order: compose(A, B) maps p -> A @ (B @ p)...
    i.e. plain matrix product A @ B with broadcasting."""
    out = jnp.asarray(matrices[0])
    for m in matrices[1:]:
        out = mm(out, jnp.asarray(m))
    return out


def transform_points(matrix: ArrayLike, points: ArrayLike) -> Array:
    """Apply ``[..., 4, 4]`` to points ``[..., N, 3]`` (batch dims broadcast):
    ``p' = R p + t``.  Written elementwise rather than as a matmul: native
    f32 on the VPU (no TPU bf16 matmul passes, no MM_PRECISION multi-pass)."""
    m = jnp.asarray(matrix)
    p = jnp.asarray(points, dtype=m.dtype)
    R = m[..., None, :3, :3]       # [..., 1, 3, 3]
    t = m[..., None, :3, 3]        # [..., 1, 3]
    out = jnp.stack([
        R[..., 0, 0] * p[..., 0] + R[..., 0, 1] * p[..., 1]
        + R[..., 0, 2] * p[..., 2],
        R[..., 1, 0] * p[..., 0] + R[..., 1, 1] * p[..., 1]
        + R[..., 1, 2] * p[..., 2],
        R[..., 2, 0] * p[..., 0] + R[..., 2, 1] * p[..., 1]
        + R[..., 2, 2] * p[..., 2],
    ], axis=-1)
    return out + t


def rotate_vectors(R: ArrayLike, v: ArrayLike) -> Array:
    """``[..., 3, 3] x [..., N, 3] -> [..., N, 3]`` rotation, elementwise
    (native f32 on the VPU; see :func:`transform_points`)."""
    R = jnp.asarray(R)[..., None, :, :]
    v = jnp.asarray(v)
    return jnp.stack([
        R[..., 0, 0] * v[..., 0] + R[..., 0, 1] * v[..., 1]
        + R[..., 0, 2] * v[..., 2],
        R[..., 1, 0] * v[..., 0] + R[..., 1, 1] * v[..., 1]
        + R[..., 1, 2] * v[..., 2],
        R[..., 2, 0] * v[..., 0] + R[..., 2, 1] * v[..., 1]
        + R[..., 2, 2] * v[..., 2],
    ], axis=-1)


def transform_normals(matrix: ArrayLike, normals: ArrayLike) -> Array:
    """Transform direction vectors with the inverse-transpose of the linear
    block (equals R for rigid transforms); no translation."""
    m = jnp.asarray(matrix)
    n = jnp.asarray(normals, dtype=m.dtype)
    R = m[..., :3, :3]
    # inverse-transpose via the adjugate: columns of (R^-1)^T are the cross
    # products of R's columns over det.  Elementwise f32 only (no LU, no
    # matmul passes — the precision policy this module exists for); for
    # orthonormal R it reproduces R up to roundoff.
    a, b, c = R[..., :, 0], R[..., :, 1], R[..., :, 2]
    bc = jnp.cross(b, c)
    det = jnp.sum(a * bc, axis=-1)[..., None, None]
    Rinv_T = jnp.stack([bc, jnp.cross(c, a), jnp.cross(a, b)], axis=-1) / det
    return precise_einsum("...ij,...nj->...ni", Rinv_T, n)


def sample_perturbations(key: jax.Array, matrix: ArrayLike, n: int,
                         radian_sigma: float, translation_sigma: float) -> Array:
    """Sample ``n`` perturbed copies of a single ``[4, 4]`` transform: random
    axis-angle rotations (angle ~ N(0, radian_sigma)) and gaussian translation
    offsets, applied in the world frame (mirrors
    ``pytorch_kinematics.Transform3d.sample_perturbations``)."""
    m = jnp.asarray(matrix)
    k1, k2, k3 = jax.random.split(key, 3)
    rot_vec = jax.random.normal(k1, (n, 3), dtype=m.dtype) * radian_sigma
    angle = jnp.linalg.norm(rot_vec, axis=-1)
    axis = rot_vec / jnp.maximum(angle[..., None], 1e-12)
    dR = axis_angle_to_matrix(axis, angle)
    dt = jax.random.normal(k2, (n, 3), dtype=m.dtype) * translation_sigma
    R = mm(dR, m[..., :3, :3])
    t = m[..., :3, 3] + dt
    return make_tf(pos=t, rot=R, dtype=m.dtype)


# ---------------------------------------------------------------------------
# OO wrapper (pytree) for API familiarity with the reference
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
class Transform3d:
    """Batched rigid transform wrapper over a ``[B, 4, 4]`` (or ``[4, 4]``)
    matrix.  Mirrors the pytorch_kinematics API surface used by the reference
    (``get_matrix / inverse / compose / stack / transform_points /
    transform_normals / sample_perturbations``)."""

    def __init__(self, matrix: Optional[ArrayLike] = None,
                 pos: Optional[ArrayLike] = None, rot: Optional[ArrayLike] = None,
                 dtype=jnp.float32):
        if matrix is not None:
            self.matrix = jnp.asarray(matrix)
        else:
            self.matrix = make_tf(pos=pos, rot=rot, dtype=dtype)

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        return (self.matrix,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(matrix=children[0])

    # -- core ops -----------------------------------------------------------
    def get_matrix(self) -> Array:
        m = self.matrix
        return m[None] if m.ndim == 2 else m

    def __len__(self) -> int:
        return self.get_matrix().shape[0]

    def __getitem__(self, item) -> "Transform3d":
        return Transform3d(matrix=self.get_matrix()[item])

    @property
    def dtype(self):
        return self.matrix.dtype

    def inverse(self) -> "Transform3d":
        return Transform3d(matrix=invert_tf(self.matrix))

    def compose(self, *others: "Transform3d") -> "Transform3d":
        """self.compose(o).transform_points(p) == self(o(p)) — i.e. ``o`` is
        applied first (matches how the reference chains offset^-1 ∘ FK^-1 at
        model_to_sdf.py:113)."""
        m = self.get_matrix()
        for o in others:
            m = mm(m, o.get_matrix())
        return Transform3d(matrix=m)

    def stack(self, *others: "Transform3d") -> "Transform3d":
        ms = [self.get_matrix()] + [o.get_matrix() for o in others]
        return Transform3d(matrix=jnp.concatenate(ms, axis=0))

    def transform_points(self, points: ArrayLike) -> Array:
        p = jnp.asarray(points)
        squeeze = p.ndim == 2 and self.matrix.ndim == 2
        out = transform_points(self.get_matrix() if not squeeze else self.matrix, p)
        return out

    def transform_normals(self, normals: ArrayLike) -> Array:
        n = jnp.asarray(normals)
        squeeze = n.ndim == 2 and self.matrix.ndim == 2
        return transform_normals(self.get_matrix() if not squeeze else self.matrix, n)

    def sample_perturbations(self, n: int, radian_sigma: float,
                             translation_sigma: float,
                             key: Optional[jax.Array] = None) -> "Transform3d":
        if key is None:
            key = jax.random.PRNGKey(0)
        m = self.matrix if self.matrix.ndim == 2 else self.get_matrix()[0]
        return Transform3d(matrix=sample_perturbations(
            key, m, n, radian_sigma, translation_sigma))

    def to(self, dtype=None, device=None) -> "Transform3d":
        m = self.matrix
        if dtype is not None:
            m = m.astype(dtype)
        if device is not None:
            m = jax.device_put(m, device)
        return Transform3d(matrix=m)

    @property
    def device(self):
        try:
            return list(self.matrix.devices())[0]
        except Exception:
            return None


def Translate(x: float, y: float, z: float, dtype=jnp.float32, device=None) -> Transform3d:
    """Convenience constructor mirroring ``pytorch_kinematics.Translate``."""
    del device
    return Transform3d(matrix=translation_tf(x, y, z, dtype=dtype))
