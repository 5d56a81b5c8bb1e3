"""Object pose estimation by chamfer-distance gradient descent.

The reference library's other headline use case (pose-estimation
evaluation): given points observed on an object's surface in the world
frame, recover the object pose by minimizing the unidirectional chamfer
cost ``mean(sdf(T^-1 p)^2)`` — differentiable end to end through the rigid
transform and the mesh SDF.  A batch of B pose hypotheses is optimized
simultaneously (one jitted program, poses on a leading batch axis), then
scored with `batch_chamfer_dist`.

Run:  python examples/pose_estimation.py          (CPU or TPU, < 1 min)
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import optax

import pytorch_volumetric_tpu as pv
from pytorch_volumetric_tpu import mesh as mesh_mod
from pytorch_volumetric_tpu import transforms as tfm


SMOKE = bool(os.environ.get("PVT_EXAMPLE_SMOKE"))


def main():
    # -- object + observed surface points in an unknown pose -----------------
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    import tempfile, os
    m = mesh_mod.capsule_mesh(radius=0.08, height=0.3, segments=16, rings=6)
    d = tempfile.mkdtemp(prefix="pvt_pose_")
    path = os.path.join(d, "capsule.obj")
    mesh_mod.save_obj(m, path)
    obj = pv.MeshObjectFactory(path)
    sdf = pv.MeshSDF(obj)

    pts_obj, _, _ = pv.sample_mesh_points(
        obj, num_points=200, seed=1, name="capsule",
        dbpath=os.path.join(d, "points.npz"))
    true_rot = np.asarray(tfm.euler_angles_to_matrix(
        jnp.asarray([0.4, -0.3, 0.9]), "XYZ"))
    true_pos = np.array([0.15, -0.1, 0.25], dtype=np.float32)
    pts_world = jnp.asarray(np.asarray(pts_obj) @ true_rot.T + true_pos)

    # -- B pose hypotheses, parameterized as (translation, 6D rotation) ------
    B = 16
    t0 = jnp.asarray(rng.normal(0, 0.2, (B, 3)).astype(np.float32))
    r0 = jnp.tile(jnp.asarray([1, 0, 0, 0, 1, 0], dtype=jnp.float32), (B, 1))
    r0 = r0 + 0.3 * jax.random.normal(key, r0.shape)

    def rot_from_6d(r6):
        a1, a2 = r6[..., :3], r6[..., 3:]
        b1 = a1 / (jnp.linalg.norm(a1, axis=-1, keepdims=True) + 1e-9)
        a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
        b2 = a2p / (jnp.linalg.norm(a2p, axis=-1, keepdims=True) + 1e-9)
        b3 = jnp.cross(b1, b2)
        return jnp.stack([b1, b2, b3], axis=-1)

    def loss_fn(params):
        t, r6 = params
        R = rot_from_6d(r6)                                   # [B, 3, 3]
        # object-frame points of each hypothesis: R^T (p - t)
        p_obj = jnp.einsum("bij,bni->bnj", R, pts_world[None] - t[:, None])
        d, _ = sdf.raw_query(p_obj.reshape(-1, 3))
        return jnp.sum(jnp.mean(d.reshape(B, -1) ** 2, axis=-1))

    opt = optax.adam(2e-2)

    @jax.jit
    def step(params, opt_state):
        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    params = (t0, r0)
    opt_state = opt.init(params)
    iters = 40 if SMOKE else 300
    for it in range(iters):
        params, opt_state, loss = step(params, opt_state)
        if it % 50 == 0 or it == iters - 1:
            print(f"iter {it:3d}  total chamfer {float(loss):.6f}",
                  file=sys.stderr)

    # -- score final hypotheses with the library metric ----------------------
    t, r6 = params
    R = rot_from_6d(r6)
    world_to_obj = jnp.tile(jnp.eye(4)[None], (B, 1, 1))
    world_to_obj = world_to_obj.at[:, :3, :3].set(jnp.swapaxes(R, 1, 2))
    world_to_obj = world_to_obj.at[:, :3, 3].set(
        -jnp.einsum("bij,bi->bj", R, t))
    err = pv.batch_chamfer_dist(jnp.asarray(world_to_obj), pts_world,
                                obj_factory=obj, scale=1000.0)
    best = int(jnp.argmin(err))
    pos_err = float(jnp.linalg.norm(t[best] - true_pos))
    print(f"best hypothesis {best}: chamfer {float(err[best]):.3f}, "
          f"translation error {pos_err * 1000:.1f} mm", file=sys.stderr)
    if not SMOKE:  # smoke runs too few iterations to converge fully
        assert pos_err < 0.02, "pose estimate did not converge"
    assert np.isfinite(pos_err)
    print("ok")


if __name__ == "__main__":
    main()
