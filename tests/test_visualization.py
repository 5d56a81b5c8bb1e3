import matplotlib

matplotlib.use("Agg")

import numpy as np
import jax.numpy as jnp
import pytest

import pytorch_volumetric_tpu as pv
from pytorch_volumetric_tpu import mesh as m
from pytorch_volumetric_tpu.visualization import draw_sdf_slice, get_transformed_meshes
from pytorch_volumetric_tpu.utils.robots import make_serial_arm


def test_draw_sdf_slice(tmp_path):
    p = str(tmp_path / "s.obj")
    m.save_obj(m.icosphere_mesh(0.2, 2), p)
    sdf = pv.MeshSDF(pv.MeshObjectFactory(p))
    qr = np.array([[-0.3, 0.3], [0.0, 0.0], [-0.3, 0.3]])
    val, grad, pts, ax, c1, c2, v = draw_sdf_slice(sdf, qr, resolution=0.05,
                                                   plot_grad=True)
    # the full Agg plot path ran: contourf + 0-contour + quiver artists exist
    assert ax is not None and c1 is not None and c2 is not None
    assert any(type(a).__name__ == "Quiver" for a in ax.get_children())
    # slice through the center: min value ~ -0.2 (sphere radius)
    assert abs(float(np.min(v)) + 0.2) < 0.02
    import matplotlib.pyplot as plt
    plt.savefig(str(tmp_path / "slice.png"))
    plt.close("all")
    assert (tmp_path / "slice.png").exists()

    # all dims > 1 -> error
    with pytest.raises(RuntimeError):
        draw_sdf_slice(sdf, np.array([[-0.3, 0.3]] * 3), resolution=0.05,
                       do_plot=False)


def test_get_transformed_meshes(tmp_path):
    d = str(tmp_path)
    urdf_path, end_link = make_serial_arm(d, num_joints=2)
    chain = pv.build_serial_chain_from_urdf(open(urdf_path).read(), end_link)
    s = pv.RobotSDF(chain, path_prefix=d)
    s.set_joint_configuration(jnp.zeros(2))
    meshes = get_transformed_meshes(s)
    assert len(meshes) == 3
    # second link's mesh should sit above the base
    assert meshes[1].aabb()[2, 1] > 0.15
