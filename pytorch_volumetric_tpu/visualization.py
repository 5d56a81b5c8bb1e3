"""SDF visualization helpers (headless matplotlib).

Re-implementation of the reference's ``visualization.py``: 2D SDF slices with
0-level contours and optional gradient quiver (reference
visualization.py:21-80) and world-frame transformed link meshes (reference
visualization.py:83-106, returning our ``TriangleMesh`` instead of open3d
geometry).  Matplotlib is imported lazily and works with the Agg backend.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from pytorch_volumetric_tpu import sdf as sdf_mod
from pytorch_volumetric_tpu import transforms as tfm
from pytorch_volumetric_tpu import voxel
from pytorch_volumetric_tpu import model_to_sdf


def fmt(x):
    """Contour-label formatter: the zero level reads "surface", other
    levels print with one decimal unless that decimal is zero (behavioral
    contract of the reference's clabel formatting, visualization.py:12-18;
    pinned by tests/test_visualization.py)."""
    if x == 0:
        return "surface"
    return f"{x:.0f}" if float(f"{x:.1f}").is_integer() else f"{x:.1f}"


def draw_sdf_slice(s: sdf_mod.ObjectFrameSDF, query_range, resolution=0.01,
                   interior_padding=0.2, cmap="Greys_r", device=None,
                   plot_grad=False, do_plot=True, key=None):
    """Evaluate (and optionally plot) an axis-aligned SDF slice.

    ``query_range``: (min, max) per dimension with exactly one dimension
    having min == max (the sliced dimension).  Query points get 1e-6 jitter to
    avoid grid-aligned artifacts (reference visualization.py:36-37).

    :return: (sdf_val, sdf_grad, pts, ax, cset1, cset2, v)
    """
    coords, pts = voxel.get_coordinates_and_points_in_grid(resolution, query_range)
    if key is None:
        key = jax.random.PRNGKey(0)
    pts = pts + jax.random.normal(key, pts.shape, dtype=pts.dtype) * 1e-6
    # grid sweeps are spatially coherent: use the segmented brick-gather fast
    # path when the SDF supports it and the contract holds (cached children,
    # sweep resolution fine enough); identical values, ~3.5x fewer gathers
    take_idx = None
    if hasattr(s, "query_coherent"):
        from pytorch_volumetric_tpu.sdf import coherent_min_cache_resolution
        min_res = coherent_min_cache_resolution(getattr(s, "sdfs", ()))
        pts_c, take_idx, seg = voxel.get_coherent_tile_points(
            resolution, query_range, cache_resolution=min_res)
        pts_c = pts_c + jax.random.normal(key, pts_c.shape,
                                          dtype=pts_c.dtype) * 1e-6
        if not s.check_coherent_contract(pts_c, seg=seg):
            take_idx = None
    dim_labels = ["x", "y", "z"]
    slice_dim = None
    for i in range(len(coords)):
        if len(coords[i]) == 1:
            slice_dim = i
            break
    if slice_dim is None:
        raise RuntimeError(
            "Sliced SDF requires a single query value for the sliced dimension, "
            "but all query dimensions have > 1 values")
    shown_dims = [i for i in range(3) if i != slice_dim]

    if take_idx is not None:
        v_c, g_c = s.query_coherent(pts_c, seg=seg)
        sdf_val, sdf_grad = v_c[..., take_idx], g_c[..., take_idx, :]
        # return the points the values were ACTUALLY evaluated at (the
        # coherent layout drew its own jitter); keeps the reference's
        # (pts, value) pairing contract on both paths
        pts = pts_c[take_idx]
    else:
        sdf_val, sdf_grad = s(pts)
    x = np.asarray(coords[shown_dims[0]])
    z = np.asarray(coords[shown_dims[1]])
    v = np.asarray(sdf_val).reshape(len(x), len(z)).T

    ax = cset1 = cset2 = None
    if do_plot:
        from matplotlib import pyplot as plt
        import matplotlib.colors
        norm = matplotlib.colors.Normalize(
            vmin=float(np.min(v)) - interior_padding, vmax=float(np.max(v)))
        ax = plt.gca()
        ax.set_xlabel(dim_labels[shown_dims[0]])
        ax.set_ylabel(dim_labels[shown_dims[1]])
        cset1 = ax.contourf(x, z, v, norm=norm, cmap=cmap)
        cset2 = ax.contour(x, z, v, colors="k", levels=[0], linestyles="dashed")
        if plot_grad:
            g = np.asarray(sdf_grad).reshape(len(x), len(z), 3).transpose(1, 0, 2)
            n = 5
            ax.quiver(x[::n], z[::n],
                      g[::n, ::n, shown_dims[0]], g[::n, ::n, shown_dims[1]],
                      color="g")
        ax.clabel(cset2, cset2.levels, inline=True, fontsize=13, fmt=fmt)
        plt.colorbar(cset1)
        plt.draw()
    return sdf_val, sdf_grad, pts, ax, cset1, cset2, v


def get_transformed_meshes(robot_sdf: model_to_sdf.RobotSDF, obj_to_world_tsf=None):
    """Per-link meshes transformed to the world frame (reference
    visualization.py:83-106).  Returns a list of :class:`mesh.TriangleMesh`."""
    meshes = []
    tsfs = robot_sdf.sdf.link_frame_to_obj_frame  # [L*A, 4, 4] link->obj
    if obj_to_world_tsf is not None:
        tsfs = tfm.mm(obj_to_world_tsf.get_matrix(), tsfs)
    tsfs = np.asarray(tsfs)
    for i in range(len(robot_sdf.sdf_to_link_name)):
        sl = robot_sdf.sdf.ith_transform_slice(i)
        mesh = robot_sdf.sdf.sdfs[i].obj_factory._mesh
        meshes.append(mesh.transform(tsfs[sl][0]))
    return meshes
