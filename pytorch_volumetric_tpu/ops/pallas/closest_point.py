"""Pallas TPU kernel: fused point→mesh closest-point + winding-number sweep.

One kernel pass replaces the reference's two Open3D C++ BVH calls
(``compute_closest_points`` + ``count_intersections``, reference
sdf.py:134,153): a 2D grid over (point tiles × triangle tiles) where each
step computes a [PT, TT] tile of point-triangle distances on the VPU,
maintains a running (min-distance, argmin face, closest point) accumulator
and accumulates winding-number solid angles — the same blockwise-streaming
structure ring attention uses, with min/sum instead of softmax.

Data layout is SoA with triangles on the 128-wide lane axis and points on the
sublane axis; triangle arrays are padded with degenerate far-away triangles
(mesh.PAD_COORD) that never win the min and contribute zero solid angle.

The triangle-tile axis is the innermost ("arbitrary") grid dimension, so the
output block for a point tile stays resident in VMEM across the whole
triangle stream.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pytorch_volumetric_tpu.mesh import PAD_COORD
from pytorch_volumetric_tpu.utils.batching import cdiv

# r4 tile A/B on the YcbPowerDrill sweep (artifacts_r04/pallas_mfu.json):
# (512, 1024) measured 12.93G point-tri pairs/s vs 12.08G at the old
# (256, 512) — bigger tiles amortize the per-step accumulator update and
# tri-tile streaming overhead; larger still gains nothing (VMEM pressure).
DEFAULT_POINT_TILE = 512
DEFAULT_TRI_TILE = 1024

_FOUR_PI = 12.566370614359172


def _atan2(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Full-range atan2 built from a minimax atan polynomial (Mosaic has no
    native atan2 lowering).  Max error ~1e-5 rad — far below the winding
    threshold margin (inside points sum to 4π, threshold at 2π)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    a = lo / jnp.where(hi <= 0.0, 1.0, hi)  # in [0, 1]; 0 when both inputs 0
    s = a * a
    # minimax polynomial for atan(a), a in [0, 1]
    r = a * (0.9998660 + s * (-0.3302995 + s * (0.1801410 + s * (
        -0.0851330 + s * 0.0208351))))
    r = jnp.where(ay > ax, 1.5707963267948966 - r, r)
    r = jnp.where(x < 0.0, 3.141592653589793 - r, r)
    return jnp.where(y < 0.0, -r, r)


def _sweep_kernel(pts_ref, tri_ref, d2_ref, cp_ref, fid_ref, wind_ref):
    """One (point-tile i, tri-tile j) step.

    pts_ref: [3, PT]  (px, py, pz rows)
    tri_ref: [9, TT]  (ax..az, bx..bz, cx..cz rows)
    d2_ref: [1, PT]; cp_ref: [3, PT]; fid_ref: [1, PT] int32; wind_ref: [1, PT]
    """
    j = pl.program_id(1)
    TT = tri_ref.shape[1]
    PT = pts_ref.shape[1]

    @pl.when(j == 0)
    def _init():
        d2_ref[...] = jnp.full_like(d2_ref, jnp.inf)
        cp_ref[...] = jnp.zeros_like(cp_ref)
        fid_ref[...] = jnp.zeros_like(fid_ref)
        wind_ref[...] = jnp.zeros_like(wind_ref)

    # [PT, 1] point components vs [1, TT] triangle components
    px = pts_ref[0, :].reshape(PT, 1)
    py = pts_ref[1, :].reshape(PT, 1)
    pz = pts_ref[2, :].reshape(PT, 1)
    ax = tri_ref[0, :].reshape(1, TT)
    ay = tri_ref[1, :].reshape(1, TT)
    az = tri_ref[2, :].reshape(1, TT)
    bx = tri_ref[3, :].reshape(1, TT)
    by = tri_ref[4, :].reshape(1, TT)
    bz = tri_ref[5, :].reshape(1, TT)
    cx = tri_ref[6, :].reshape(1, TT)
    cy = tri_ref[7, :].reshape(1, TT)
    cz = tri_ref[8, :].reshape(1, TT)

    abx, aby, abz = bx - ax, by - ay, bz - az
    acx, acy, acz = cx - ax, cy - ay, cz - az

    apx = px - ax
    apy = py - ay
    apz = pz - az

    d1 = abx * apx + aby * apy + abz * apz
    d2_ = acx * apx + acy * apy + acz * apz
    # bp = ap - ab
    bpx, bpy, bpz = apx - abx, apy - aby, apz - abz
    d3 = abx * bpx + aby * bpy + abz * bpz
    d4 = acx * bpx + acy * bpy + acz * bpz
    # cp = ap - ac
    cpx, cpy, cpz = apx - acx, apy - acy, apz - acz
    d5 = abx * cpx + aby * cpy + abz * cpz
    d6 = acx * cpx + acy * cpy + acz * cpz

    va = d3 * d6 - d5 * d4
    vb = d5 * d2_ - d1 * d6
    vc = d1 * d4 - d3 * d2_

    def safe_div(num, den):
        return num / jnp.where(jnp.abs(den) < 1e-30, 1e-30, den)

    denom = va + vb + vc
    v = safe_div(vb, denom)
    w = safe_div(vc, denom)

    v_ab = safe_div(d1, d1 - d3)
    w_ac = safe_div(d2_, d2_ - d6)
    w_bc = safe_div(d4 - d3, (d4 - d3) + (d5 - d6))

    in_a = (d1 <= 0) & (d2_ <= 0)
    in_b = (d3 >= 0) & (d4 <= d3)
    in_c = (d6 >= 0) & (d5 <= d6)
    on_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    on_ac = (vb <= 0) & (d2_ >= 0) & (d6 <= 0)
    on_bc = (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)

    v = jnp.where(on_bc, 1.0 - w_bc, v)
    w = jnp.where(on_bc, w_bc, w)
    v = jnp.where(on_ac, 0.0, v)
    w = jnp.where(on_ac, w_ac, w)
    v = jnp.where(on_ab, v_ab, v)
    w = jnp.where(on_ab, 0.0, w)
    v = jnp.where(in_c, 0.0, v)
    w = jnp.where(in_c, 1.0, w)
    v = jnp.where(in_b, 1.0, v)
    w = jnp.where(in_b, 0.0, w)
    v = jnp.where(in_a, 0.0, v)
    w = jnp.where(in_a, 0.0, w)

    qx = ax + v * abx + w * acx
    qy = ay + v * aby + w * acy
    qz = az + v * abz + w * acz
    dx, dy, dz = qx - px, qy - py, qz - pz
    dist2 = dx * dx + dy * dy + dz * dz  # [PT, TT]

    # ---- winding number contribution (van Oosterom & Strackee) ----
    # vectors from p to the three corners; a = -ap etc.
    ax_, ay_, az_ = -apx, -apy, -apz
    bx_, by_, bz_ = bx - px, by - py, bz - pz
    cx_, cy_, cz_ = cx - px, cy - py, cz - pz
    la = jnp.sqrt(ax_ * ax_ + ay_ * ay_ + az_ * az_)
    lb = jnp.sqrt(bx_ * bx_ + by_ * by_ + bz_ * bz_)
    lc = jnp.sqrt(cx_ * cx_ + cy_ * cy_ + cz_ * cz_)
    # num = a . (b x c)
    num = (ax_ * (by_ * cz_ - bz_ * cy_)
           + ay_ * (bz_ * cx_ - bx_ * cz_)
           + az_ * (bx_ * cy_ - by_ * cx_))
    den = (la * lb * lc
           + (ax_ * bx_ + ay_ * by_ + az_ * bz_) * lc
           + (bx_ * cx_ + by_ * cy_ + bz_ * cz_) * la
           + (cx_ * ax_ + cy_ * ay_ + cz_ * az_) * lb)
    wind_tile = jnp.sum(2.0 * _atan2(num, den), axis=1)  # [PT]
    wind_ref[0, :] += wind_tile

    # ---- running min across triangle tiles ----
    tile_arg = jnp.argmin(dist2, axis=1)  # [PT]
    lane = jax.lax.broadcasted_iota(jnp.int32, (PT, TT), 1)
    sel = lane == tile_arg[:, None]
    tile_d2 = jnp.min(dist2, axis=1)
    tile_qx = jnp.sum(jnp.where(sel, qx, 0.0), axis=1)
    tile_qy = jnp.sum(jnp.where(sel, qy, 0.0), axis=1)
    tile_qz = jnp.sum(jnp.where(sel, qz, 0.0), axis=1)
    tile_fid = j * TT + tile_arg

    best = d2_ref[0, :]
    better = tile_d2 < best
    d2_ref[0, :] = jnp.where(better, tile_d2, best)
    fid_ref[0, :] = jnp.where(better, tile_fid, fid_ref[0, :])
    cp_ref[0, :] = jnp.where(better, tile_qx, cp_ref[0, :])
    cp_ref[1, :] = jnp.where(better, tile_qy, cp_ref[1, :])
    cp_ref[2, :] = jnp.where(better, tile_qz, cp_ref[2, :])


@functools.partial(jax.jit,
                   static_argnames=("point_tile", "tri_tile", "interpret"))
def pallas_closest_query_soa(pts_soa: jnp.ndarray, tri_soa: jnp.ndarray,
                             point_tile: int = DEFAULT_POINT_TILE,
                             tri_tile: int = DEFAULT_TRI_TILE,
                             interpret: bool = False):
    """SoA entry: ``pts_soa [3, Pp]``, ``tri_soa [9, Fp]`` (both padded to tile
    multiples).  Returns ``(d2 [Pp], closest [3, Pp], fid [Pp], wind [Pp])``."""
    Pp = pts_soa.shape[1]
    Fp = tri_soa.shape[1]
    n_pt = Pp // point_tile
    n_tt = Fp // tri_tile

    # under shard_map with check_vma, pallas_call out_shapes must declare how
    # outputs vary over mesh axes: the sweep is elementwise over points x
    # reduced over triangles, so outputs vary over the union of both inputs'
    # axes (same rule as the XLA sweep's carry in ops.point_triangle)
    vma_kw = {}
    if hasattr(jax, "typeof"):
        vma = tuple(set(jax.typeof(pts_soa).vma)
                    | set(jax.typeof(tri_soa).vma))
        if vma:
            vma_kw = {"vma": frozenset(vma)}

    grid = (n_pt, n_tt)
    kernel = pl.pallas_call(
        _sweep_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, point_tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, tri_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, point_tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, point_tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, point_tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, point_tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, Pp), jnp.float32, **vma_kw),
            jax.ShapeDtypeStruct((3, Pp), jnp.float32, **vma_kw),
            jax.ShapeDtypeStruct((1, Pp), jnp.int32, **vma_kw),
            jax.ShapeDtypeStruct((1, Pp), jnp.float32, **vma_kw),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=110 * Pp * Fp, bytes_accessed=4 * (3 * Pp + 9 * Fp * n_pt),
            transcendentals=2 * Pp * Fp),
        interpret=interpret,
    )
    d2, cp, fid, wind = kernel(pts_soa, tri_soa)
    return d2[0], cp, fid[0], wind[0] / _FOUR_PI


def mesh_closest_query_pallas(points: jnp.ndarray, tri: jnp.ndarray,
                              point_tile: int = DEFAULT_POINT_TILE,
                              tri_tile: int = DEFAULT_TRI_TILE,
                              interpret: bool = False):
    """Drop-in equivalent of ``ops.point_triangle.mesh_closest_query`` backed
    by the Pallas sweep.  ``points [P, 3]``, ``tri [Fp, 3, 3]`` (padded to a
    multiple of 128).  Returns ``(dist [P], closest [P, 3], fid [P],
    winding [P])``."""
    P = points.shape[0]
    Fp = tri.shape[0]
    # pad triangles to the tile multiple with degenerate far-away triangles.
    # The tile itself must stay 128-lane aligned even for raw (unpadded)
    # triangle arrays — an unaligned lane-dim BlockSpec fails Mosaic lowering
    # on real TPUs while passing in interpret mode
    tri_tile = min(tri_tile, max(128, cdiv(Fp, 128) * 128))
    Ft = cdiv(Fp, tri_tile) * tri_tile
    if Ft != Fp:
        tri = jnp.pad(tri, ((0, Ft - Fp), (0, 0), (0, 0)),
                      constant_values=PAD_COORD)
    # SoA layouts
    tri_soa = tri.reshape(Ft, 9).T  # rows ax..cz
    Pp = cdiv(P, point_tile) * point_tile
    pts = points
    if Pp != P:
        pts = jnp.pad(points, ((0, Pp - P), (0, 0)), constant_values=2.0 * PAD_COORD)
    pts_soa = pts.T

    d2, cp, fid, wind = pallas_closest_query_soa(
        pts_soa, tri_soa, point_tile=point_tile, tri_tile=tri_tile,
        interpret=interpret)
    return (jnp.sqrt(d2[:P]), cp.T[:P], fid[:P], wind[:P])
