"""Batched point→triangle-mesh closest-point and winding-number queries.

TPU-native replacement for Open3D's C++ ``RaycastingScene`` BVH queries
(reference sdf.py:117-154).  Instead of a pointer-chasing BVH, this is a
brute-force streaming sweep over triangle tiles — dense, regular compute that
XLA/Pallas can tile onto the VPU/MXU, with a running min (closest point) and a
running sum (generalized winding number for the inside/outside sign) carried
across tiles.  The winding-number sign is deterministic and robust for closed
meshes, unlike the reference's jittered ray-parity trick (sdf.py:147-154).

Shapes are static: triangle arrays are padded with degenerate far-away
triangles (mesh.PAD_COORD) which can never win the min and contribute exactly
zero solid angle.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from pytorch_volumetric_tpu.utils.batching import cdiv

# chunk sizes keep the [point_chunk, tri_chunk] pairwise intermediates in
# on-chip memory; both are multiples of the 8x128 VPU tile
DEFAULT_POINT_CHUNK = 2048
DEFAULT_TRI_CHUNK = 512

_FOUR_PI = 12.566370614359172


def _closest_point_bary(p: jnp.ndarray, a: jnp.ndarray, ab: jnp.ndarray,
                        ac: jnp.ndarray, with_features: bool = False):
    """Closest point on each triangle for each point (Ericson RTCD §5.1.5,
    branch-free).  ``p``: [P, 1, 3]; ``a, ab, ac``: [1-or-P, T, 3]
    (broadcast).  Returns (dist2 [P, T], closest [P, T, 3]); with
    ``with_features`` also the closest-feature code [P, T] int32 (0 face,
    1..3 vertex A/B/C, 4..6 edge AB/BC/CA — the pseudonormal row layout used
    by ops.narrow_band)."""
    ap = p - a
    d1 = jnp.sum(ab * ap, axis=-1)
    d2 = jnp.sum(ac * ap, axis=-1)
    bp = ap - ab
    d3 = jnp.sum(ab * bp, axis=-1)
    d4 = jnp.sum(ac * bp, axis=-1)
    cp = ap - ac
    d5 = jnp.sum(ab * cp, axis=-1)
    d6 = jnp.sum(ac * cp, axis=-1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    def safe_div(num, den):
        return num / jnp.where(jnp.abs(den) < 1e-30, 1e-30, den)

    # interior barycentric
    denom = va + vb + vc
    v_in = safe_div(vb, denom)
    w_in = safe_div(vc, denom)

    # edge candidates
    v_ab = safe_div(d1, d1 - d3)                       # on AB
    w_ac = safe_div(d2, d2 - d6)                       # on AC
    w_bc = safe_div(d4 - d3, (d4 - d3) + (d5 - d6))    # on BC

    in_a = (d1 <= 0) & (d2 <= 0)
    in_b = (d3 >= 0) & (d4 <= d3)
    in_c = (d6 >= 0) & (d5 <= d6)
    on_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    on_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    on_bc = (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)

    # priority cascade (vertices, then edges, then interior)
    v = v_in
    w = w_in
    v, w = jnp.where(on_bc, 1.0 - w_bc, v), jnp.where(on_bc, w_bc, w)
    v, w = jnp.where(on_ac, 0.0, v), jnp.where(on_ac, w_ac, w)
    v, w = jnp.where(on_ab, v_ab, v), jnp.where(on_ab, 0.0, w)
    v, w = jnp.where(in_c, 0.0, v), jnp.where(in_c, 1.0, w)
    v, w = jnp.where(in_b, 1.0, v), jnp.where(in_b, 0.0, w)
    v, w = jnp.where(in_a, 0.0, v), jnp.where(in_a, 0.0, w)

    closest = a + v[..., None] * ab + w[..., None] * ac
    diff = closest - p
    dist2 = jnp.sum(diff * diff, axis=-1)
    if not with_features:
        return dist2, closest
    feat = jnp.zeros(dist2.shape, dtype=jnp.int32)
    feat = jnp.where(on_bc, 5, feat)
    feat = jnp.where(on_ac, 6, feat)
    feat = jnp.where(on_ab, 4, feat)
    feat = jnp.where(in_c, 3, feat)
    feat = jnp.where(in_b, 2, feat)
    feat = jnp.where(in_a, 1, feat)
    return dist2, closest, feat


def _winding_contrib(p: jnp.ndarray, va: jnp.ndarray, vb: jnp.ndarray,
                     vc: jnp.ndarray) -> jnp.ndarray:
    """Solid angle of each triangle seen from each point (van Oosterom &
    Strackee).  ``p``: [P, 1, 3]; ``va, vb, vc``: [1, T, 3].  Returns [P, T].
    Degenerate (padding) triangles contribute exactly 0."""
    a = va - p
    b = vb - p
    c = vc - p
    la = jnp.linalg.norm(a, axis=-1)
    lb = jnp.linalg.norm(b, axis=-1)
    lc = jnp.linalg.norm(c, axis=-1)
    num = jnp.sum(a * jnp.cross(b, c), axis=-1)
    den = (la * lb * lc + jnp.sum(a * b, axis=-1) * lc
           + jnp.sum(b * c, axis=-1) * la + jnp.sum(c * a, axis=-1) * lb)
    return 2.0 * jnp.arctan2(num, den)


def _sweep_chunk(points: jnp.ndarray, tri: jnp.ndarray, tri_chunk: int):
    """One point-chunk against all triangles: scan over triangle tiles with a
    running (min-dist, closest, face-id, winding-sum) carry."""
    P = points.shape[0]
    Fp = tri.shape[0]
    n_tiles = cdiv(Fp, tri_chunk)
    tri_tiles = tri.reshape(n_tiles, tri_chunk, 3, 3)
    p = points[:, None, :]

    def body(carry, tile):
        best_d2, best_pt, best_fid, wind, tile_idx = carry
        a = tile[None, :, 0, :]
        b = tile[None, :, 1, :]
        c = tile[None, :, 2, :]
        ab = b - a
        ac = c - a
        d2, cp = _closest_point_bary(p, a, ab, ac)
        wind = wind + jnp.sum(_winding_contrib(p, a, b, c), axis=-1)
        arg = jnp.argmin(d2, axis=-1)
        tile_best_d2 = jnp.take_along_axis(d2, arg[:, None], axis=-1)[:, 0]
        tile_best_pt = jnp.take_along_axis(cp, arg[:, None, None], axis=-2)[:, 0, :]
        tile_fid = tile_idx * tri_chunk + arg
        better = tile_best_d2 < best_d2
        best_pt = jnp.where(better[:, None], tile_best_pt, best_pt)
        best_fid = jnp.where(better, tile_fid, best_fid)
        best_d2 = jnp.where(better, tile_best_d2, best_d2)
        return (best_d2, best_pt, best_fid, wind, tile_idx + 1), None

    init = (
        jnp.full((P,), jnp.inf, dtype=points.dtype),
        jnp.zeros((P, 3), dtype=points.dtype),
        jnp.zeros((P,), dtype=jnp.int32),
        jnp.zeros((P,), dtype=points.dtype),
        jnp.int32(0),
    )
    # under shard_map the triangle (and possibly point) shards are
    # device-varying while the init constants are not; mark the carry as
    # varying over the UNION of both operands' axes (a 2D point x triangle
    # layout mixes them in the body) so the scan's carry types match
    vma = (tuple(set(jax.typeof(tri).vma) | set(jax.typeof(points).vma))
           if hasattr(jax, "typeof") else ())
    if vma:
        if hasattr(jax.lax, "pcast"):
            _pvary = lambda a: jax.lax.pcast(a, vma, to="varying")
        else:  # older jax without pcast
            _pvary = lambda a: jax.lax.pvary(a, vma)
        init = jax.tree_util.tree_map(_pvary, init)
    (best_d2, best_pt, best_fid, wind, _), _ = jax.lax.scan(body, init, tri_tiles)
    return best_d2, best_pt, best_fid, wind / _FOUR_PI


@functools.partial(jax.jit, static_argnames=("point_chunk", "tri_chunk"))
def mesh_closest_query(points: jnp.ndarray, tri: jnp.ndarray,
                       point_chunk: int = DEFAULT_POINT_CHUNK,
                       tri_chunk: int = DEFAULT_TRI_CHUNK):
    """Closest point + winding number for ``points [P, 3]`` against padded
    triangles ``tri [Fp, 3, 3]``.

    Returns ``(dist [P] unsigned, closest [P, 3], face_id [P],
    winding [P])``.  Memory is bounded by chunking both points and triangles;
    all shapes static.
    """
    from pytorch_volumetric_tpu.mesh import PAD_COORD

    P = points.shape[0]
    Fp = tri.shape[0]
    tri_chunk = min(tri_chunk, Fp)
    if Fp % tri_chunk != 0:
        # pad with degenerate far-away triangles to a tile multiple
        extra = cdiv(Fp, tri_chunk) * tri_chunk - Fp
        tri = jnp.pad(tri, ((0, extra), (0, 0), (0, 0)), constant_values=PAD_COORD)
    if P <= point_chunk:
        d2, cp, fid, wind = _sweep_chunk(points, tri, tri_chunk)
    else:
        n = cdiv(P, point_chunk)
        Ppad = n * point_chunk
        pts = jnp.pad(points, ((0, Ppad - P), (0, 0)))
        pts = pts.reshape(n, point_chunk, 3)
        d2, cp, fid, wind = jax.lax.map(
            lambda x: _sweep_chunk(x, tri, tri_chunk), pts)
        d2 = d2.reshape(-1)[:P]
        cp = cp.reshape(-1, 3)[:P]
        fid = fid.reshape(-1)[:P]
        wind = wind.reshape(-1)[:P]
    return jnp.sqrt(d2), cp, fid, wind


def signed_closest_query(points: jnp.ndarray, tri: jnp.ndarray,
                         normals: jnp.ndarray,
                         surface_normal_eps: float = 1e-3,
                         winding_threshold: float = 0.5,
                         point_chunk: int = DEFAULT_POINT_CHUNK,
                         tri_chunk: int = DEFAULT_TRI_CHUNK,
                         backend: str = "auto"):
    """Full signed query matching the reference's semantics
    (sdf.py:122-172): signed distance, SDF gradient (with the face-normal
    override within ``surface_normal_eps`` of the surface, sdf.py:159-164),
    closest surface point, and the face normal at the closest point.

    ``backend``: "auto" uses the Pallas TPU kernel on TPU and the XLA sweep
    elsewhere; "pallas" / "xla" force one.

    Returns ``(closest [P,3], sdf [P], gradient [P,3], normal [P,3])``.
    """
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "pallas":
        from pytorch_volumetric_tpu.ops.pallas.closest_point import (
            DEFAULT_POINT_TILE, DEFAULT_TRI_TILE, mesh_closest_query_pallas)
        # honor the caller's memory-control knobs on this backend too (the
        # kernel tiles are the pallas analog of the XLA sweep's chunks),
        # clamped to TPU tiling alignment (8 sublanes / 128 lanes)
        pt = max(8, min(point_chunk, DEFAULT_POINT_TILE) // 8 * 8)
        tt = max(128, min(tri_chunk, DEFAULT_TRI_TILE) // 128 * 128)
        dist, closest, fid, wind = mesh_closest_query_pallas(
            points, tri, point_tile=pt, tri_tile=tt)
    else:
        dist, closest, fid, wind = mesh_closest_query(
            points, tri, point_chunk=point_chunk, tri_chunk=tri_chunk)
    # |winding|: orientation-independent, like the reference's ray parity
    # (an inverted mesh has winding -1 inside; parity treats it as inside too)
    inside = jnp.abs(wind) > winding_threshold
    sign = jnp.where(inside, -1.0, 1.0).astype(points.dtype)
    sdf = sign * dist
    away = points - closest
    grad = sign[..., None] * away / jnp.maximum(dist, 1e-12)[..., None]
    face_n = normals[fid]
    on_surface = dist < surface_normal_eps
    grad = jnp.where(on_surface[..., None], face_n, grad)
    return closest, sdf, grad, face_n
