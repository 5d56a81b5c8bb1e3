"""Measure the per-tile winner-agreement rate for multi-link coherent unions.

The r4 roofline showed the per-POINT winner-row gather is 59% of the
north-star arm forward (artifacts_r04/trace_v3).  The per-TILE winner fast
path gathers ONE gradient-brick row per tile when every (winner-in-bounds)
point of the tile agrees on the argmin link, falling back to per-point rows
on boundary tiles.  Whether that wins depends on the agreement rate — this
harness measures it (VERDICT r4 item 1's prescribed first step) on the
bench workloads: the headline arm (padding 1.0), the tight arm (padding
0.1), and a 3D north-star-style block, at their native tile sizes.

A tile needs NO winner rows at all when no point's winner is in bounds
(pure AABB-fallback tiles) — counted separately ("no_rows").

Usage: python benchmarks/winner_agreement.py [--configs 8]
Runs fine on CPU (it is one argmin + histogram, not a timing run).
"""

import argparse
import json
import os
import sys
import tempfile

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def tile_stats(children, robot, th, pts, seg):
    """Fraction of (config, tile) pairs that are (a) unanimously won by one
    link among winner-in-bounds points, (b) fully AABB-fallback (no rows
    needed), (c) disagreeing (need the per-point fallback)."""
    import jax.numpy as jnp

    from pytorch_volumetric_tpu import transforms as tfm
    from pytorch_volumetric_tpu.sdf import _aabb_distance_grad

    m, m_inv = robot._link_transforms(th)
    B = th.shape[0]
    F = pts.shape[0]
    FS = F // seg
    S = len(children)
    pts_all = tfm.transform_points(m[:, None], jnp.asarray(pts)).reshape(
        S, B, FS, seg, 3)

    best_v = best_i = best_valid = None
    for ci, s in enumerate(children):
        t = s._coherent_tables(with_value_bricks=False)
        p = pts_all[ci]
        k = jnp.round((p - t.lo) / t.res).astype(jnp.int32)
        valid = jnp.all((k >= 0) & (k < t.n), axis=-1)
        kc = jnp.clip(k, 0, t.n - 1)
        flat = jnp.sum(kc * t.strides, axis=-1)
        v_in = t.vg[jnp.where(valid, flat, 0)][..., 0]
        v_oob, _ = _aabb_distance_grad(t.bb, p)
        v = jnp.where(valid, v_in, v_oob)
        if best_v is None:
            best_v, best_i, best_valid = v, jnp.zeros_like(flat), valid
        else:
            better = v < best_v
            best_v = jnp.where(better, v, best_v)
            best_i = jnp.where(better, ci, best_i)
            best_valid = jnp.where(better, valid, best_valid)

    bi = np.asarray(best_i)           # [B, FS, seg]
    bv = np.asarray(best_valid)
    eff_min = np.where(bv, bi, S + 1).min(axis=-1)   # [B, FS]
    eff_max = np.where(bv, bi, -1).max(axis=-1)
    no_rows = eff_max < 0                            # no in-bounds winner
    agree = (~no_rows) & (eff_min == eff_max)
    disagree = (~no_rows) & ~agree
    n = agree.size
    rows_pp_all = bv.sum()                 # rows today (per-point design)
    rows_pp_fallback = (bv & disagree[..., None]).sum()
    # distinct in-bounds winners per tile: a top-K gradient-brick design
    # covers every <=K-winner tile with K brick rows and zero per-point rows
    nwin = np.zeros(agree.shape, dtype=np.int32)
    for ci in range(S):
        nwin += (bv & (bi == ci)).any(axis=-1)
    return {
        "tiles": int(n),
        "agree_frac": round(float(agree.sum() / n), 4),
        "no_rows_frac": round(float(no_rows.sum() / n), 4),
        "disagree_frac": round(float(disagree.sum() / n), 4),
        "le2_winners_frac": round(float((nwin <= 2).mean()), 4),
        "le3_winners_frac": round(float((nwin <= 3).mean()), 4),
        "max_winners": int(nwin.max()),
        "winner_rows_per_point_design": int(rows_pp_all),
        "winner_rows_tile_design": int(agree.sum() + rows_pp_fallback),
        "row_reduction_x": round(
            float(rows_pp_all) / max(1.0, float(agree.sum()
                                                + rows_pp_fallback)), 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", type=int, default=8)
    args = ap.parse_args()

    import jax.numpy as jnp

    import pytorch_volumetric_tpu as pv
    from pytorch_volumetric_tpu.utils.robots import make_serial_arm

    d = tempfile.mkdtemp(prefix="pvt_agree_")
    cache_root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench_cache")
    arm_dir = os.path.join(cache_root, "arm")
    if not os.path.isdir(arm_dir):
        arm_dir = os.path.join(d, "arm")
    urdf_path, end_link = make_serial_arm(arm_dir, num_joints=7)
    chain = pv.build_serial_chain_from_urdf(open(urdf_path).read(), end_link)

    rng = np.random.default_rng(0)
    th0 = np.array([0.0, -np.pi / 4, 0.0, np.pi / 2, 0.0, np.pi / 4, 0.0],
                   dtype=np.float32)
    th = jnp.asarray(np.concatenate(
        [th0[None], th0 + rng.normal(0, 0.1, (args.configs - 1, 7))]),
        dtype=jnp.float32)

    out = {}
    for label, padding, cache in (
            ("headline_pad1.0", 1.0, "sdf_cache.npz"),
            ("tight_pad0.1", 0.1, "sdf_cache_tight.npz")):
        robot = pv.RobotSDF(
            chain, path_prefix=arm_dir,
            link_sdf_cls=pv.cache_link_sdf_factory(
                resolution=0.02, padding=padding,
                cache_path=os.path.join(cache_root, cache)))
        children = tuple(robot.sdf.sdfs)

        # 2D bench slice (seg=12 tiles)
        qr = np.array([[-1.0, 0.5], [0.02, 0.02], [-0.2, 0.8]])
        pts, _, seg = pv.get_coherent_tile_points(0.01, qr,
                                                  cache_resolution=0.02)
        out[f"{label}_slice2d_seg{seg}"] = tile_stats(
            children, robot, th, pts, seg)
        log(label, "2d", out[f"{label}_slice2d_seg{seg}"])

        # 3D north-star-style block (seg=27 tiles), subsampled for CPU
        qr3 = np.array([[-0.8, 0.2], [-0.4, 0.4], [-0.2, 0.6]])
        pts3, _, seg3 = pv.get_coherent_tile_points(0.02, qr3,
                                                    cache_resolution=0.02 * 2)
        if seg3 < 8:  # ratio 2 gives lines; use a finer sweep for tiles
            pts3, _, seg3 = pv.get_coherent_tile_points(
                0.01, qr3, cache_resolution=0.02)
        out[f"{label}_block3d_seg{seg3}"] = tile_stats(
            children, robot, th[:4], pts3, seg3)
        log(label, "3d", out[f"{label}_block3d_seg{seg3}"])

    print(json.dumps({"metric": "winner_tile_agreement", "results": out}))


if __name__ == "__main__":
    main()
