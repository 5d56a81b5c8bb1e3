"""A/B: AoS ([B,F,3]-trailing) vs SoA (per-axis [B,F]) layouts for the
coherent union's elementwise front-end, at north-star chunk scale.

Hypothesis (from roofline_arm.py): the 294 ms/chunk front-end cost is VPU
lane waste — a trailing size-3 axis lands in the 128-lane minor dimension,
so every elementwise op runs at ~3/128 lane utilization.  SoA keeps the
identical scalar math on [B, F]-shaped per-axis arrays (full lanes).

Also A/Bs the winner-row select chain (the other 278 ms): AoS [B,F,3]
wheres vs SoA per-axis wheres after one [B,F,4] -> [B,4,F] relayout.

Prints one JSON line.  Usage: python benchmarks/soa_ab.py [--chunk 25]
"""

import argparse
import json
import os
import sys

import numpy as np

BENCH_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "bench_cache")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=25)
    ap.add_argument("--points-side", type=int, default=100)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(BENCH_DIR, "xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    import pytorch_volumetric_tpu as pv
    from pytorch_volumetric_tpu import transforms as tfm
    from pytorch_volumetric_tpu.sdf import coherent_fast_tables
    from pytorch_volumetric_tpu.utils.profiling import device_time
    from pytorch_volumetric_tpu.utils.robots import make_serial_arm

    log(f"devices: {jax.devices()}")
    arm_dir = os.path.join(BENCH_DIR, "arm")
    urdf_path, end_link = make_serial_arm(arm_dir, num_joints=7)
    chain = pv.build_serial_chain_from_urdf(open(urdf_path).read(), end_link)
    robot = pv.RobotSDF(
        chain, path_prefix=arm_dir,
        link_sdf_cls=pv.cache_link_sdf_factory(
            resolution=0.02, padding=1.0,
            cache_path=os.path.join(BENCH_DIR, "sdf_cache.npz")))
    children = tuple(robot.sdf.sdfs)
    S = len(children)

    side = args.points_side
    lo, res = -0.5, 0.01
    query_range = np.array([[lo, lo + res * (side - 1)]] * 3)
    pts, take_idx, seg = pv.get_coherent_tile_points(res, query_range,
                                                     cache_resolution=0.02)
    F = pts.shape[0]
    B = args.chunk
    rng = np.random.default_rng(0)
    th = jnp.asarray(rng.normal(0, 0.3, (B, 7)).astype(np.float32))
    ft = coherent_fast_tables(children)
    with jax.ensure_compile_time_eval():
        smalls = [c._coherent_tables() for c in children]
    log(f"chunk B={B}, F={F}, seg={seg}, links={S}")

    def frontend_aos(q, p, ft):
        m, m_inv = robot._link_transforms(q)
        pts_all = tfm.transform_points(m, p).reshape(S, B, F, 3)
        FS = F // seg
        acc = jnp.float32(0)
        for ci, t in enumerate(smalls):
            pp = pts_all[ci]
            k = jnp.round((pp - t.lo) / t.res).astype(jnp.int32)
            valid = jnp.all((k >= 0) & (k < t.n), axis=-1)
            kc = jnp.clip(k, 0, t.n - 1)
            flat = jnp.sum(kc * t.strides, axis=-1)
            ks = kc.reshape(B, FS, seg, 3)
            corner2 = ks.min(axis=2) // 2
            bflat = jnp.sum(corner2 * t.bstrides, axis=-1)
            seg_valid = jnp.any(valid.reshape(B, FS, seg), axis=2)
            bflat = jnp.where(seg_valid, bflat, 0)
            off = ks - (corner2 * 2)[:, :, None, :]
            offf = jnp.sum(off * jnp.asarray([16, 4, 1], jnp.int32), axis=-1)
            acc += bflat.sum() + offf.sum() + valid.sum() + flat.sum()
        return acc

    def frontend_soa(q, p, ft):
        m, m_inv = robot._link_transforms(q)
        pts_all = tfm.transform_points(m, p).reshape(S, B, F, 3)
        # one relayout to axis-major, then all elementwise work on [B, F]
        pts_soa = jnp.moveaxis(pts_all, -1, 1)          # [S, 3, B, F]
        FS = F // seg
        acc = jnp.float32(0)
        for ci, t in enumerate(smalls):
            with jax.ensure_compile_time_eval():
                lo3 = [float(t.lo[d]) for d in range(3)]
                res3 = [float(t.res[d]) for d in range(3)]
                n3 = [int(t.n[d]) for d in range(3)]
                s3 = [int(t.strides[d]) for d in range(3)]
                bs3 = [int(t.bstrides[d]) for d in range(3)]
            kcs, corner2s, offs = [], [], []
            valid = None
            flat = jnp.int32(0)
            bflat = jnp.int32(0)
            for d in range(3):
                pd = pts_soa[ci, d]
                kd = jnp.round((pd - lo3[d]) / res3[d]).astype(jnp.int32)
                vd = (kd >= 0) & (kd < n3[d])
                valid = vd if valid is None else (valid & vd)
                kcd = jnp.clip(kd, 0, n3[d] - 1)
                flat = flat + kcd * s3[d]
                ksd = kcd.reshape(B, FS, seg)
                c2d = ksd.min(axis=2) // 2
                bflat = bflat + c2d * bs3[d]
                offs.append(ksd - (c2d * 2)[:, :, None])
            offf = offs[0] * 16 + offs[1] * 4 + offs[2]
            seg_valid = jnp.any(valid.reshape(B, FS, seg), axis=2)
            bflat = jnp.where(seg_valid, bflat, 0)
            acc += bflat.sum() + offf.sum() + valid.sum() + flat.sum()
        return acc

    times = {}
    for name, fn in (("frontend_aos", frontend_aos),
                     ("frontend_soa", frontend_soa)):
        t = device_time(fn, th, pts, ft, reps=args.reps)
        times[name] = t
        log(f"{name}: {t * 1e3:.1f} ms")

    # winner-select A/B: gather [B,F] rows from a [G,4] table, then the
    # valid/where chain in AoS vs SoA
    G = int(sum(int(np.prod(np.asarray(t.n))) for t in smalls))
    vg_cat = jnp.concatenate([t.vg for t in ft], axis=0)
    idx = jnp.asarray(rng.integers(0, G, (B, F)), dtype=jnp.int32)
    bv = jnp.asarray(rng.uniform(-1, 1, (B, F)).astype(np.float32))

    def winner_aos(idx, bv, vg_cat):
        rows = vg_cat[idx]                       # [B, F, 4]
        g_in = rows[..., 1:4]
        valid = bv > 0
        g_oob = jnp.stack([bv, -bv, bv], axis=-1)
        g = jnp.where(valid[..., None], g_in, g_oob)
        return g.sum() + rows[..., 0].sum()

    def winner_soa(idx, bv, vg_cat):
        rows = vg_cat[idx]                       # [B, F, 4]
        rows_t = jnp.moveaxis(rows, -1, 0)       # [4, B, F] one relayout
        valid = bv > 0
        acc = rows_t[0].sum()
        for d, sgn in ((1, 1.0), (2, -1.0), (3, 1.0)):
            g_d = jnp.where(valid, rows_t[d], sgn * bv)
            acc += g_d.sum()
        return acc

    for name, fn in (("winner_aos", winner_aos), ("winner_soa", winner_soa)):
        t = device_time(fn, idx, bv, vg_cat, reps=args.reps)
        times[name] = t
        log(f"{name}: {t * 1e3:.1f} ms")

    print(json.dumps({
        "metric": "soa_ab",
        "value": round(times["frontend_aos"] / times["frontend_soa"], 2),
        "unit": "frontend AoS/SoA speedup (one chunk)",
        "extra": {k: round(v * 1e3, 1) for k, v in times.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
