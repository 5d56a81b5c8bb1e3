"""Stage-wise roofline decomposition of the north-star arm forward.

The 200x1e6 arm workload (`northstar.py`) measured 34.5M q/s in round 3 —
~2.5x above the repo's own gather cost model (~5.9 ns + 42 ps/B per row;
ARCHITECTURE.md).  This harness times ONE configuration chunk (the
`lax.map` body of the north-star step: chunk x 1e6 points x 8 cached
links) in cumulative stages, so each stage delta attributes real device
time to one pipeline phase:

  transform   world->link point transforms for all S children ([S,B,F,3])
  frontend    + voxel keys / validity / brick coords / tile offsets
  gather      + the [B, FS, 64] value-brick row gather per child
  extract     + one-hot extraction of per-point values from brick rows
  union       + AABB fallback and the sequential min-union carry
                (== the values_only path end-to-end)
  full        + per-point winner-row gradient gather (== the real forward)

Each stage is a separately jitted program timed by the chained-scan method
(`utils.profiling.device_time`); DCE is defeated by summing every stage's
live outputs into the scalar result.  Also records XLA's own
`cost_analysis()` flops/bytes for the full stage.

Caveat: stages are separate XLA programs, so a stage's delta includes any
fusion-boundary changes it induces — treat deltas as attribution evidence,
not exact kernel times.  Prints one JSON line.

Usage: python benchmarks/roofline_arm.py [--chunk 25] [--points-side 100]
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
    ap.add_argument("--chunk", type=int, default=25,
                    help="configurations per chunk (the north-star lax.map "
                         "body size)")
    ap.add_argument("--points-side", type=int, default=100)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--trace-dir", default=None,
                    help="also capture an XLA profiler trace of the full "
                         "stage into this directory")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(BENCH_DIR, "xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    import pytorch_volumetric_tpu as pv
    from pytorch_volumetric_tpu import transforms as tfm
    from pytorch_volumetric_tpu.sdf import (_aabb_distance_grad,
                                            _coherent_vg_bases,
                                            coherent_fast_tables)
    from pytorch_volumetric_tpu.utils.profiling import device_time
    from pytorch_volumetric_tpu.utils.robots import make_serial_arm

    log(f"devices: {jax.devices()}")
    os.makedirs(BENCH_DIR, exist_ok=True)
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
    M = take_idx.shape[0]
    B = args.chunk
    rng = np.random.default_rng(0)
    th = jnp.asarray(rng.normal(0, 0.3, (B, 7)).astype(np.float32))
    ft = coherent_fast_tables(children)
    with jax.ensure_compile_time_eval():
        smalls = [c._coherent_tables() for c in children]
    bases = _coherent_vg_bases(smalls)
    iota64 = np.arange(64, dtype=np.int32)
    off_ravel = np.asarray([16, 4, 1], dtype=np.int32)
    log(f"chunk B={B}, F={F} (M={M}), seg={seg}, links={S}")

    # -- cumulative stage bodies (mirror _coherent_union_lookup's math) -----
    def stage_fn(stage):
        def fn(q, p, ft):
            m, m_inv = robot._link_transforms(q)
            pts_all = tfm.transform_points(m, p).reshape(S, B, F, 3)
            if stage == "transform":
                return pts_all.sum()
            acc = jnp.float32(0)
            FS = F // seg
            best_v = best_i = best_flat = best_valid = best_g_oob = None
            for ci, t in enumerate(smalls):
                pp = pts_all[ci]
                k = jnp.round((pp - t.lo) / t.res).astype(jnp.int32)
                valid = jnp.all((k >= 0) & (k < t.n), axis=-1)
                kc = jnp.clip(k, 0, t.n - 1)
                flat = jnp.sum(kc * t.strides, axis=-1) + int(bases[ci])
                ks = kc.reshape(B, FS, seg, 3)
                corner2 = ks.min(axis=2) // 2
                bflat = jnp.sum(corner2 * t.bstrides, axis=-1)
                seg_valid = jnp.any(valid.reshape(B, FS, seg), axis=2)
                bflat = jnp.where(seg_valid, bflat, 0)
                off = ks - (corner2 * 2)[:, :, None, :]
                offf = jnp.sum(off * off_ravel, axis=-1)
                if stage == "frontend":
                    acc += (bflat.sum() + offf.sum() + valid.sum()
                            + flat.sum())
                    continue
                rows = ft[ci].bricks[bflat]                    # [B, FS, 64]
                if stage == "gather":
                    acc += rows.sum() + offf.sum() + valid.sum() + flat.sum()
                    continue
                oh64 = (offf[..., None] == iota64).astype(pp.dtype)
                v_in = jnp.sum(rows[:, :, None, :] * oh64,
                               axis=-1).reshape(B, F)
                if stage == "extract":
                    acc += v_in.sum() + valid.sum() + flat.sum()
                    continue
                v_oob, g_oob = _aabb_distance_grad(t.bb, pp)
                v = jnp.where(valid, v_in, v_oob)
                if best_v is None:
                    best_v, best_flat, best_valid = v, flat, valid
                    best_g_oob = g_oob
                    best_i = jnp.zeros_like(flat)
                else:
                    better = v < best_v
                    best_v = jnp.where(better, v, best_v)
                    best_flat = jnp.where(better, flat, best_flat)
                    best_valid = jnp.where(better, valid, best_valid)
                    best_g_oob = jnp.where(better[..., None], g_oob,
                                           best_g_oob)
                    best_i = jnp.where(better, ci, best_i)
            if stage in ("frontend", "gather", "extract"):
                return acc
            if stage == "union":
                return best_v.sum() + best_i.sum() + best_flat.sum()
            # full: winner-row gradient gather
            vg_cat = jnp.concatenate([t.vg for t in ft], axis=0)
            best_flat = jnp.where(best_valid, best_flat, 0)
            g_in = vg_cat[best_flat][..., 1:4]
            g_link = jnp.where(best_valid[..., None], g_in, best_g_oob)
            return best_v.sum() + g_link.sum()
        return fn

    stages = ["transform", "frontend", "gather", "extract", "union", "full"]
    times = {}
    for st in stages:
        t = device_time(stage_fn(st), th, pts, ft, reps=args.reps)
        times[st] = t
        log(f"{st:10s}: {t * 1e3:8.1f} ms")

    deltas = {stages[0]: times[stages[0]]}
    for a, b in zip(stages, stages[1:]):
        deltas[b] = times[b] - times[a]
    for st in stages:
        log(f"delta {st:10s}: {deltas[st] * 1e3:8.1f} ms")

    # the repo's gather cost model, for comparison (ARCHITECTURE.md)
    FS = F // seg
    brick_rows = S * B * FS
    winner_rows = B * F
    model_gather_ms = brick_rows * (5.9e-9 + 256 * 42e-12) * 1e3
    model_winner_ms = winner_rows * (5.9e-9 + 16 * 42e-12) * 1e3
    log(f"cost model: brick gather {model_gather_ms:.1f} ms "
        f"({brick_rows / 1e6:.1f}M rows), winner rows {model_winner_ms:.1f} ms "
        f"({winner_rows / 1e6:.0f}M rows)")

    # XLA's own accounting of the full program
    full = jax.jit(stage_fn("full")).lower(th, pts, ft).compile()
    ca = full.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    cost = {k: float(ca[k]) for k in ("flops", "bytes accessed")
            if ca and k in ca}
    log(f"XLA cost_analysis (full): {cost}")

    if args.trace_dir:
        from pytorch_volumetric_tpu.utils import profiling
        fn = jax.jit(stage_fn("full"))
        float(fn(th, pts, ft))
        with profiling.trace(args.trace_dir):
            float(fn(th, pts, ft))
        log(f"trace written to {args.trace_dir}")

    qps = B * M / times["full"]
    print(json.dumps({
        "metric": "northstar_arm_chunk_roofline",
        "value": round(qps, 1),
        "unit": f"config-point queries/s (one {B}x{M} chunk, fwd)",
        "extra": {
            "stage_ms": {k: round(v * 1e3, 1) for k, v in times.items()},
            "delta_ms": {k: round(v * 1e3, 1) for k, v in deltas.items()},
            "model_brick_gather_ms": round(model_gather_ms, 1),
            "model_winner_rows_ms": round(model_winner_ms, 1),
            "xla_cost_analysis": cost,
            "chunk": B, "seg": seg, "links": S, "points": F,
        },
    }), flush=True)


if __name__ == "__main__":
    main()
