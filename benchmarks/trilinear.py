"""Trilinear vs nearest CachedSDF query cost (VERDICT r3 item 8).

Trilinear caches are excluded from the coherent brick fast path
(`_is_coherent_fast_child`) — a trilinear read needs the 8 corner rows of
the query cell, which the stride-2 brick anchoring only guarantees for
the NEAREST voxel key, so trilinear children take the generic per-point
path.  This harness puts a number on that cliff for the drill cache:

  nearest / generic     one 16 B row per point (issue-bound)
  trilinear / generic   eight 16 B rows + lerp arithmetic per point
  nearest / coherent    one 256 B brick row per `seg`-point tile
                        (+ the 4-channel single-child layout's gradient)

Prints one JSON line.  Usage: python benchmarks/trilinear.py [--points N]
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
    ap.add_argument("--points-side", type=int, default=100)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(BENCH_DIR, "xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    import pytorch_volumetric_tpu as pv
    from pytorch_volumetric_tpu.utils.profiling import device_time

    log(f"devices: {jax.devices()}")
    drill = ("/root/reference/tests/YcbPowerDrill/"
             "textured_simple_reoriented.obj")
    fac = pv.MeshObjectFactory(drill)
    gt = pv.MeshSDF(fac)
    bb = fac.bounding_box(padding=0.3)
    kw = dict(cache_path=os.path.join(BENCH_DIR, "sdf_cache_drill_tri.npz"))
    nearest = pv.CachedSDF("drill_tri", 0.01, bb, gt, **kw)
    trilin = pv.CachedSDF("drill_tri", 0.01, bb, gt,
                          interpolation="trilinear", **kw)
    log("caches ready")

    side = args.points_side
    res = 0.005
    lo = -0.5 * res * (side - 1)
    qr = np.array([[lo, lo + res * (side - 1)]] * 3)
    pts_c, take_idx, seg = pv.get_coherent_tile_points(
        res, qr, cache_resolution=0.01)
    M = take_idx.shape[0]
    rng = np.random.default_rng(0)
    pts_r = jnp.asarray(rng.uniform(-0.25, 0.25, (M, 3)), dtype=jnp.float32)

    results = {}

    def row(name, fn, *fargs, n=M):
        t = device_time(fn, *fargs, reps=args.reps)
        results[name] = {"ms": round(t * 1e3, 2),
                         "mqps": round(n / t / 1e6, 1)}
        log(f"{name:24s}: {t * 1e3:8.2f} ms -> {n / t / 1e6:7.1f}M q/s")

    # generic per-point path, random points: nearest vs trilinear
    aux_n = nearest.raw_query_aux()
    aux_t = trilin.raw_query_aux()
    row("nearest_generic",
        lambda p, a: sum(x.sum() for x in nearest.raw_query_with(a, p)),
        pts_r, aux_n)
    row("trilinear_generic",
        lambda p, a: sum(x.sum() for x in trilin.raw_query_with(a, p)),
        pts_r, aux_t)

    # coherent tiled sweeps through single-child compositions: nearest
    # (4-channel 4x4x4 bricks) and trilinear (4-channel 5x5x5 bricks,
    # _coherent_single_trilinear_lookup — new in r4)
    from pytorch_volumetric_tpu.sdf import (coherent_fast_tables,
                                            compose_query_coherent)
    for label, child in (("nearest_coherent", nearest),
                         ("trilinear_coherent", trilin)):
        comp = pv.ComposedSDF([child],
                              pv.Transform3d(matrix=jnp.eye(4)[None]))
        ft = coherent_fast_tables(comp.sdfs)
        m = comp.obj_frame_to_link_frame.get_matrix()
        m_inv = comp.link_frame_to_obj_frame
        ch = tuple(comp.sdfs)
        # divide by the REAL grid point count M, not the tile-padded count,
        # matching bench.py/northstar.py's throughput convention
        row(label,
            lambda p, f, ch=ch, m=m, m_inv=m_inv: sum(
                x.sum() for x in compose_query_coherent(
                    ch, m, m_inv, 1, p, fast_tables=f, seg=seg)),
            pts_c, ft, n=M)

    print(json.dumps({
        "metric": "trilinear_vs_nearest",
        "value": results["trilinear_generic"]["mqps"],
        "unit": f"M q/s trilinear generic ({M} pts, drill cache res 0.01)",
        "extra": results,
    }), flush=True)


if __name__ == "__main__":
    main()
