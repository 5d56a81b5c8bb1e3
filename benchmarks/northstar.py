"""North-star workload: 200 configurations x 1,000,000 points per step.

BASELINE.md's target scale (7-DOF robot, cached links, values + gradients).
1.6e9 link-point lookups per forward pass do not fit HBM in one shot
(the [links, configs, points, 3] transformed-point tensor alone would be
19 GB), so the step chunks the configuration axis with ``lax.map`` inside a
single jitted program: sequential on device, one dispatch, peak memory
bounded by one chunk.

Prints one JSON line with forward and forward+backward throughput.

Usage: python benchmarks/northstar.py [--configs 200] [--points-side 100]
       [--chunk 10]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

BENCH_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "bench_cache")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", type=int, default=200)
    ap.add_argument("--points-side", type=int, default=100,
                    help="query grid is side^3 points")
    ap.add_argument("--chunk", type=int, default=25,
                    help="starting configurations per lax.map chunk (25 was "
                         "the 16 GB v5e sweet spot on the value-only brick "
                         "layout; on OOM the script automatically retries "
                         "with the next smaller divisor of --configs)")
    ap.add_argument("--robot", choices=["arm", "drill", "mesh_arm"],
                    default="arm",
                    help="'arm': procedural 7-DOF capsule arm (8 links); "
                         "'drill': the reference's 15,728-face YcbPowerDrill "
                         "mesh as a free-6DOF object (mesh-real geometry); "
                         "'mesh_arm': 8-link serial arm whose links are the "
                         "reference's probe/wrench meshes (bench.py's "
                         "mesh-real multi-link row at north-star scale)")
    ap.add_argument("--interp", choices=["nearest", "trilinear"],
                    default="nearest",
                    help="link-cache interpolation; 'trilinear' exercises "
                         "the single-child 5x5x5-brick smooth-field path "
                         "(drill robot only — multi-child trilinear takes "
                         "the generic sub-path)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    # the chunked 8-link program takes minutes to compile; persist it
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(BENCH_DIR, "xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    import pytorch_volumetric_tpu as pv
    from pytorch_volumetric_tpu.sdf import (coherent_fast_tables,
                                            compose_query_coherent)
    from pytorch_volumetric_tpu.utils.robots import make_serial_arm

    log(f"devices: {jax.devices()}")
    os.makedirs(BENCH_DIR, exist_ok=True)
    if args.robot == "drill":
        from pytorch_volumetric_tpu.utils.robots import make_free_object_urdf
        drill_obj = ("/root/reference/tests/YcbPowerDrill/"
                     "textured_simple_reoriented.obj")
        d = os.path.join(BENCH_DIR, "drill")
        urdf_path, end_link = make_free_object_urdf(d, drill_obj,
                                                    object_name="drill")
        cache = os.path.join(BENCH_DIR, "sdf_cache_drill.npz")
        n_dof = 6
    elif args.robot == "mesh_arm":
        from pytorch_volumetric_tpu.utils.robots import make_mesh_arm
        srcs = ["/root/reference/tests/probe.obj",
                "/root/reference/tests/offset_wrench_nogrip.obj"]
        d = os.path.join(BENCH_DIR, "mesh_arm")
        urdf_path, end_link = make_mesh_arm(d, srcs, num_joints=7)
        cache = os.path.join(BENCH_DIR, "sdf_cache_mesh_arm.npz")
        n_dof = 7
    else:
        arm_dir = os.path.join(BENCH_DIR, "arm")
        urdf_path, end_link = make_serial_arm(arm_dir, num_joints=7)
        d, cache, n_dof = arm_dir, os.path.join(BENCH_DIR, "sdf_cache.npz"), 7
    chain = pv.build_serial_chain_from_urdf(open(urdf_path).read(), end_link)
    robot = pv.RobotSDF(
        chain, path_prefix=d,
        link_sdf_cls=pv.cache_link_sdf_factory(
            resolution=0.02, padding=1.0, cache_path=cache,
            interpolation=args.interp))
    log("robot + link caches ready")

    side = args.points_side
    lo, res = -0.5, 0.01
    query_range = np.array([[lo, lo + res * (side - 1)]] * 3)
    # 3D sweep at the 2x ratio -> (3, 3, 3) tiles: 27 points per brick
    # gather instead of 4 (6.75x fewer rows on the issue-rate-bound path)
    pts, take_idx, seg = pv.get_coherent_tile_points(res, query_range,
                                                     cache_resolution=0.02)
    M = take_idx.shape[0]
    log(f"coherent tiles: seg={seg}, padded points {pts.shape[0]} (M={M})")
    N = args.configs
    rng = np.random.default_rng(0)
    th = jnp.asarray(rng.normal(0, 0.3, (N, n_dof)).astype(np.float32))
    children = tuple(robot.sdf.sdfs)
    # brick tables as jit arguments (captured constants at this scale cost
    # minutes of compile)
    ft = coherent_fast_tables(children)

    def build_fns(C):
        """Jit the three step variants at configuration-chunk size ``C``."""

        def chunk_loss(q_chunk, p, ft):
            m, m_inv = robot._link_transforms(q_chunk)
            v, g = compose_query_coherent(children, m, m_inv, C, p,
                                          fast_tables=ft, seg=seg)
            return v.sum() + g.sum()

        @jax.jit
        def forward(q, p, ft):
            losses = jax.lax.map(lambda qc: chunk_loss(qc, p, ft),
                                 q.reshape(N // C, C, -1))
            return losses.sum()

        @jax.jit
        def forward_backward(q, p, ft):
            def per_chunk(qc):
                l, gq = jax.value_and_grad(lambda x: chunk_loss(x, p, ft))(qc)
                return l + gq.sum()
            return jax.lax.map(per_chunk, q.reshape(N // C, C, -1)).sum()

        @jax.jit
        def values_only(q, p, ft):
            def per_chunk(qc):
                m, m_inv = robot._link_transforms(qc)
                return compose_query_coherent(children, m, m_inv, C, p,
                                              fast_tables=ft, seg=seg,
                                              values_only=True).sum()
            return jax.lax.map(per_chunk, q.reshape(N // C, C, -1)).sum()

        return (("forward", forward), ("forward_backward", forward_backward),
                ("values_only", values_only))

    def is_oom(e):
        s = str(e)
        return ("RESOURCE_EXHAUSTED" in s or "Out of memory" in s
                or "out of memory" in s or "OOM" in s)

    # HBM-adaptive chunking: --chunk is a starting point, not a hard promise.
    # If a chunk OOMs (the 4-channel value+grad bricks are 4x the round-1
    # layout), fall back to the next-smaller divisor of N and retry rather
    # than dying and losing the artifact.
    def chunk_candidates(start):
        c = min(start, N)
        while c >= 1:
            while N % c != 0:
                c -= 1
            yield c
            c //= 2

    results, chunk_used = None, None
    for C in chunk_candidates(args.chunk):
        try:
            results = {}
            for name, fn in build_fns(C):
                t0 = time.perf_counter()
                float(fn(th, pts, ft))  # compile + run
                log(f"{name} (chunk={C}) compile+first run: "
                    f"{time.perf_counter() - t0:.1f}s")
                t0 = time.perf_counter()
                acc = float(fn(th, pts, ft))
                dt = time.perf_counter() - t0
                results[name] = dt
                log(f"{name}: {dt*1e3:.0f} ms for {N}x{M} -> "
                    f"{N * M / dt / 1e6:.1f}M queries/s (acc={acc:.3e})")
            chunk_used = C
            break
        except Exception as e:  # noqa: BLE001 - retry only on device OOM
            if not is_oom(e) or C == 1:
                raise
            log(f"chunk={C} OOMed ({str(e)[:160]}); halving")

    # keep the historical bare key for the default arm workload; only the
    # new mesh-real/trilinear modes get suffixes
    metric = ("northstar_200x1e6" if args.robot == "arm"
              else f"northstar_200x1e6_{args.robot}")
    if args.interp != "nearest":
        metric += f"_{args.interp}"
    print(json.dumps({
        "metric": metric,
        "value": round(N * M / results["forward"], 1),
        "unit": f"config-point queries/s ({N} configs x {M} pts, fwd)",
        "extra": {
            "forward_ms": round(results["forward"] * 1e3, 1),
            "forward_backward_ms": round(results["forward_backward"] * 1e3, 1),
            "values_only_ms": round(results["values_only"] * 1e3, 1),
            "chunk": chunk_used,
        },
    }))


if __name__ == "__main__":
    main()
