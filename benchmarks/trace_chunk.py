"""Capture an XLA profiler trace of ONE north-star chunk forward through the
real ``compose_query_coherent`` path (whatever engine it currently routes
to), for per-op attribution via ``scripts/parse_xplane.py``.

Usage: python benchmarks/trace_chunk.py OUTDIR [--chunk 25] [--points-side 100]
       [--bwd] [--values-only]
"""

import argparse
import os
import sys
import time

import numpy as np

BENCH_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench_cache")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--chunk", type=int, default=25)
    ap.add_argument("--points-side", type=int, default=100)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--bwd", action="store_true")
    ap.add_argument("--values-only", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(BENCH_DIR, "xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    import pytorch_volumetric_tpu as pv
    from pytorch_volumetric_tpu.sdf import (coherent_fast_tables,
                                            compose_query_coherent)
    from pytorch_volumetric_tpu.utils import profiling
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

    side = args.points_side
    qr = np.array([[-0.8, -0.8 + 0.01 * (side - 1)]] * 3)
    pts, take, seg = pv.get_coherent_tile_points(0.01, qr,
                                                 cache_resolution=0.02)
    B = args.chunk
    rng = np.random.default_rng(0)
    th0 = np.array([0.0, -np.pi / 4, 0.0, np.pi / 2, 0.0, np.pi / 4, 0.0],
                   dtype=np.float32)
    th = jnp.asarray(th0 + rng.normal(0, 0.1, (B, 7)), dtype=jnp.float32)
    children = tuple(robot.sdf.sdfs)
    ft = coherent_fast_tables(children)
    M = pts.shape[0]
    log(f"chunk B={B}, padded points {M} (seg={seg})")

    def fwd(q, p, f):
        m, m_inv = robot._link_transforms(q)
        out = compose_query_coherent(children, m, m_inv, q.shape[0], p,
                                     fast_tables=f, seg=seg,
                                     values_only=args.values_only)
        if args.values_only:
            return out.sum()
        v, g = out
        return v.sum() + g.sum()

    if args.bwd:
        run = jax.jit(lambda q, p, f: jax.grad(
            lambda qq: fwd(qq, p, f))(q).sum())
    else:
        run = jax.jit(fwd)
    t0 = time.perf_counter()
    float(run(th, pts, ft))
    log(f"compile+first: {time.perf_counter() - t0:.1f}s")
    # timed number via the bench.py chained-scan pattern: tables stay jit
    # ARGUMENTS (a closure would serialize GBs of bricks into the axon
    # remote-compile request — observed HTTP 413)
    reps = 5

    @jax.jit
    def timed(q, p, f):
        def body(c, i):
            if args.bwd:
                term = jax.grad(lambda qq: fwd(qq, p, f))(q + 1e-6 * i).sum()
            else:
                term = fwd(q + 1e-6 * i, p, f)
            return c + term, None
        out, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(reps, dtype=jnp.float32))
        return out

    float(timed(th, pts, ft))
    t0 = time.perf_counter()
    float(timed(th, pts, ft))
    dt = (time.perf_counter() - t0) / reps
    log(f"timed: {dt * 1e3:.1f} ms -> {B * M / dt / 1e6:.1f}M q/s")

    os.makedirs(args.outdir, exist_ok=True)
    with profiling.trace(args.outdir):
        for _ in range(args.reps):
            float(run(th, pts, ft))
    log(f"trace written to {args.outdir}")


if __name__ == "__main__":
    main()
