"""Neural (config-space) robot SDF query throughput vs the exact path.

The exact cached path is pinned at the TPU gather issue rate (~3 rows per
link-point; see ARCHITECTURE.md).  The distilled ``ConfigSpaceNeuralSDF``
replaces all gathers with 3-4 MXU matmuls per point, so its query cost is
compute-bound and independent of link count, triangle count, and voxel
resolution — this benchmark quantifies the gap on the headline workload
(200 configs x 15,251 grid points, the reference README.md:195-201 shape).

The model is approximate (distillation residual, tightest in the near-surface
shell where collision queries live); the exact path remains the oracle.

Usage: python benchmarks/neural.py [--steps 4000] [--bf16]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
BENCH_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "bench_cache")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--configs", type=int, default=256,
                    help="training configurations sampled from the oracle "
                         "(config-space coverage is the usual accuracy limiter)")
    ap.add_argument("--pts", type=int, default=2048)
    ap.add_argument("--act", default="sine", choices=["sine", "relu"],
                    help="hidden activation: relu trades a little gradient "
                         "smoothness for ~4x query speed (no transcendentals)")
    ap.add_argument("--bf16", action="store_true",
                    help="bfloat16 matmuls (f32 accumulation)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(BENCH_DIR, "xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    import pytorch_volumetric_tpu as pv
    from pytorch_volumetric_tpu.models import fit_config_space_sdf
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

    compute_dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    t0 = time.perf_counter()
    model, losses = fit_config_space_sdf(
        robot, key=0, width=args.width, depth=args.depth, fourier=96,
        n_configs=args.configs, pts_per_config=args.pts, steps=args.steps,
        batch=8192, lr=1e-3, compute_dtype=compute_dtype,
        activation=args.act)
    l = np.asarray(losses)
    qtr = [round(float(l[max(0, i * len(l) // 4 - 25):
                         i * len(l) // 4 + 25].mean()), 4) for i in range(1, 4)]
    log(f"fit: {time.perf_counter() - t0:.1f}s, "
        f"loss {float(l[:50].mean()):.4f} -> {float(l[-50:].mean()):.4f} "
        f"(quarters {qtr})")

    # accuracy vs the exact oracle on fresh configs/points
    rng = np.random.default_rng(1)
    lims = robot.chain.get_joint_limits()
    qs_test = jnp.asarray(rng.uniform(lims[:, 0], lims[:, 1], (8, 7)),
                          dtype=jnp.float32)
    pts_test = jnp.asarray(rng.uniform(-0.8, 0.8, (4096, 3)), dtype=jnp.float32)
    robot.set_joint_configuration(qs_test)
    v_gt, _ = robot(pts_test)
    v_est, _ = model.set_joint_configuration(qs_test)(pts_test)
    err = np.asarray(v_est - v_gt)
    shell = np.abs(np.asarray(v_gt)) < 0.1
    log(f"rmse: overall {np.sqrt((err ** 2).mean()):.4f}, "
        f"near-surface shell {np.sqrt((err[shell] ** 2).mean()):.4f}")

    # headline-shaped workload
    N, M = 200, 15251
    qs = jnp.asarray(rng.uniform(lims[:, 0], lims[:, 1], (N, 7)),
                     dtype=jnp.float32)
    pts = jnp.asarray(rng.uniform(-1.0, 1.0, (M, 3)), dtype=jnp.float32)

    t = device_time(lambda q, p: model.query(q, p)[0], qs, pts, reps=10)
    log(f"neural value+grad: {t * 1e3:.2f} ms for {N}x{M} "
        f"-> {N * M / t / 1e6:.1f}M q/s")
    tv = device_time(lambda q, p: jax.vmap(
        lambda qi: model.value(qi, p))(q), qs, pts, reps=10)
    log(f"neural value-only: {tv * 1e3:.2f} ms -> {N * M / tv / 1e6:.1f}M q/s")
    log(f"(exact cached coherent path on this workload: see bench.py; "
        f"dtype={'bf16' if args.bf16 else 'f32'}, width={args.width}, "
        f"depth={args.depth}, act={args.act})")

    # one machine-readable line on STDOUT, like every other benchmark here
    # (bench.py / northstar.py / bigmesh.py / scaling.py) — VERDICT r3 item 3
    print(json.dumps({
        "metric": "neural_robot_sdf_query_throughput",
        "value": round(N * M / t, 1),
        "unit": f"config-point queries/s value+grad ({N} configs x {M} pts)",
        "extra": {
            "value_grad_ms": round(t * 1e3, 2),
            "value_only_ms": round(tv * 1e3, 2),
            "value_only_qps_M": round(N * M / tv / 1e6, 1),
            "rmse_overall": round(float(np.sqrt((err ** 2).mean())), 4),
            "rmse_shell": round(float(np.sqrt((err[shell] ** 2).mean())), 4),
            "act": args.act, "width": args.width, "depth": args.depth,
            "steps": args.steps,
            "dtype": "bf16" if args.bf16 else "f32",
        },
    }), flush=True)


if __name__ == "__main__":
    main()
