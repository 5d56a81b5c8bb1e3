"""Multi-device scaling benchmark: robot-SDF query throughput vs mesh size.

The reference is single-device only; the TPU build's north star includes
multi-chip scaling efficiency of queries/s (BASELINE.md).  The query batch
axes (configurations x points) are embarrassingly parallel, so the forward
pass needs no collectives and should scale linearly; this harness measures
that on whatever devices are attached (run under
``XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu`` for
a virtual 8-device mesh, or on a real multi-chip slice).

Prints one JSON line per mesh size plus a final efficiency summary.

Usage: python benchmarks/scaling.py [--configs 64] [--points 16384]
"""

import argparse
import json
import os
import sys
import tempfile

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", type=int, default=64)
    ap.add_argument("--points", type=int, default=16384)
    ap.add_argument("--resolution", type=float, default=0.02,
                    help="link cache voxel resolution")
    ap.add_argument("--cpu", action="store_true",
                    help="force an 8-device virtual CPU mesh")
    args = ap.parse_args()

    if args.cpu:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    import pytorch_volumetric_tpu as pv
    import pytorch_volumetric_tpu.parallel as par
    from pytorch_volumetric_tpu.utils.profiling import device_time
    from pytorch_volumetric_tpu.utils.robots import make_serial_arm

    devices = jax.devices()
    log(f"devices: {len(devices)} x {devices[0].platform}")
    if devices[0].platform == "cpu":
        log("NOTE: virtual CPU devices share one physical CPU — this run "
            "validates the sharded program, not real scaling; efficiency "
            "numbers are only meaningful on a real multi-chip slice")

    d = tempfile.mkdtemp(prefix="pvt_scaling_")
    urdf_path, end_link = make_serial_arm(d, num_joints=7)
    chain = pv.build_serial_chain_from_urdf(open(urdf_path).read(), end_link)
    robot = pv.RobotSDF(
        chain, path_prefix=d,
        link_sdf_cls=pv.cache_link_sdf_factory(
            resolution=args.resolution, padding=1.0,
            cache_path=os.path.join(d, "cache.npz")))
    log("robot ready")

    rng = np.random.default_rng(0)
    A, Ppts = args.configs, args.points
    q = jnp.asarray(rng.uniform(-1, 1, (A, 7)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-0.8, 0.8, (Ppts, 3)).astype(np.float32))

    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devices)]
    results = {}
    for n in sizes:
        mesh = par.make_device_mesh(n_config=n, n_point=1, devices=devices[:n])
        qfn = par.sharded_robot_query(robot, mesh)
        dt = device_time(lambda qq, pp: qfn(qq, pp)[0], q, pts, reps=5)
        qps = A * Ppts / dt
        results[n] = qps
        eff = qps / (results[1] * n) if 1 in results else 1.0
        print(json.dumps({"metric": "scaling_qps", "devices": n,
                          "value": round(qps, 1), "unit": "queries/s",
                          "efficiency_vs_linear": round(eff, 3)}), flush=True)
    if len(results) > 1:
        n_max = max(results)
        summary = {
            "metric": "scaling_efficiency",
            "value": round(results[n_max] / (results[1] * n_max), 3),
            "unit": f"fraction of linear at {n_max} devices",
        }
        if jax.default_backend() == "cpu":
            # the virtual mesh's "devices" time-share ONE CPU's cores, so
            # wall-clock cannot improve with device count: this harness run
            # validates CORRECTNESS under sharding only.  The scaling
            # property itself is proven statically by the compiled-HLO
            # collective audit (zero cross-device collectives in the
            # forward — scripts/hlo_audit.py, tests/test_parallel.py).
            summary["note"] = (
                "virtual CPU mesh shares one CPU's cores: efficiency here "
                "is meaningless; see hlo_collective_audit for the scaling "
                "evidence")
        print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
