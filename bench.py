"""Headline benchmark: robot-SDF batched query throughput.

Reproduces the reference's README measurement (reference README.md:195-201,
produced by tests/test_model_to_sdf.py:200-204): a 7-DOF serial arm (8 links)
with cached link SDFs, N configurations x M=15,251 grid points (x in
[-1, 0.5], y = 0.02 slice, z in [-0.2, 0.8], 0.01 resolution).

Baseline to beat: RTX 2080 Ti, N=200 -> 128.65 ms total = 23.7M config-point
queries/s (BASELINE.md).  Prints ONE JSON line.

Run on whatever accelerator jax selects (the driver runs this on one real TPU
chip).  First run builds the link voxel caches into ``bench_cache/`` (kept
across runs).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

BENCH_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_cache")
BASELINE_QPS = 200 * 15251 / 0.12865  # reference README 200-config number
METRIC = "robot_sdf_query_throughput"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def probe_backend(budget_s=900):
    """Probe backend readiness in a *subprocess* before touching jax here.

    The tunneled TPU backend, when down, hangs in-process backend init for
    ~30 min and then leaves the process in an unrecoverable state (observed
    2026-08-17: 8+ h outage -> rc=124, no output).  A short subprocess probe
    (CLAUDE.md: ``timeout 280 python -c "import jax; jax.devices()"``) tells
    us cheaply whether init will succeed.  Returns (platform, attempts) on
    success or (None, attempts) once ``budget_s`` is exhausted.
    """
    deadline = time.time() + budget_s
    attempts = 0
    while True:
        attempts += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.devices()[0].platform)"],
                capture_output=True, text=True, timeout=280)
            if r.returncode == 0:
                return r.stdout.strip(), attempts
            err = (r.stderr or "").strip().splitlines()
            log(f"probe {attempts}: backend init failed "
                f"({err[-1][:160] if err else 'no stderr'})")
        except subprocess.TimeoutExpired:
            log(f"probe {attempts}: timed out after 280 s")
        if time.time() + 60 > deadline:
            return None, attempts
        time.sleep(60)


def time_median(fn, *args, reps=10, samples=3):
    """Median-of-``samples`` per-rep seconds for one chained-scan call.

    Each sample is one timed dispatch of a ``reps``-iteration on-device scan
    (see the methodology note in :func:`main`).  A single sample is NOT
    robust on the tunneled TPU: one host/tunnel hiccup poisons the round's
    official record (BENCH_r04 shipped a 100x outlier on the drill
    fwd+bwd row — 3.1M q/s vs the same-day re-run's 402M).  Returns
    ``(median_s, min_s, max_s)``; callers flag rows whose max/min spread
    exceeds 2x."""
    ts = []
    for _ in range(samples):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append((time.perf_counter() - t0) / reps)
    ts.sort()
    return ts[len(ts) // 2], ts[0], ts[-1]


def spread_extra(extra, key, med, lo, hi):
    """Record a row's min/median/max spread; flag >2x outlier spreads."""
    extra[f"{key}_ms_spread"] = [round(lo * 1e3, 3), round(med * 1e3, 3),
                                 round(hi * 1e3, 3)]
    if hi > 2 * lo:
        extra[f"{key}_spread_outlier"] = True


def main():
    # never lose the artifact to an outage: if the backend cannot initialize
    # within the probe budget, emit an explicit machine-readable JSON line
    # instead of dying with no output.
    if not os.environ.get("PVT_BENCH_SKIP_PROBE"):
        platform, attempts = probe_backend(
            budget_s=int(os.environ.get("PVT_BENCH_PROBE_BUDGET", "900")))
        if platform is None:
            print(json.dumps({
                "metric": METRIC, "value": 0.0,
                "unit": "config-point queries/s (200 configs x 15251 pts, 8 cached links)",
                "vs_baseline": 0.0, "error": "tpu_unavailable",
                "extra": {"probe_attempts": attempts}}))
            return
        log(f"probe ok: backend platform={platform} after {attempts} attempt(s)")

    import jax
    import jax.numpy as jnp

    # persist compiled programs across driver runs (compiles dominate the
    # wall time of a cold run on the tunneled TPU)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(BENCH_DIR, "xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    import pytorch_volumetric_tpu as pv
    from pytorch_volumetric_tpu.utils.robots import make_serial_arm

    try:
        devices = jax.devices()
    except RuntimeError as e:
        # the tunnel dropped between the probe and this init (or the probe
        # was skipped): still emit a machine-readable artifact, never die
        # with no output
        print(json.dumps({
            "metric": METRIC, "value": 0.0,
            "unit": "config-point queries/s (200 configs x 15251 pts, 8 cached links)",
            "vs_baseline": 0.0, "error": "tpu_unavailable",
            "extra": {"init_error": str(e)[:200]}}))
        return
    log(f"devices: {devices}")
    os.makedirs(BENCH_DIR, exist_ok=True)
    arm_dir = os.path.join(BENCH_DIR, "arm")
    urdf_path, end_link = make_serial_arm(arm_dir, num_joints=7)
    chain = pv.build_serial_chain_from_urdf(open(urdf_path).read(), end_link)

    t0 = time.perf_counter()
    robot = pv.RobotSDF(
        chain, path_prefix=arm_dir,
        link_sdf_cls=pv.cache_link_sdf_factory(
            resolution=0.02, padding=1.0,
            cache_path=os.path.join(BENCH_DIR, "sdf_cache.npz")))
    log(f"robot + link caches ready in {time.perf_counter() - t0:.1f}s")

    # reference query grid: 151 x 1 x 101 = 15,251 points.  The grid sweep is
    # spatially coherent, so the tiled brick-gather fast path applies
    # (query resolution 0.01 <= cache resolution 0.02 / 2 -> (4, 3) tiles,
    # 12 points per brick gather); M counts only the useful (unpadded)
    # queries.
    query_range = np.array([[-1.0, 0.5], [0.02, 0.02], [-0.2, 0.8]])
    pts, take_idx, seg = pv.get_coherent_tile_points(0.01, query_range,
                                                     cache_resolution=0.02)
    M = take_idx.shape[0]
    log(f"coherent tiles: seg={seg}, padded points {pts.shape[0]} (M={M})")

    # PVT_BENCH_N: dry-run knob (CPU smoke of the full script before burning
    # a TPU window); the driver's real runs use the default 200
    N = int(os.environ.get("PVT_BENCH_N", "200"))
    rng = np.random.default_rng(0)
    th0 = np.array([0.0, -np.pi / 4, 0.0, np.pi / 2, 0.0, np.pi / 4, 0.0],
                   dtype=np.float32)
    th = jnp.asarray(np.concatenate([th0[None],
                                     th0 + rng.normal(0, 0.1, (N - 1, 7))]),
                     dtype=jnp.float32)

    # Timing methodology: the tunneled TPU has a ~33 ms dispatch+fetch floor
    # and block_until_ready does not reliably wait, so we chain `reps`
    # iterations on device inside one jitted scan (perturbing q each step to
    # prevent CSE) and pay a single dispatch + scalar fetch.
    from pytorch_volumetric_tpu.sdf import (coherent_fast_tables,
                                            compose_query_coherent)
    children = tuple(robot.sdf.sdfs)
    # brick tables ride into the jit as ARGUMENTS: captured constants at
    # this scale (8 links x 8x value grids) cost minutes of extra compile
    ft = coherent_fast_tables(children)

    def query_sum(q, pts, ft):
        m, m_inv = robot._link_transforms(q)
        v, g = compose_query_coherent(children, m, m_inv, q.shape[0], pts,
                                      fast_tables=ft, seg=seg)
        return v.sum() + g.sum()

    # the tile proof covers any rigid transform, but spot-check the actual
    # bench configurations anyway (8-config subset: the full batch would
    # fetch ~300 MB of transformed points over the slow tunnel): a contract
    # break would corrupt the measurement silently
    robot.set_joint_configuration(th[:8])
    assert robot.sdf.check_coherent_contract(pts, seg=seg)

    reps = 10

    def chained(fn):
        @jax.jit
        def run(q, pts, ft):
            def body(c, i):
                return c + fn(q + 1e-6 * i, pts, ft), None
            out, _ = jax.lax.scan(body, jnp.float32(0),
                                  jnp.arange(reps, dtype=jnp.float32))
            return out

        return run

    chained.reps = reps  # single source of truth for helpers (bench_real_mesh)
    fwd = chained(query_sum)
    float(fwd(th, pts, ft))  # compile
    fwd_s, fwd_lo, fwd_hi = time_median(fwd, th, pts, ft, reps=reps)
    qps = N * M / fwd_s
    log(f"forward: {fwd_s * 1e3:.2f} ms (min {fwd_lo * 1e3:.2f} / max "
        f"{fwd_hi * 1e3:.2f}) for {N}x{M} -> {qps / 1e6:.1f}M queries/s")

    # forward + backward w.r.t. joint configuration
    bwd = chained(lambda q, p, f: jax.grad(
        lambda qq: query_sum(qq, p, f))(q).sum())
    float(bwd(th, pts, ft))
    bwd_s, bwd_lo, bwd_hi = time_median(bwd, th, pts, ft, reps=reps)
    log(f"forward+backward: {bwd_s * 1e3:.2f} ms -> {N * M / bwd_s / 1e6:.1f}M queries/s")

    # the reference's other headline row: N=20 configs (README.md:195-200,
    # 37.69 ms on the 2080 Ti)
    if N >= 20:
        th20 = th[:20]
        float(fwd(th20, pts, ft))
        fwd20_s, fwd20_lo, fwd20_hi = time_median(fwd, th20, pts, ft,
                                                  reps=reps)
        log(f"forward N=20: {fwd20_s * 1e3:.2f} ms "
            f"(reference 37.69 ms) -> {20 * M / fwd20_s / 1e6:.1f}M queries/s")
    else:  # PVT_BENCH_N dry runs below 20 configs skip the N=20 row
        fwd20_s = float("nan")

    headline = {
        "metric": METRIC,
        "value": round(qps, 1),
        "unit": "config-point queries/s (200 configs x 15251 pts, 8 cached links)",
        "vs_baseline": round(qps / BASELINE_QPS, 3),
        "extra": {
            "forward_ms": round(fwd_s * 1e3, 3),
            "forward_backward_ms": round(bwd_s * 1e3, 3),
            "baseline_qps": round(BASELINE_QPS, 1),
            "n_configs": N,
        },
    }
    spread_extra(headline["extra"], "forward", fwd_s, fwd_lo, fwd_hi)
    spread_extra(headline["extra"], "forward_backward", bwd_s, bwd_lo, bwd_hi)
    if N >= 20:  # NaN is not valid JSON; omit the row on tiny dry runs
        headline["extra"]["forward_ms_20_configs"] = round(fwd20_s * 1e3, 3)
        headline["extra"]["vs_baseline_20_configs"] = round(0.03769 / fwd20_s,
                                                            3)
        spread_extra(headline["extra"], "forward_20_configs",
                     fwd20_s, fwd20_lo, fwd20_hi)
    # print the headline the moment it exists: if the process is killed
    # anywhere in the optional mesh-real section below, the artifact is
    # already on stdout.  A second, superset JSON line follows on success
    # (a parser taking either the first or the last line gets a valid row).
    print(json.dumps(headline), flush=True)

    # the mesh-real rows are additive: never lose the headline JSON to a
    # failure (or slow cold build) in these optional sections, and reprint
    # the accumulated JSON after each so a kill between sections keeps
    # everything measured so far.  PVT_BENCH_SECTIONS="real_mesh,tight"
    # selects a subset (dry runs / targeted re-measures).
    sections = (bench_real_mesh, bench_mesh_arm, bench_tight)
    want = os.environ.get("PVT_BENCH_SECTIONS")
    if want is not None:
        names = {s.strip() for s in want.split(",") if s.strip()}
        sections = tuple(s for s in sections
                         if s.__name__.removeprefix("bench_") in names)
    for section in sections:
        try:
            extra = section(jax, jnp, pv, chained, N, log)
        except Exception as e:  # noqa: BLE001 - diagnostic row instead of death
            log(f"{section.__name__} failed: {e!r}")
            extra = {f"{section.__name__}_error": repr(e)[:200]}
        if extra:
            headline["extra"].update(extra)
            print(json.dumps(headline), flush=True)


def bench_real_mesh(jax, jnp, pv, chained, N, log):
    """Mesh-real geometry rows: the YcbPowerDrill 15,728-face visual mesh as
    (a) a free-6DOF robot with a cached link (res 0.02 / pad 1.0, matching the
    reference benchmark setup at tests/test_model_to_sdf.py:182) and (b) a
    direct exact `MeshSDF` sweep, which on TPU runs the Pallas triangle
    kernel.  Skipped (empty dict) if the reference assets are absent."""
    import numpy as np
    from pytorch_volumetric_tpu.sdf import (coherent_fast_tables,
                                            compose_query_coherent)
    from pytorch_volumetric_tpu.utils.robots import make_free_object_urdf
    from pytorch_volumetric_tpu.utils.profiling import device_time

    drill_obj = "/root/reference/tests/YcbPowerDrill/textured_simple_reoriented.obj"
    if not os.path.exists(drill_obj):
        return {}
    extra = {}

    # (a) free-object drill robot on the coherent cached path
    d = os.path.join(BENCH_DIR, "drill")
    urdf_path, obj_name = make_free_object_urdf(d, drill_obj,
                                                object_name="drill")
    chain = pv.build_serial_chain_from_urdf(open(urdf_path).read(), obj_name)
    t0 = time.perf_counter()
    robot = pv.RobotSDF(
        chain, path_prefix=d,
        link_sdf_cls=pv.cache_link_sdf_factory(
            resolution=0.02, padding=1.0,
            cache_path=os.path.join(BENCH_DIR, "sdf_cache_drill.npz")))
    log(f"drill robot cache ready in {time.perf_counter() - t0:.1f}s")

    query_range = np.array([[-0.75, 0.75], [0.02, 0.02], [-0.5, 0.5]])
    pts, take_idx, seg = pv.get_coherent_tile_points(0.01, query_range,
                                                     cache_resolution=0.02)
    M = take_idx.shape[0]
    rng = np.random.default_rng(1)
    th = jnp.asarray(np.concatenate(
        [np.zeros((1, 6)),
         rng.uniform(-0.2, 0.2, (N - 1, 6))]).astype(np.float32))

    children = tuple(robot.sdf.sdfs)
    ft = coherent_fast_tables(children)
    robot.set_joint_configuration(th[:8])  # spot-check subset (see headline)
    assert robot.sdf.check_coherent_contract(pts, seg=seg)

    def query_sum(q, p, f):
        m, m_inv = robot._link_transforms(q)
        v, g = compose_query_coherent(children, m, m_inv, q.shape[0], p,
                                      fast_tables=f, seg=seg)
        return v.sum() + g.sum()

    reps = chained.reps  # the scan count baked into chained's closure
    fwd = chained(query_sum)
    float(fwd(th, pts, ft))
    fwd_s, fwd_lo, fwd_hi = time_median(fwd, th, pts, ft, reps=reps)
    log(f"drill forward: {fwd_s * 1e3:.2f} ms for {N}x{M} -> "
        f"{N * M / fwd_s / 1e6:.1f}M queries/s")

    bwd = chained(lambda q, p, f: jax.grad(
        lambda qq: query_sum(qq, p, f))(q).sum())
    float(bwd(th, pts, ft))
    bwd_s, bwd_lo, bwd_hi = time_median(bwd, th, pts, ft, reps=reps)
    log(f"drill forward+backward: {bwd_s * 1e3:.2f} ms -> "
        f"{N * M / bwd_s / 1e6:.1f}M queries/s")
    extra["drill_robot_forward_qps_M"] = round(N * M / fwd_s / 1e6, 1)
    extra["drill_robot_forward_backward_qps_M"] = round(N * M / bwd_s / 1e6, 1)
    spread_extra(extra, "drill_forward", fwd_s, fwd_lo, fwd_hi)
    spread_extra(extra, "drill_forward_backward", bwd_s, bwd_lo, bwd_hi)

    # (b) exact MeshSDF sweep over the raw 15,728-face mesh (Pallas on TPU)
    mesh_sdf = pv.MeshSDF(pv.MeshObjectFactory(drill_obj))
    P = 131072
    qpts = jnp.asarray(rng.uniform(-0.2, 0.2, (P, 3)).astype(np.float32))
    dts = sorted(device_time(lambda p: mesh_sdf.raw_query(p)[0], qpts, reps=3)
                 for _ in range(3))
    dt = dts[1]  # median of 3 device-timed samples (see time_median)
    nf = mesh_sdf.obj_factory._mesh.faces.shape[0]
    log(f"exact MeshSDF ({nf} faces, backend={jax.default_backend()}): "
        f"{dt * 1e3:.2f} ms for {P} pts -> {P / dt / 1e6:.2f}M q/s, "
        f"{P * nf / dt / 1e9:.0f}G point-tri/s")
    extra["pallas_mesh_sdf_qps_M"] = round(P / dt / 1e6, 2)
    extra["pallas_mesh_sdf_faces"] = int(nf)
    extra["pallas_mesh_sdf_gpointtri_s"] = round(P * nf / dt / 1e9, 1)
    return extra


def bench_mesh_arm(jax, jnp, pv, chained, N, log):
    """Mesh-real MULTI-LINK row: an 8-link serial arm whose links are the
    reference's actual probe/wrench meshes (auto-scaled to arm-segment size),
    cached at res 0.02 / pad 1.0 — the mesh-real analog of the headline's
    procedural capsule arm, making cache-build, per-link AABB spans, and
    table sizes apples-to-apples with the reference's 8-link KUKA benchmark
    (reference tests/test_model_to_sdf.py:46-48,182)."""
    import numpy as np
    from pytorch_volumetric_tpu.sdf import (coherent_fast_tables,
                                            compose_query_coherent)
    from pytorch_volumetric_tpu.utils.robots import make_mesh_arm

    srcs = ["/root/reference/tests/probe.obj",
            "/root/reference/tests/offset_wrench_nogrip.obj"]
    if not all(os.path.exists(s) for s in srcs):
        return {}

    d = os.path.join(BENCH_DIR, "mesh_arm")
    urdf_path, end_link = make_mesh_arm(d, srcs, num_joints=7)
    chain = pv.build_serial_chain_from_urdf(open(urdf_path).read(), end_link)
    t0 = time.perf_counter()
    robot = pv.RobotSDF(
        chain, path_prefix=d,
        link_sdf_cls=pv.cache_link_sdf_factory(
            resolution=0.02, padding=1.0,
            cache_path=os.path.join(BENCH_DIR, "sdf_cache_mesh_arm.npz")))
    log(f"mesh arm (8 real-mesh links) cache ready in "
        f"{time.perf_counter() - t0:.1f}s")

    # same sweep as the headline row (reference grid, 15,251 useful points)
    query_range = np.array([[-1.0, 0.5], [0.02, 0.02], [-0.2, 0.8]])
    pts, take_idx, seg = pv.get_coherent_tile_points(0.01, query_range,
                                                     cache_resolution=0.02)
    M = take_idx.shape[0]
    rng = np.random.default_rng(2)
    th0 = np.array([0.0, -np.pi / 4, 0.0, np.pi / 2, 0.0, np.pi / 4, 0.0],
                   dtype=np.float32)
    th = jnp.asarray(np.concatenate([th0[None],
                                     th0 + rng.normal(0, 0.1, (N - 1, 7))]),
                     dtype=jnp.float32)

    children = tuple(robot.sdf.sdfs)
    ft = coherent_fast_tables(children)
    robot.set_joint_configuration(th[:8])  # spot-check subset (see headline)
    assert robot.sdf.check_coherent_contract(pts, seg=seg)

    def query_sum(q, p, f):
        m, m_inv = robot._link_transforms(q)
        v, g = compose_query_coherent(children, m, m_inv, q.shape[0], p,
                                      fast_tables=f, seg=seg)
        return v.sum() + g.sum()

    reps = chained.reps
    extra = {}
    fwd = chained(query_sum)
    float(fwd(th, pts, ft))
    fwd_s, fwd_lo, fwd_hi = time_median(fwd, th, pts, ft, reps=reps)
    log(f"mesh arm forward: {fwd_s * 1e3:.2f} ms for {N}x{M} -> "
        f"{N * M / fwd_s / 1e6:.1f}M queries/s")

    bwd = chained(lambda q, p, f: jax.grad(
        lambda qq: query_sum(qq, p, f))(q).sum())
    float(bwd(th, pts, ft))
    bwd_s, bwd_lo, bwd_hi = time_median(bwd, th, pts, ft, reps=reps)
    log(f"mesh arm forward+backward: {bwd_s * 1e3:.2f} ms -> "
        f"{N * M / bwd_s / 1e6:.1f}M queries/s")
    extra["mesh_arm_forward_qps_M"] = round(N * M / fwd_s / 1e6, 1)
    extra["mesh_arm_forward_backward_qps_M"] = round(N * M / bwd_s / 1e6, 1)
    spread_extra(extra, "mesh_arm_forward", fwd_s, fwd_lo, fwd_hi)
    spread_extra(extra, "mesh_arm_forward_backward", bwd_s, bwd_lo, bwd_hi)
    return extra


def bench_tight(jax, jnp, pv, chained, N, log):
    """Tight-cache row: the headline arm rebuilt with padding=0.1 (tight
    link grids — the realistic deployment shape, where most (link, tile)
    pairs are out of bounds and the per-pair work is dominated by the AABB
    fallback).  Through round 3 this was the A/B row for the opt-in culled
    union; that path measured 2.5x SLOWER than dense at in-bounds fraction
    0.10 (`artifacts_r03/bench.json` `tight_*`) with a sparsity-independent
    compaction front-end, so it was DELETED in r4 (see sdf.py's note).  The
    dense tight row remains as the deployment-shape reference number."""
    import numpy as np
    from pytorch_volumetric_tpu.sdf import (coherent_fast_tables,
                                            compose_query_coherent)
    from pytorch_volumetric_tpu.utils.robots import make_serial_arm

    arm_dir = os.path.join(BENCH_DIR, "arm")
    urdf_path, end_link = make_serial_arm(arm_dir, num_joints=7)
    chain = pv.build_serial_chain_from_urdf(open(urdf_path).read(), end_link)
    t0 = time.perf_counter()
    robot = pv.RobotSDF(
        chain, path_prefix=arm_dir,
        link_sdf_cls=pv.cache_link_sdf_factory(
            resolution=0.02, padding=0.1,
            cache_path=os.path.join(BENCH_DIR, "sdf_cache_tight.npz")))
    log(f"tight-cache arm (padding 0.1) ready in {time.perf_counter() - t0:.1f}s")

    query_range = np.array([[-1.0, 0.5], [0.02, 0.02], [-0.2, 0.8]])
    pts, take_idx, seg = pv.get_coherent_tile_points(0.01, query_range,
                                                     cache_resolution=0.02)
    M = take_idx.shape[0]
    rng = np.random.default_rng(0)
    th0 = np.array([0.0, -np.pi / 4, 0.0, np.pi / 2, 0.0, np.pi / 4, 0.0],
                   dtype=np.float32)
    th = jnp.asarray(np.concatenate([th0[None],
                                     th0 + rng.normal(0, 0.1, (N - 1, 7))]),
                     dtype=jnp.float32)
    children = tuple(robot.sdf.sdfs)
    ft = coherent_fast_tables(children)
    robot.set_joint_configuration(th[:8])
    assert robot.sdf.check_coherent_contract(pts, seg=seg)

    def query_sum(q, p, f):
        m, m_inv = robot._link_transforms(q)
        v, g = compose_query_coherent(children, m, m_inv, q.shape[0], p,
                                      fast_tables=f, seg=seg)
        return v.sum() + g.sum()

    reps = chained.reps
    extra = {}
    fwd = chained(query_sum)
    bwd = chained(lambda q, p, f: jax.grad(
        lambda qq: query_sum(qq, p, f))(q).sum())
    float(fwd(th, pts, ft))
    fwd_s, fwd_lo, fwd_hi = time_median(fwd, th, pts, ft, reps=reps)
    float(bwd(th, pts, ft))
    bwd_s, bwd_lo, bwd_hi = time_median(bwd, th, pts, ft, reps=reps)
    log(f"tight-cache dense: fwd {fwd_s * 1e3:.2f} ms "
        f"({N * M / fwd_s / 1e6:.1f}M q/s), fwd+bwd {bwd_s * 1e3:.2f} ms "
        f"({N * M / bwd_s / 1e6:.1f}M q/s)")
    extra["tight_dense_forward_qps_M"] = round(N * M / fwd_s / 1e6, 1)
    extra["tight_dense_forward_backward_qps_M"] = round(N * M / bwd_s / 1e6, 1)
    spread_extra(extra, "tight_dense_forward", fwd_s, fwd_lo, fwd_hi)
    spread_extra(extra, "tight_dense_forward_backward", bwd_s, bwd_lo, bwd_hi)
    return extra


if __name__ == "__main__":
    main()
