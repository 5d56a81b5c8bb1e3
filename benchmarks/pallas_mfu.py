"""VPU utilization (MFU) accounting for the Pallas exact-mesh sweep.

Two measurements (VERDICT r3 item 7):

1. An empirical f32 VPU peak: a pure-FMA Pallas kernel (unrolled
   multiply-adds on a VMEM-resident [256, 512] block, no HBM traffic in
   the loop) — the achievable-FLOPs ceiling on this chip, measured rather
   than quoted from a spec sheet.
2. The exact point->mesh sweep (`pallas_closest_query_soa`) at several
   (point_tile, tri_tile) shapes on the reference's YcbPowerDrill mesh —
   pairs/s, the ~110 flop/pair model, and utilization vs (1).

Prints one JSON line.  Usage: python benchmarks/pallas_mfu.py [--points N]
"""

import argparse
import functools
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
    ap.add_argument("--points", type=int, default=1 << 18)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--fma-iters", type=int, default=4096)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(BENCH_DIR, "xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from pytorch_volumetric_tpu import mesh as mesh_mod
    from pytorch_volumetric_tpu.ops.pallas.closest_point import (
        mesh_closest_query_pallas)
    from pytorch_volumetric_tpu.utils.profiling import device_time

    log(f"devices: {jax.devices()}")

    # ---- 1. empirical VPU f32 peak ------------------------------------
    # Register-sized blocks ([8, 128] per accumulator), 8 independent
    # chains, 32 statically-unrolled FMAs per fori iteration: a single
    # dependent chain measures FMA *latency* (0.46 TF/s) and big blocks
    # spill accumulators to VMEM (0.65 TF/s); this version keeps the
    # dataflow in vector registers.
    K = args.fma_iters
    ROWS, COLS = 8, 128
    UNROLL = 32

    def fma_kernel(x_ref, y_ref, o_ref):
        a = x_ref[...]
        b = y_ref[...]
        accs = tuple(a * (0.1 * (i + 1)) for i in range(8))

        def body(_, accs):
            for _ in range(UNROLL // 8):
                accs = tuple(acc * a + b for acc in accs)
            return accs

        accs = jax.lax.fori_loop(0, K, body, accs)
        out = accs[0]
        for acc in accs[1:]:
            out = out + acc
        o_ref[...] = out

    @jax.jit
    def fma_run(x, y):
        return pl.pallas_call(
            fma_kernel,
            out_shape=jax.ShapeDtypeStruct((ROWS, COLS), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, y)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0.5, 0.9, (ROWS, COLS)), dtype=jnp.float32)
    y = jnp.asarray(rng.uniform(0.01, 0.1, (ROWS, COLS)), dtype=jnp.float32)
    t = device_time(fma_run, x, y, reps=args.reps)
    # 8 chains x (UNROLL // 8) FMAs x 2 flops per element-iteration
    peak_flops = 2.0 * UNROLL * K * ROWS * COLS / t
    log(f"empirical VPU f32 peak: {peak_flops / 1e12:.3f} TFLOP/s "
        f"({t * 1e3:.2f} ms for {K} x {UNROLL} FMAs on [{ROWS},{COLS}])")

    # ---- 2. the exact sweep at several tile shapes --------------------
    drill = ("/root/reference/tests/YcbPowerDrill/"
             "textured_simple_reoriented.obj")
    m = mesh_mod.read_triangle_mesh(drill)
    tri = jnp.asarray(np.asarray(m.vertices)[np.asarray(m.faces)],
                      dtype=jnp.float32)
    Fq = tri.shape[0]
    P = args.points
    pts = jnp.asarray(rng.uniform(-0.15, 0.15, (P, 3)), dtype=jnp.float32)
    log(f"drill mesh: {Fq} faces, {P} points")

    results = {}
    best = None
    for pt_tile, tt_tile in ((256, 512), (512, 512), (1024, 512),
                             (512, 1024), (256, 2048)):
        fn = functools.partial(mesh_closest_query_pallas,
                               point_tile=pt_tile, tri_tile=tt_tile)
        jfn = jax.jit(lambda p, t, f=fn: f(p, t)[0].sum())
        try:
            t_s = device_time(jfn, pts, tri, reps=args.reps)
        except Exception as e:  # noqa: BLE001 - tile shape may not lower
            log(f"tile ({pt_tile},{tt_tile}): failed {type(e).__name__}")
            continue
        pairs = P * Fq / t_s
        flops = pairs * 110
        util = flops / peak_flops
        results[f"pt{pt_tile}_tt{tt_tile}"] = {
            "ms": round(t_s * 1e3, 2),
            "gpairs_s": round(pairs / 1e9, 2),
            "tflops_model": round(flops / 1e12, 3),
            "util_vs_measured_peak": round(util, 3),
        }
        log(f"tile ({pt_tile:4d},{tt_tile:4d}): {t_s * 1e3:8.2f} ms, "
            f"{pairs / 1e9:6.2f}G pairs/s, {flops / 1e12:.2f} TF/s model, "
            f"{util * 100:.0f}% of measured peak")
        if best is None or pairs > best[1]:
            best = (f"pt{pt_tile}_tt{tt_tile}", pairs)

    print(json.dumps({
        "metric": "pallas_sweep_mfu",
        "value": round(best[1] / 1e9, 2),
        "unit": f"G point-tri pairs/s (best tile {best[0]}, {Fq} faces)",
        "extra": {
            "vpu_f32_peak_tflops_measured": round(peak_flops / 1e12, 3),
            "tiles": results,
            "flop_model_per_pair": 110,
        },
    }), flush=True)


if __name__ == "__main__":
    main()
