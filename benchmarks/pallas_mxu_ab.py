"""MXU A/B for the exact point->mesh sweep (VERDICT r5 item 6).

The Pallas sweep runs at the VPU compute roofline (~12.9G pairs/s,
artifacts_r04/pallas_mfu.json) with ~110 VPU flop/pair.  The MXU is ~100x
the VPU's iron, and the pairwise dot products decompose onto it: with six
per-triangle vectors M = [ab | ac | n | a | b | c] as a [8, 6*TT] matrix
(K=3 zero-padded to 8), one [PT, 8] x [8, 6*TT] matmul yields p.ab, p.ac,
p.n, p.a, p.b, p.c per pair — from which d1..d6 are per-triangle-constant
offsets, the winding numerator is (det_abc - p.n), and the corner norms
are sqrt(|a|^2 - 2 p.a + |p|^2).  That moves ~50 of the ~110 flop/pair
(all dot/cross products) to the MXU; the region selects, divisions, sqrt
and atan2 stay on the VPU.

Three kernels measured on the YcbPowerDrill sweep shapes:
  base     the production kernel (ops/pallas/closest_point.py)
  nowind   base minus the winding accumulation — bounds the atan2 share
  mxu      the matmul formulation above

Prints one JSON line; correctness of `mxu` is asserted against the XLA
reference sweep first.  Usage: python benchmarks/pallas_mxu_ab.py
"""

import argparse
import functools
import json
import os
import sys

import numpy as np

BENCH_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench_cache")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_kernels():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pytorch_volumetric_tpu.ops.pallas.closest_point import (_atan2,
                                                                 _FOUR_PI)

    def sweep_kernel(pts_ref, tri_ref, d2_ref, cp_ref, fid_ref, wind_ref,
                     mode="base"):
        j = pl.program_id(1)
        TT = tri_ref.shape[1]
        PT = pts_ref.shape[1]

        @pl.when(j == 0)
        def _init():
            d2_ref[...] = jnp.full_like(d2_ref, jnp.inf)
            cp_ref[...] = jnp.zeros_like(cp_ref)
            fid_ref[...] = jnp.zeros_like(fid_ref)
            wind_ref[...] = jnp.zeros_like(wind_ref)

        px = pts_ref[0, :].reshape(PT, 1)
        py = pts_ref[1, :].reshape(PT, 1)
        pz = pts_ref[2, :].reshape(PT, 1)
        ax = tri_ref[0, :].reshape(1, TT)
        ay = tri_ref[1, :].reshape(1, TT)
        az = tri_ref[2, :].reshape(1, TT)
        bx = tri_ref[3, :].reshape(1, TT)
        by = tri_ref[4, :].reshape(1, TT)
        bz = tri_ref[5, :].reshape(1, TT)
        cx = tri_ref[6, :].reshape(1, TT)
        cy = tri_ref[7, :].reshape(1, TT)
        cz = tri_ref[8, :].reshape(1, TT)

        abx, aby, abz = bx - ax, by - ay, bz - az
        acx, acy, acz = cx - ax, cy - ay, cz - az

        if mode == "mxu":
            # n = b x c + c x a + a x b (per triangle)
            nx = (by * cz - bz * cy) + (cy * az - cz * ay) + (ay * bz
                                                              - az * by)
            ny = (bz * cx - bx * cz) + (cz * ax - cx * az) + (az * bx
                                                              - ax * bz)
            nz = (bx * cy - by * cx) + (cx * ay - cy * ax) + (ax * by
                                                              - ay * bx)
            # [8, 6*TT] triangle matrix (K rows x, y, z + 5 zero pad rows)
            zero = jnp.zeros((1, TT), jnp.float32)
            cols = [(abx, aby, abz), (acx, acy, acz), (nx, ny, nz),
                    (ax, ay, az), (bx, by, bz), (cx, cy, cz)]
            tmat = jnp.concatenate(
                [jnp.concatenate([vx, vy, vz, zero, zero, zero, zero, zero],
                                 axis=0) for (vx, vy, vz) in cols], axis=1)
            pmat = jnp.concatenate(
                [px, py, pz] + [jnp.zeros((PT, 1), jnp.float32)] * 5, axis=1)
            dots = jax.lax.dot_general(
                pmat, tmat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)     # [PT, 6*TT] on MXU
            pab = dots[:, 0 * TT:1 * TT]
            pac = dots[:, 1 * TT:2 * TT]
            pn = dots[:, 2 * TT:3 * TT]
            pa = dots[:, 3 * TT:4 * TT]
            pb = dots[:, 4 * TT:5 * TT]
            pc = dots[:, 5 * TT:6 * TT]
            # per-triangle constants (O(TT) VPU work)
            ab_a = abx * ax + aby * ay + abz * az
            ac_a = acx * ax + acy * ay + acz * az
            ab_b = abx * bx + aby * by + abz * bz
            ac_b = acx * bx + acy * by + acz * bz
            ab_c = abx * cx + aby * cy + abz * cz
            ac_c = acx * cx + acy * cy + acz * cz
            d1 = pab - ab_a
            d2_ = pac - ac_a
            d3 = pab - ab_b
            d4 = pac - ac_b
            d5 = pab - ab_c
            d6 = pac - ac_c
        else:
            apx = px - ax
            apy = py - ay
            apz = pz - az
            d1 = abx * apx + aby * apy + abz * apz
            d2_ = acx * apx + acy * apy + acz * apz
            bpx, bpy, bpz = apx - abx, apy - aby, apz - abz
            d3 = abx * bpx + aby * bpy + abz * bpz
            d4 = acx * bpx + acy * bpy + acz * bpz
            cpx, cpy, cpz = apx - acx, apy - acy, apz - acz
            d5 = abx * cpx + aby * cpy + abz * cpz
            d6 = acx * cpx + acy * cpy + acz * cpz

        va = d3 * d6 - d5 * d4
        vb = d5 * d2_ - d1 * d6
        vc = d1 * d4 - d3 * d2_

        def safe_div(num, den):
            return num / jnp.where(jnp.abs(den) < 1e-30, 1e-30, den)

        denom = va + vb + vc
        v = safe_div(vb, denom)
        w = safe_div(vc, denom)
        v_ab = safe_div(d1, d1 - d3)
        w_ac = safe_div(d2_, d2_ - d6)
        w_bc = safe_div(d4 - d3, (d4 - d3) + (d5 - d6))
        in_a = (d1 <= 0) & (d2_ <= 0)
        in_b = (d3 >= 0) & (d4 <= d3)
        in_c = (d6 >= 0) & (d5 <= d6)
        on_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
        on_ac = (vb <= 0) & (d2_ >= 0) & (d6 <= 0)
        on_bc = (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)
        v = jnp.where(on_bc, 1.0 - w_bc, v)
        w = jnp.where(on_bc, w_bc, w)
        v = jnp.where(on_ac, 0.0, v)
        w = jnp.where(on_ac, w_ac, w)
        v = jnp.where(on_ab, v_ab, v)
        w = jnp.where(on_ab, 0.0, w)
        v = jnp.where(in_c, 0.0, v)
        w = jnp.where(in_c, 1.0, w)
        v = jnp.where(in_b, 1.0, v)
        w = jnp.where(in_b, 0.0, w)
        v = jnp.where(in_a, 0.0, v)
        w = jnp.where(in_a, 0.0, w)

        qx = ax + v * abx + w * acx
        qy = ay + v * aby + w * acy
        qz = az + v * abz + w * acz
        dx, dy, dz = qx - px, qy - py, qz - pz
        dist2 = dx * dx + dy * dy + dz * dz

        if mode != "nowind":
            if mode == "mxu":
                pp = px * px + py * py + pz * pz        # [PT, 1]
                aa = ax * ax + ay * ay + az * az        # [1, TT]
                bb = bx * bx + by * by + bz * bz
                cc = cx * cx + cy * cy + cz * cz
                a_b = ax * bx + ay * by + az * bz
                b_c = bx * cx + by * cy + bz * cz
                c_a = cx * ax + cy * ay + cz * az
                det = (ax * (by * cz - bz * cy) + ay * (bz * cx - bx * cz)
                       + az * (bx * cy - by * cx))
                la = jnp.sqrt(jnp.maximum(aa - 2.0 * pa + pp, 0.0))
                lb = jnp.sqrt(jnp.maximum(bb - 2.0 * pb + pp, 0.0))
                lc = jnp.sqrt(jnp.maximum(cc - 2.0 * pc + pp, 0.0))
                num = det - pn
                den = (la * lb * lc
                       + (a_b - pa - pb + pp) * lc
                       + (b_c - pb - pc + pp) * la
                       + (c_a - pc - pa + pp) * lb)
            else:
                ax_, ay_, az_ = ax - px, ay - py, az - pz
                bx_, by_, bz_ = bx - px, by - py, bz - pz
                cx_, cy_, cz_ = cx - px, cy - py, cz - pz
                la = jnp.sqrt(ax_ * ax_ + ay_ * ay_ + az_ * az_)
                lb = jnp.sqrt(bx_ * bx_ + by_ * by_ + bz_ * bz_)
                lc = jnp.sqrt(cx_ * cx_ + cy_ * cy_ + cz_ * cz_)
                num = (ax_ * (by_ * cz_ - bz_ * cy_)
                       + ay_ * (bz_ * cx_ - bx_ * cz_)
                       + az_ * (bx_ * cy_ - by_ * cx_))
                den = (la * lb * lc
                       + (ax_ * bx_ + ay_ * by_ + az_ * bz_) * lc
                       + (bx_ * cx_ + by_ * cy_ + bz_ * cz_) * la
                       + (cx_ * ax_ + cy_ * ay_ + cz_ * az_) * lb)
            wind_ref[0, :] += jnp.sum(2.0 * _atan2(num, den), axis=1)

        tile_arg = jnp.argmin(dist2, axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (PT, TT), 1)
        sel = lane == tile_arg[:, None]
        tile_d2 = jnp.min(dist2, axis=1)
        tile_qx = jnp.sum(jnp.where(sel, qx, 0.0), axis=1)
        tile_qy = jnp.sum(jnp.where(sel, qy, 0.0), axis=1)
        tile_qz = jnp.sum(jnp.where(sel, qz, 0.0), axis=1)
        tile_fid = j * TT + tile_arg
        best = d2_ref[0, :]
        better = tile_d2 < best
        d2_ref[0, :] = jnp.where(better, tile_d2, best)
        fid_ref[0, :] = jnp.where(better, tile_fid, fid_ref[0, :])
        cp_ref[0, :] = jnp.where(better, tile_qx, cp_ref[0, :])
        cp_ref[1, :] = jnp.where(better, tile_qy, cp_ref[1, :])
        cp_ref[2, :] = jnp.where(better, tile_qz, cp_ref[2, :])

    def build(mode, point_tile, tri_tile):
        @functools.partial(jax.jit, static_argnames=())
        def run(pts_soa, tri_soa):
            Pp = pts_soa.shape[1]
            Fp = tri_soa.shape[1]
            grid = (Pp // point_tile, Fp // tri_tile)
            kernel = pl.pallas_call(
                functools.partial(sweep_kernel, mode=mode),
                grid=grid,
                in_specs=[
                    pl.BlockSpec((3, point_tile), lambda i, j: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((9, tri_tile), lambda i, j: (0, j),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((1, point_tile), lambda i, j: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((3, point_tile), lambda i, j: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, point_tile), lambda i, j: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, point_tile), lambda i, j: (0, i),
                                 memory_space=pltpu.VMEM),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((1, Pp), jnp.float32),
                    jax.ShapeDtypeStruct((3, Pp), jnp.float32),
                    jax.ShapeDtypeStruct((1, Pp), jnp.int32),
                    jax.ShapeDtypeStruct((1, Pp), jnp.float32),
                ],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary")),
            )
            d2, cp, fid, wind = kernel(pts_soa, tri_soa)
            return d2[0], cp, fid[0], wind[0] / _FOUR_PI

        return run

    return build


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=1 << 17)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(BENCH_DIR, "xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from pytorch_volumetric_tpu import mesh as mesh_mod
    from pytorch_volumetric_tpu.ops.point_triangle import mesh_closest_query
    from pytorch_volumetric_tpu.utils.batching import cdiv
    from pytorch_volumetric_tpu.utils.profiling import device_time

    drill = "/root/reference/tests/YcbPowerDrill/textured_simple_reoriented.obj"
    m = mesh_mod.read_triangle_mesh(drill)
    tri = np.asarray(m.vertices)[np.asarray(m.faces)]      # [F, 3, 3]
    F = tri.shape[0]
    P = args.points
    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.2, 0.2, (P, 3)).astype(np.float32)

    build = make_kernels()
    results = {}
    configs = [("base", 512, 1024), ("nowind", 512, 1024),
               ("mxu", 512, 1024), ("mxu", 256, 512), ("mxu", 512, 512)]

    # padded SoA inputs (shared)
    def soa(pt, tt):
        Ft = cdiv(F, tt) * tt
        trip = np.full((Ft, 3, 3), mesh_mod.PAD_COORD, np.float32)
        trip[:F] = tri
        Pp = cdiv(P, pt) * pt
        ptsp = np.full((Pp, 3), 2.0 * mesh_mod.PAD_COORD, np.float32)
        ptsp[:P] = pts
        return (jnp.asarray(ptsp.T), jnp.asarray(trip.reshape(Ft, 9).T),
                Ft)

    # XLA reference for correctness
    d_ref, cp_ref, fid_ref, wind_ref = mesh_closest_query(
        jnp.asarray(pts), jnp.asarray(tri))
    d_ref = np.asarray(d_ref)
    wind_ref = np.asarray(wind_ref)

    for mode, pt, tt in configs:
        pts_soa, tri_soa, Ft = soa(pt, tt)
        run = build(mode, pt, tt)
        try:
            d2, cp, fid, wind = jax.block_until_ready(run(pts_soa, tri_soa))
        except Exception as e:  # noqa: BLE001 - record lowering failures
            log(f"{mode} ({pt}x{tt}): FAILED {type(e).__name__}: "
                f"{str(e)[:200]}")
            results[f"{mode}_{pt}x{tt}"] = {"error": str(e)[:200]}
            continue
        d = np.sqrt(np.asarray(d2)[:P])
        ok_d = np.allclose(d, d_ref, atol=1e-5)
        ok_w = (mode == "nowind") or np.allclose(np.asarray(wind)[:P],
                                                 wind_ref, atol=1e-3)
        t = device_time(lambda p, t_: run(p, t_)[0].sum(), pts_soa, tri_soa,
                        reps=args.reps)
        pairs = P * F / t
        log(f"{mode} ({pt}x{tt}): {pairs / 1e9:.2f}G pairs/s "
            f"(dist ok={ok_d}, wind ok={ok_w})")
        results[f"{mode}_{pt}x{tt}"] = {
            "gpairs_s": round(pairs / 1e9, 2),
            "dist_matches_xla": bool(ok_d), "wind_matches_xla": bool(ok_w)}

    out = {"metric": "pallas_mxu_ab", "points": P, "faces": F,
           "results": results}
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
