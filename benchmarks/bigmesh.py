"""Large-mesh SDF benchmark: NarrowBandMeshSDF vs the brute-force sweep.

The reference's Open3D BVH is O(log F) per query; the brute-force TPU sweep
is O(F).  The narrow-band grid restores O(K) per query on TPU (two gathers +
K candidate evaluations).  Measured on a subdivided icosphere (uniform
triangle density); half the query points are scattered near the surface so
the exact in-band path does real work.

Usage: python benchmarks/bigmesh.py [--subdiv 7] [--points 262144]
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subdiv", type=int, default=7,
                    help="icosphere subdivisions (7 -> 327,680 faces)")
    ap.add_argument("--radius", type=float, default=0.5)
    ap.add_argument("--points", type=int, default=262_144)
    ap.add_argument("--cell-res", type=float, default=0.015)
    ap.add_argument("--band", type=float, default=0.01)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import pytorch_volumetric_tpu as pv
    from pytorch_volumetric_tpu import mesh as mesh_mod
    from pytorch_volumetric_tpu.utils.profiling import device_time

    log(f"devices: {jax.devices()}")
    t0 = time.perf_counter()
    m = mesh_mod.icosphere_mesh(radius=args.radius, subdivisions=args.subdiv)
    log(f"icosphere: {len(m.faces)} faces in {time.perf_counter() - t0:.1f}s")
    d = tempfile.mkdtemp(prefix="pvt_bigmesh_")
    path = os.path.join(d, "sphere.obj")
    mesh_mod.save_obj(m, path)
    fac = pv.MeshObjectFactory(path)

    rng = np.random.default_rng(0)
    n_far = args.points // 2
    far_pts = rng.uniform(-0.7, 0.7, (n_far, 3)).astype(np.float32)
    # near-surface points: random directions at radius +- 2 * band
    dirs = rng.normal(size=(args.points - n_far, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    radii = args.radius + rng.uniform(-2 * args.band, 2 * args.band,
                                      (len(dirs), 1)).astype(np.float32)
    pts = jnp.asarray(np.concatenate([far_pts, dirs * radii]))

    t0 = time.perf_counter()
    nb = pv.NarrowBandMeshSDF(fac, cell_res=args.cell_res, band=args.band,
                              padding=0.15)
    log(f"narrow-band build: {time.perf_counter() - t0:.1f}s "
        f"(K={nb.tables.cand.shape[1]}, "
        f"{nb.tables.cand.nbytes / 1e6:.0f} MB candidates)")

    dt_nb = device_time(lambda p: nb.raw_query(p)[0], pts, reps=5)
    qps_nb = args.points / dt_nb
    log(f"narrow-band: {dt_nb * 1e3:.1f} ms -> {qps_nb / 1e6:.2f}M queries/s")

    # brute force on a subset (it is ~F/K slower); scale the timing
    sub = min(args.points, 65536)
    exact = pv.MeshSDF(fac)
    dt_bf = device_time(lambda p: exact.raw_query(p)[0], pts[:sub], reps=2)
    qps_bf = sub / dt_bf
    log(f"brute-force sweep: {dt_bf * 1e3:.1f} ms for {sub} "
        f"-> {qps_bf / 1e6:.3f}M queries/s")

    # spot correctness: near-surface block vs brute force
    probe = pts[-2048:]
    v_nb = np.asarray(jax.jit(nb.raw_query)(probe)[0])
    v_bf = np.asarray(jax.jit(exact.raw_query)(probe)[0])
    # "in band" by the ACTUAL cell slot (distance-based selection would count
    # max_k-demoted cells, whose bounded far-field error is not the exact
    # path's): the exact path's error here should be ~0
    t = nb.tables
    k = np.floor((np.asarray(probe) - np.asarray(t.lo))
                 / np.asarray(t.res)).astype(int)
    ingrid = ((k >= 0) & (k < np.asarray(t.dims))).all(-1)
    kc = np.clip(k, 0, np.asarray(t.dims) - 1)
    slot = np.asarray(t.meta)[(kc * np.asarray(t.strides)).sum(-1), 4]
    in_band = ingrid & (slot >= 0)
    far = ingrid & (slot < 0)
    max_band_err = float(np.abs(v_nb - v_bf)[in_band].max()) if in_band.any() else -1.0
    far_err = float(np.abs(v_nb - v_bf)[far].max()) if far.any() else -1.0
    log(f"in-band max err vs brute force ({int(in_band.sum())} pts): "
        f"{max_band_err:.2e}; far-field max err ({int(far.sum())} pts): "
        f"{far_err:.2e}")

    print(json.dumps({
        "metric": "bigmesh_narrow_band_qps",
        "value": round(qps_nb, 1),
        "unit": f"queries/s ({len(m.faces)} faces)",
        "extra": {
            "speedup_vs_brute_force": round(qps_nb / qps_bf, 1),
            "brute_force_qps": round(qps_bf, 1),
            "in_band_max_err": max_band_err,
            "far_field_max_err": far_err,
        },
    }))


if __name__ == "__main__":
    main()
