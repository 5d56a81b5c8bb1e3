"""Microbenchmark the winner-gradient design space on real TPU.

The multi-link coherent union's winner gather (one 16 B row per point from
the concatenated (value, grad) tables) measured 198 ms = 59% of the r4
north-star chunk forward (artifacts_r04/trace_v3), declared "physical for
any per-point design".  VERDICT r5 item 1 attacks that: tile-granular
designs gather 768 B 3-channel GRADIENT-BRICK rows per tile instead.  This
harness measures the primitives those designs are built from, at north-star
chunk scale (B=25 configs x 1e6 points, seg=27 tiles, 8 links):

  pp_full     per-point 16 B rows, 100% scattered addresses  (today's cost)
  pp_fN       same, only N% of addresses real, rest redirected to row 0
              (does the duplicated-address cache-hit trick actually help?)
  brick_g1    one 768 B gradient-brick row per TILE (winner brick)
  brick_g2    two rows per tile (top-2 winners design)
  extract3    one-hot extraction of 3 channels from gathered brick rows
  extract6    .. for two candidate rows (top-2 design)

Usage: python benchmarks/winner_microbench.py [--out artifacts_r05/...]
"""

import argparse
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="")
    ap.add_argument("--configs", type=int, default=25)
    ap.add_argument("--points", type=int, default=1000080)
    ap.add_argument("--seg", type=int, default=27)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pytorch_volumetric_tpu.utils.profiling import device_time

    B, F, seg = args.configs, args.points, args.seg
    FS = F // seg
    G = 12_000_000          # ~ 8 links x 1.5M-cell grids
    NB = 1_600_000          # ~ 8 links x 200K brick rows
    rng = np.random.default_rng(0)

    vg = jnp.asarray(rng.normal(size=(G, 4)).astype(np.float32))
    gbricks = jnp.asarray(rng.normal(size=(NB, 192)).astype(np.float32))

    # per-point addresses [B, seg, FS] (the engine's layout), scattered
    addr_pp = jnp.asarray(rng.integers(0, G, size=(B, seg, FS)).astype(np.int32))
    # per-tile addresses [B, FS]
    addr_tile = jnp.asarray(rng.integers(0, NB, size=(B, FS)).astype(np.int32))
    # one-hot offsets for extraction
    offf = jnp.asarray(rng.integers(0, 64, size=(B, seg, FS)).astype(np.int32))
    fmask = jnp.asarray(rng.uniform(size=(B, seg, FS)).astype(np.float32))

    results = {}

    def run(name, fn, *a):
        ts = sorted(device_time(fn, *a, reps=5) for _ in range(3))
        results[name] = round(ts[1] * 1e3, 2)
        log(f"{name}: {ts[1] * 1e3:.2f} ms (min {ts[0] * 1e3:.2f} "
            f"max {ts[-1] * 1e3:.2f})")

    # --- per-point 16 B rows at varying real-address fraction ------------
    def pp(frac):
        thresh = jnp.float32(frac)

        def fn(vg, fm):
            a = jnp.where(fm < thresh, addr_pp, 0)
            return vg[a][..., 1:4].sum()

        return fn

    run("pp_full", pp(1.1), vg, fmask)
    for frac in (0.5, 0.25, 0.06, 0.0):
        run(f"pp_f{int(frac * 100):02d}", pp(frac), vg, fmask)

    # --- per-tile gradient-brick rows -------------------------------------
    def brick1(gb, fm):
        rows = gb[addr_tile]                        # [B, FS, 192]
        return (rows.sum(-1) * fm[:, 0]).sum()

    run("brick_g1", brick1, gbricks, fmask)

    def brick2(gb, fm):
        rows_a = gb[addr_tile]
        rows_b = gb[(addr_tile + 7) % NB]
        return ((rows_a.sum(-1) + rows_b.sum(-1)) * fm[:, 0]).sum()

    run("brick_g2", brick2, gbricks, fmask)

    # --- one-hot channel extraction ---------------------------------------
    with jax.ensure_compile_time_eval():
        iota64 = jnp.arange(64, dtype=jnp.int32)

    def extract(ncand):
        def fn(gb, fm):
            oh = (offf[..., None] == iota64).astype(jnp.float32)
            acc = 0.0
            for cand in range(ncand):
                rows = gb[(addr_tile + 7 * cand) % NB]  # [B, FS, 192]
                for c in range(3):
                    ch = rows[:, None, :, c * 64:(c + 1) * 64]
                    acc = acc + jnp.sum(ch * oh, axis=-1)
            return (acc * fm).sum()

        return fn

    run("extract3", extract(1), gbricks, fmask)
    run("extract6", extract(2), gbricks, fmask)

    out = {"metric": "winner_microbench_ms",
           "shape": f"B={B} F={F} seg={seg} G={G} NB={NB}",
           "results": results}
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
