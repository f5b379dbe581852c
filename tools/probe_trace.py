"""Per-op device timing of k_only vs k_bin via jax.profiler + xplane.

Usage: python tools/probe_trace.py [k_only|k_bin|both]
Writes /tmp/trace_<name>/ and prints the top device ops by self time.
"""

import glob
import os
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bench import build_scene
from streetunveiler_tpu.ops.rasterizer import RasterizeSettings
from streetunveiler_tpu.ops.rasterizer.kernel import (
    TILE_H, TILE_W, blend_stream, pack_geometry_T)
from streetunveiler_tpu.ops.rasterizer.preprocess import preprocess_surfels
from streetunveiler_tpu.ops.rasterizer.tiles import bin_surfels_stream
from streetunveiler_tpu.ops.rasterizer.api import default_duplicate_capacity

ITERS = 5
N = 300_000


def summarize(logdir):
    """Parse the Chrome trace json: device ops by total self time."""
    import gzip
    import json
    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                             recursive=True))
    if not paths:
        print(f"no trace json under {logdir}")
        return
    with gzip.open(paths[-1], "rt") as fh:
        data = json.load(fh)
    evs = data.get("traceEvents", data if isinstance(data, list) else [])
    pid_names = {}
    for e in evs:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    totals = {}
    counts = {}
    for e in evs:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "Chip" not in pname and "XLA" not in pname:
            continue
        key = (pname.split("/")[0], e.get("name", "?"))
        totals[key] = totals.get(key, 0) + e.get("dur", 0)
        counts[key] = counts.get(key, 0) + 1
    print(f"  (process planes: {sorted(set(pid_names.values()))})")
    for key, us in sorted(totals.items(), key=lambda kv: -kv[1])[:32]:
        print(f"  {us/1e3/ITERS:9.3f} ms x{counts[key]:5d}  "
              f"[{key[0][:28]}] {key[1][:100]}")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    W, H, f = 1920, 1280, 1000.0
    pts, scales, quats, opac, cols, sem = build_scene(N)
    args = tuple(map(jnp.asarray, (pts, scales, quats, opac, cols)))
    K = jnp.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], jnp.float32)
    w2c = jnp.eye(4)
    st = RasterizeSettings(width=W, height=H, znear=0.2, zfar=100.0)
    dup_cap = default_duplicate_capacity(N, W, H)

    sur = preprocess_surfels(*args, w2c, K, st)
    sg = jax.lax.stop_gradient
    b = jax.jit(lambda: bin_surfels_stream(
        sg(sur.center2d), sg(sur.ext), sg(sur.depth), sur.valid,
        W, H, TILE_W, TILE_H, dup_cap, 64, cull=sg(sur.cull)))()
    recT0 = jax.block_until_ready(
        jnp.take(pack_geometry_T(sur, N), b.sorted_surfel, axis=1))
    tiles_x, tiles_y = int(b.tiles_x), int(b.tiles_y)
    num_tiles = tiles_x * tiles_y
    base = tuple(map(jax.block_until_ready,
                     (b.tile_of_visit, b.chunk_of_visit, b.first_of_tile,
                      b.last_of_tile, b.init_rev, b.lane_lo, b.lane_hi)))
    pre = tuple(map(jax.block_until_ready,
                    (sur.center2d, sur.ext, sur.depth, sur.valid, sur.cull)))

    @jax.jit
    def k_only(recT, *va):
        def body(i, carry):
            r, s = carry
            acc, lk = blend_stream(r + s * 1e-30, *va, num_tiles, tiles_x,
                                   st, False)
            return (r, s + jnp.sum(acc) * 1e-30)
        return jax.lax.fori_loop(0, ITERS, body, (recT, jnp.float32(0.0)))[1]

    @jax.jit
    def k_bin(recT, c2d, ext, dep, val, cull):
        def body(i, carry):
            r, s = carry
            bb = bin_surfels_stream(c2d + s * 1e-30, ext, dep, val, W, H,
                                    TILE_W, TILE_H, dup_cap, 64, cull=cull)
            acc, lk = blend_stream(r, bb.tile_of_visit, bb.chunk_of_visit,
                                   bb.first_of_tile, bb.last_of_tile,
                                   bb.init_rev, bb.lane_lo, bb.lane_hi,
                                   num_tiles, tiles_x, st, False)
            return (r, s + jnp.sum(acc) * 1e-30)
        return jax.lax.fori_loop(0, ITERS, body, (recT, jnp.float32(0.0)))[1]

    cases = {"k_only": (k_only, (recT0,) + base),
             "k_bin": (k_bin, (recT0,) + pre)}
    for nm, (fn, a) in cases.items():
        if which not in ("both", nm):
            continue
        jax.block_until_ready(fn(*a))          # compile outside trace
        logdir = f"/tmp/trace_{nm}"
        with jax.profiler.trace(logdir):
            jax.block_until_ready(fn(*a))
        print(f"\n#### {nm}")
        summarize(logdir)


if __name__ == "__main__":
    main()
