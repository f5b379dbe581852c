"""Bisect the binning→kernel composition overhead.

probe_compose.py: kernel alone 42 ms, binning alone ~18 ms, composed
120 ms. Which binning→kernel edge costs the extra ~60 ms?

Variants (binning always computed; X = which kernel inputs come from it,
the rest are pre-computed constants):
  none   : kernel uses all-constant visit arrays; binning consumed by a
           side output only (no edge at all)
  tile   : tile_of_visit dynamic
  chunk  : chunk_of_visit dynamic
  first  : first_of_tile dynamic
  lohi   : lane_lo/lane_hi dynamic
  all    : everything dynamic (= probe_compose k_bin)

Usage: python tools/probe_compose2.py [variants...]
"""

import sys
import time

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


def main():
    n = 300_000
    W, H, f = 1920, 1280, 1000.0
    pts, scales, quats, opac, cols, sem = build_scene(n)
    args = tuple(map(jnp.asarray, (pts, scales, quats, opac, cols)))
    K = jnp.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], jnp.float32)
    w2c = jnp.eye(4)
    st = RasterizeSettings(width=W, height=H, znear=0.2, zfar=100.0)
    dup_cap = default_duplicate_capacity(n, W, H)

    sur = preprocess_surfels(*args, w2c, K, st)
    sg = jax.lax.stop_gradient
    b = jax.jit(lambda: bin_surfels_stream(
        sg(sur.center2d), sg(sur.ext), sg(sur.depth), sur.valid,
        W, H, TILE_W, TILE_H, dup_cap, 64, cull=sg(sur.cull)))()
    recT0 = jax.block_until_ready(
        jnp.take(pack_geometry_T(sur, n), b.sorted_surfel, axis=1))
    tiles_x, tiles_y = int(b.tiles_x), int(b.tiles_y)
    num_tiles = tiles_x * tiles_y
    const = tuple(map(jax.block_until_ready,
                      (b.tile_of_visit, b.chunk_of_visit, b.first_of_tile,
                       b.last_of_tile, b.init_rev, b.lane_lo, b.lane_hi)))

    variants = sys.argv[1:] or ["none", "tile", "chunk", "first", "lohi",
                                "all"]

    for variant in variants:
        @jax.jit
        def run(recT, c2d, ext, dep, val, cull):
            def body(i, carry):
                r, s = carry
                bb = bin_surfels_stream(c2d + s * 1e-30, ext, dep, val,
                                        W, H, TILE_W, TILE_H, dup_cap, 64,
                                        cull=cull)
                va = list(const)
                if variant in ("tile", "all", "all_noside", "barrier"):
                    va[0] = bb.tile_of_visit
                if variant in ("chunk", "all", "all_noside", "barrier"):
                    va[1] = bb.chunk_of_visit
                if variant in ("first", "all", "all_noside", "barrier"):
                    va[2] = bb.first_of_tile
                if variant in ("lohi", "all", "all_noside", "barrier"):
                    va[5] = bb.lane_lo
                    va[6] = bb.lane_hi
                if variant == "barrier":
                    va = list(jax.lax.optimization_barrier(tuple(va)))
                if variant == "trivial":
                    # prefetch args from a TRIVIAL dynamic computation
                    # (binning co-resident via side-consume, but no edge
                    # from it into the pallas call)
                    z = (s * 1e-30).astype(jnp.int32)
                    va = [v + z for v in const]
                acc, lk = blend_stream(r, *va, num_tiles, tiles_x, st,
                                       False)
                # side-consume binning so it never gets DCE'd
                s2 = jnp.sum(acc) * 1e-30
                if variant != "all_noside":
                    s2 = s2 + jnp.sum(bb.lane_hi).astype(jnp.float32) * 1e-30
                return (r, s + s2)
            r, s = jax.lax.fori_loop(0, ITERS, body,
                                     (recT, jnp.float32(0.0)))
            return s

        a = (recT0, sg(sur.center2d), sg(sur.ext), sg(sur.depth),
             sur.valid, sg(sur.cull))
        r = jax.block_until_ready(run(*a))
        t0 = time.perf_counter()
        jax.block_until_ready(run(*a))
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{variant:8s}: {dt*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
