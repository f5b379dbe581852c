"""Bisect the fwd composition overhead with REAL producers (round 3).

profile_raster (r3) shows: isolated fwd kernel 44.5 ms but appending the
kernel to pre+bin+gather adds ~101 ms. probe_tax shows const+0 producers
of the visit arrays add nothing. So the overhead needs real producers —
this probe isolates WHICH coupling costs:

  k_only   : kernel on arg recT + arg visit arrays       (baseline ~44)
  k_gather : kernel on in-program take(packT, sorted);
             packT + sorted as args                      (true gather cost)
  k_bin    : in-program binning feeds the kernel's visit
             arrays; recT is an arg                      (bin<->kernel)
  k_binsort: binning in-program, but kernel consumes visit
             arrays AND the sorted ids only via gather,
             i.e. full fwd minus preprocess              (everything)

Usage: python tools/probe_compose3.py
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
N = 300_000


def main():
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
    packT0 = jax.block_until_ready(pack_geometry_T(sur, N))
    sorted0 = jax.block_until_ready(b.sorted_surfel)
    recT0 = jax.block_until_ready(jnp.take(packT0, sorted0, axis=1))
    tiles_x, tiles_y = int(b.tiles_x), int(b.tiles_y)
    num_tiles = tiles_x * tiles_y
    base = tuple(map(jax.block_until_ready,
                     (b.tile_of_visit, b.chunk_of_visit, b.first_of_tile,
                      b.last_of_tile, b.init_rev, b.lane_lo, b.lane_hi)))
    # frozen preprocess outputs for the in-program binning variants
    pre = tuple(map(jax.block_until_ready,
                    (sur.center2d, sur.ext, sur.depth, sur.valid, sur.cull)))

    def timeit(run, *a):
        r = jax.block_until_ready(run(*a))
        t0 = time.perf_counter()
        jax.block_until_ready(run(*a))
        return (time.perf_counter() - t0) / ITERS

    @jax.jit
    def k_only(recT, *va):
        def body(i, carry):
            r, s = carry
            acc, lk = blend_stream(r + s * 1e-30, *va, num_tiles, tiles_x,
                                   st, False)
            return (r, s + jnp.sum(acc) * 1e-30)
        return jax.lax.fori_loop(0, ITERS, body, (recT, jnp.float32(0.0)))[1]

    @jax.jit
    def k_gather(packT, sidx, *va):
        def body(i, carry):
            p, s = carry
            recT = jnp.take(p + s * 1e-30, sidx, axis=1)
            acc, lk = blend_stream(recT, *va, num_tiles, tiles_x, st, False)
            return (p, s + jnp.sum(acc) * 1e-30)
        return jax.lax.fori_loop(0, ITERS, body, (packT, jnp.float32(0.0)))[1]

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

    @jax.jit
    def k_binsort(packT, c2d, ext, dep, val, cull):
        def body(i, carry):
            p, s = carry
            bb = bin_surfels_stream(c2d + s * 1e-30, ext, dep, val, W, H,
                                    TILE_W, TILE_H, dup_cap, 64, cull=cull)
            recT = jnp.take(p, bb.sorted_surfel, axis=1)
            acc, lk = blend_stream(recT, bb.tile_of_visit, bb.chunk_of_visit,
                                   bb.first_of_tile, bb.last_of_tile,
                                   bb.init_rev, bb.lane_lo, bb.lane_hi,
                                   num_tiles, tiles_x, st, False)
            return (p, s + jnp.sum(acc) * 1e-30)
        return jax.lax.fori_loop(0, ITERS, body, (packT, jnp.float32(0.0)))[1]

    print(f"k_only   : {timeit(k_only, recT0, *base)*1e3:8.2f} ms",
          flush=True)
    print(f"k_gather : {timeit(k_gather, packT0, sorted0, *base)*1e3:8.2f}"
          " ms", flush=True)
    print(f"k_bin    : {timeit(k_bin, recT0, *pre)*1e3:8.2f} ms", flush=True)
    print(f"k_binsort: {timeit(k_binsort, packT0, *pre)*1e3:8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
