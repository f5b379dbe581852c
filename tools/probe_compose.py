"""Probe where the composed forward loses time vs the sum of its stages.

profile_raster.py shows pre+bin+gather+kernel ≈ 133 ms while the isolated
stages sum to ~87 ms (pre+bin+gather 35 + kernel ~52). This tool times the
kernel under progressively more "composed" conditions to find the overhead:

  k_const   : kernel, visit arrays as closed-over constants, recT carried
  k_args    : kernel, visit arrays as jit ARGUMENTS, recT as argument
  k_take    : take(packT, idx) -> kernel, fixed table+idx arguments
  k_bin     : binning -> kernel with PRE-GATHERED recT argument
              (isolates binning-outputs -> scalar-prefetch composition)

Usage: python tools/probe_compose.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bench import build_scene
from streetunveiler_tpu.ops.rasterizer import RasterizeSettings
from streetunveiler_tpu.ops.rasterizer.kernel import (
    S_CHUNK, TILE_H, TILE_W, blend_stream, pack_geometry_T)
from streetunveiler_tpu.ops.rasterizer.preprocess import preprocess_surfels
from streetunveiler_tpu.ops.rasterizer.tiles import bin_surfels_stream
from streetunveiler_tpu.ops.rasterizer.api import default_duplicate_capacity

ITERS = 5


def timeit(fn, *args):
    r = fn(*args)
    jax.block_until_ready(jax.tree.leaves(r)[0])
    t0 = time.perf_counter()
    r = fn(*args)
    jax.block_until_ready(jax.tree.leaves(r)[0])
    return (time.perf_counter() - t0) / ITERS


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
    packT = jax.block_until_ready(pack_geometry_T(sur, n))
    idx0 = jax.block_until_ready(b.sorted_surfel)
    recT0 = jax.block_until_ready(jnp.take(packT, idx0, axis=1))
    tiles_x, tiles_y = int(b.tiles_x), int(b.tiles_y)
    num_tiles = tiles_x * tiles_y
    vargs = tuple(map(jax.block_until_ready,
                      (b.tile_of_visit, b.chunk_of_visit, b.first_of_tile,
                       b.last_of_tile, b.init_rev, b.lane_lo, b.lane_hi)))

    # ---- k_const: visit arrays closed over (constants), recT carried
    @jax.jit
    def k_const(recT):
        def body(i, r):
            acc, lk = blend_stream(r, *vargs, num_tiles, tiles_x, st, False)
            return r + jnp.sum(acc) * 1e-30
        return jax.lax.fori_loop(0, ITERS, body, recT)
    print(f"k_const  {timeit(k_const, recT0)*1e3:8.2f} ms", flush=True)

    # ---- k_args: everything as jit arguments
    @jax.jit
    def k_args(recT, *va):
        def body(i, r):
            acc, lk = blend_stream(r, *va, num_tiles, tiles_x, st, False)
            return r + jnp.sum(acc) * 1e-30
        return jax.lax.fori_loop(0, ITERS, body, recT)
    print(f"k_args   {timeit(k_args, recT0, *vargs)*1e3:8.2f} ms",
          flush=True)

    # ---- k_take: gather composed with the kernel
    @jax.jit
    def k_take(tbl, idx, *va):
        def body(i, t):
            recT = jnp.take(t, idx, axis=1)
            acc, lk = blend_stream(recT, *va, num_tiles, tiles_x, st,
                                   False)
            return t + jnp.sum(acc) * 1e-30
        return jax.lax.fori_loop(0, ITERS, body, tbl)
    print(f"k_take   {timeit(k_take, packT, idx0, *vargs)*1e3:8.2f} ms",
          flush=True)

    # ---- k_bin: binning composed with the kernel, recT fixed
    @jax.jit
    def k_bin(recT, c2d, ext, dep, val, cull):
        def body(i, r):
            bb = bin_surfels_stream(c2d + r[0, 0] * 1e-30, ext, dep, val,
                                    W, H, TILE_W, TILE_H, dup_cap, 64,
                                    cull=cull)
            acc, lk = blend_stream(r, bb.tile_of_visit, bb.chunk_of_visit,
                                   bb.first_of_tile, bb.last_of_tile,
                                   bb.init_rev, bb.lane_lo, bb.lane_hi,
                                   num_tiles, tiles_x, st, False)
            return r + jnp.sum(acc) * 1e-30
        return jax.lax.fori_loop(0, ITERS, body, recT)
    t = timeit(k_bin, recT0, sg(sur.center2d), sg(sur.ext), sg(sur.depth),
               sur.valid, sg(sur.cull))
    print(f"k_bin    {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
