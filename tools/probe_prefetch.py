"""Isolate the dynamic-scalar-prefetch overhead of the blend kernel.

probe_compose2 'trivial' shows: making the 5 scalar-prefetch arrays
dynamic (const + 0) adds ~30 ms per forward call at vcap=16.4k. Does the
overhead scale with the visit count (per-grid-step stall) or is it fixed
per call? Times const vs dynamic prefetch at two scene sizes.

Usage: python tools/probe_prefetch.py
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


def run_case(n):
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
    base = tuple(map(jax.block_until_ready,
                     (b.tile_of_visit, b.chunk_of_visit, b.first_of_tile,
                      b.last_of_tile, b.init_rev, b.lane_lo, b.lane_hi)))
    vcap = base[0].shape[0]

    out = {}
    for variant in ("const", "args", "dyn"):
        dyn = variant == "dyn"

        @jax.jit
        def run(recT, *va):
            def body(i, carry):
                r, s = carry
                if dyn:
                    z = (s * 1e-30).astype(jnp.int32)
                    vd = [v + z for v in va]
                elif variant == "args":
                    vd = list(va)
                else:
                    vd = list(base)
                # perturb recT per-iteration so XLA cannot hoist the
                # loop-invariant pallas_call out of the fori_loop (the
                # visit arrays must stay un-computed in const/args)
                acc, lk = blend_stream(r + s * 1e-30, *vd, num_tiles,
                                       tiles_x, st, False)
                return (r, s + jnp.sum(acc) * 1e-30)
            r, s = jax.lax.fori_loop(0, ITERS, body,
                                     (recT, jnp.float32(0.0)))
            return s

        r = jax.block_until_ready(run(recT0, *base))
        t0 = time.perf_counter()
        jax.block_until_ready(run(recT0, *base))
        dt = (time.perf_counter() - t0) / ITERS
        out[variant] = dt
        print(f"n={n:7d} vcap={vcap:6d} {variant:6s}: {dt*1e3:7.2f} ms",
              flush=True)
    print(f"n={n:7d} overhead: {(out['dyn']-out['const'])*1e3:7.2f} ms",
          flush=True)


if __name__ == "__main__":
    for n in (300_000, 75_000):
        run_case(n)
