"""Can laundering the visit arrays fix the binning->kernel coupling?

probe_compose3: kernel alone 42 ms, +gather 55, +in-program binning 118.
The +76 ms coupling is the REAL-producer version of the round-2 scalar
prefetch tax. probe_tax showed const+0 producers cost nothing and a
Pallas-identity launder of those cost nothing — here we launder the
actually-sort-produced visit arrays before they reach the blend kernel:

  k_bin          : control (expect ~118)
  k_bin_launder  : visit arrays -> pallas identity -> kernel
  k_full_launder : full fwd path (bin + gather + kernel), laundered
  k_full_launder1: like k_full_launder but launders ONLY tile_of_visit
                   (is one array enough? r2 said non-additive)

Usage: python tools/probe_compose4.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from bench import build_scene
from streetunveiler_tpu.ops.rasterizer import RasterizeSettings
from streetunveiler_tpu.ops.rasterizer.kernel import (
    TILE_H, TILE_W, blend_stream, pack_geometry_T)
from streetunveiler_tpu.ops.rasterizer.preprocess import preprocess_surfels
from streetunveiler_tpu.ops.rasterizer.tiles import bin_surfels_stream
from streetunveiler_tpu.ops.rasterizer.api import default_duplicate_capacity

ITERS = 5
N = 300_000


def pallas_identity(*xs):
    """Identity through ONE tiny Pallas kernel (re-producer = custom-call).

    All inputs must be 1-D int32 of the same length."""
    n = xs[0].shape[0]
    pad = -(-n // 128) * 128 - n
    stack = jnp.stack([jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])
                       for x in xs]).reshape(len(xs), -1, 128)

    def k(i_ref, o_ref):
        o_ref[:, :, :] = i_ref[:, :, :]

    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct(stack.shape, stack.dtype),
    )(stack)
    return tuple(out[i].reshape(-1)[:n] for i in range(len(xs)))


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
    recT0 = jax.block_until_ready(
        jnp.take(packT0, b.sorted_surfel, axis=1))
    tiles_x, tiles_y = int(b.tiles_x), int(b.tiles_y)
    num_tiles = tiles_x * tiles_y
    pre = tuple(map(jax.block_until_ready,
                    (sur.center2d, sur.ext, sur.depth, sur.valid, sur.cull)))

    def timeit(run, *a):
        jax.block_until_ready(run(*a))
        t0 = time.perf_counter()
        jax.block_until_ready(run(*a))
        return (time.perf_counter() - t0) / ITERS

    def make(mode):
        @jax.jit
        def run(recT_or_packT, c2d, ext, dep, val, cull):
            def body(i, carry):
                r, s = carry
                bb = bin_surfels_stream(c2d + s * 1e-30, ext, dep, val,
                                        W, H, TILE_W, TILE_H, dup_cap, 64,
                                        cull=cull)
                va = (bb.tile_of_visit, bb.chunk_of_visit,
                      bb.first_of_tile, bb.last_of_tile, bb.init_rev,
                      bb.lane_lo, bb.lane_hi)
                if mode in ("launder", "full", "full1"):
                    if mode == "full1":
                        t0_, = pallas_identity(va[0])
                        va = (t0_,) + va[1:]
                    else:
                        va = pallas_identity(*va)
                if mode in ("full", "full1"):
                    recT = jnp.take(recT_or_packT, bb.sorted_surfel, axis=1)
                else:
                    recT = r if False else recT_or_packT
                acc, lk = blend_stream(recT, *va, num_tiles, tiles_x, st,
                                       False)
                return (r, s + jnp.sum(acc) * 1e-30)
            return jax.lax.fori_loop(0, ITERS, body,
                                     (jnp.float32(0.0), jnp.float32(0.0)))[1]
        return run

    print(f"k_bin          : {timeit(make('bin'), recT0, *pre)*1e3:8.2f} ms",
          flush=True)
    print(f"k_bin_launder  : {timeit(make('launder'), recT0, *pre)*1e3:8.2f}"
          " ms", flush=True)
    print(f"k_full_launder : {timeit(make('full'), packT0, *pre)*1e3:8.2f}"
          " ms", flush=True)
    print(f"k_full_launder1: {timeit(make('full1'), packT0, *pre)*1e3:8.2f}"
          " ms", flush=True)


if __name__ == "__main__":
    main()
