"""Dump compiled-HLO around the blend custom-call for k_only vs k_bin.

probe_compose3/4: kernel-on-args 42 ms, kernel-after-real-binning 118 ms,
laundering doesn't help. Diff what the compiler actually emits.

Usage: python tools/probe_hlo2.py [--full]
"""

import re
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
    packT0 = pack_geometry_T(sur, N)
    recT0 = jnp.take(packT0, b.sorted_surfel, axis=1)
    tiles_x, tiles_y = int(b.tiles_x), int(b.tiles_y)
    num_tiles = tiles_x * tiles_y
    base = (b.tile_of_visit, b.chunk_of_visit, b.first_of_tile,
            b.last_of_tile, b.init_rev, b.lane_lo, b.lane_hi)
    pre = (sur.center2d, sur.ext, sur.depth, sur.valid, sur.cull)

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

    for name, fn, a in (("k_only", k_only, (recT0,) + base),
                        ("k_bin", k_bin, (recT0,) + pre)):
        txt = fn.lower(*a).compile().as_text()
        print(f"\n######## {name}: {len(txt.splitlines())} HLO lines")
        if "--full" in sys.argv:
            with open(f"/tmp/hlo_{name}.txt", "w") as fh:
                fh.write(txt)
            print(f"written /tmp/hlo_{name}.txt")
        lines = txt.splitlines()
        for i, l in enumerate(lines):
            if "custom-call" in l:
                for j in range(max(0, i - 6), min(len(lines), i + 2)):
                    print(f"  {lines[j].strip()[:220]}")
                print("  ---")


if __name__ == "__main__":
    main()
