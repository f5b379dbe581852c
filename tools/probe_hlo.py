"""Dump compiled-HLO op histograms for the composed forward.

Counts sorts/gathers/fusions in the compiled module of the k_bin probe
(binning composed with the blend kernel) to find duplicated computations.

Usage: python tools/probe_hlo.py
"""

import collections
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


def histo(txt, label):
    ops = collections.Counter()
    big = []
    for line in txt.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?[\w.-]+ = (\w+)\(?", line)
        mm = re.search(r"= ((?:\w+\[[^\]]*\])+)\s*(\w+)\(", line)
        if mm:
            shape, op = mm.group(1), mm.group(2)
            ops[op] += 1
            if op in ("sort", "gather", "scatter", "custom-call",
                      "dynamic-slice", "dynamic-update-slice", "transpose",
                      "copy"):
                nums = [int(x) for x in re.findall(r"\d+", shape)[:4]]
                sz = 1
                for x in nums:
                    sz *= max(x, 1)
                if sz > 100_000:
                    big.append((op, shape[:90]))
    print(f"==== {label}")
    for op, c in ops.most_common(25):
        print(f"  {op:24s} {c}")
    print("  -- big ops:")
    for op, shape in big[:40]:
        print(f"  {op:14s} {shape}")


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
    recT0 = jnp.take(pack_geometry_T(sur, n), b.sorted_surfel, axis=1)
    tiles_x, tiles_y = int(b.tiles_x), int(b.tiles_y)
    num_tiles = tiles_x * tiles_y

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
        return jax.lax.fori_loop(0, 5, body, recT)

    lowered = jax.jit(k_bin).lower(recT0, sg(sur.center2d), sg(sur.ext),
                                   sg(sur.depth), sur.valid, sg(sur.cull))
    compiled = lowered.compile()
    histo(compiled.as_text(), "k_bin compiled")

    def bin_only(c2d, ext, dep, val, cull):
        def body(i, s):
            bb = bin_surfels_stream(c2d + s * 1e-30, ext, dep, val,
                                    W, H, TILE_W, TILE_H, dup_cap, 64,
                                    cull=cull)
            return s + jnp.sum(bb.lane_lo).astype(jnp.float32) * 1e-30
        return jax.lax.fori_loop(0, 5, body, jnp.float32(0.0))

    compiled2 = jax.jit(bin_only).lower(
        sg(sur.center2d), sg(sur.ext), sg(sur.depth), sur.valid,
        sg(sur.cull)).compile()
    histo(compiled2.as_text(), "bin_only compiled")


if __name__ == "__main__":
    main()
