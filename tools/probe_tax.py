"""Understand the scalar-prefetch composition tax (profile.md).

Round-2 finding: the blend kernel runs ~30-45 ms slower when the 5 visit
arrays are produced by ANY in-program computation vs passed as jit
arguments. This probe digs into the mechanism:

  1. HLO: dump the optimized module for 'args' vs 'dyn' and print every
     op whose output feeds the pallas custom-call (looking for inserted
     copies / layout conversions on the scalar operands).
  2. Timing variants:
       args       - arrays straight from jit parameters (fast baseline)
       dyn        - arrays = param + 0 computed in-program (slow)
       launder    - arrays computed, then passed through a trivial Pallas
                    identity kernel (producer becomes a custom-call)
       dyn2x      - TWO chained blend calls sharing the same dyn arrays
                    (is the tax per pallas_call or per producing op?)

Usage: python tools/probe_tax.py [--hlo]
"""

import re
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import build_scene
from streetunveiler_tpu.ops.rasterizer import RasterizeSettings
from streetunveiler_tpu.ops.rasterizer.kernel import (
    TILE_H, TILE_W, blend_stream, pack_geometry_T)
from streetunveiler_tpu.ops.rasterizer.preprocess import preprocess_surfels
from streetunveiler_tpu.ops.rasterizer.tiles import bin_surfels_stream
from streetunveiler_tpu.ops.rasterizer.api import default_duplicate_capacity

ITERS = 5
N = 300_000


def build():
    W, H, f = 1920, 1280, 1000.0
    pts, scales, quats, opac, cols, sem = build_scene(N)
    args = tuple(map(jnp.asarray, (pts, scales, quats, opac, cols)))
    K = jnp.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], jnp.float32)
    w2c = jnp.eye(4)
    st = RasterizeSettings(width=W, height=H, znear=0.2, zfar=100.0)
    dup_cap = default_duplicate_capacity(n_surfels=N, width=W, height=H)
    sur = preprocess_surfels(*args, w2c, K, st)
    sg = jax.lax.stop_gradient
    b = jax.jit(lambda: bin_surfels_stream(
        sg(sur.center2d), sg(sur.ext), sg(sur.depth), sur.valid,
        W, H, TILE_W, TILE_H, dup_cap, 64, cull=sg(sur.cull)))()
    recT0 = jax.block_until_ready(
        jnp.take(pack_geometry_T(sur, N), b.sorted_surfel, axis=1))
    tiles_x, tiles_y = int(b.tiles_x), int(b.tiles_y)
    base = tuple(map(jax.block_until_ready,
                     (b.tile_of_visit, b.chunk_of_visit, b.first_of_tile,
                      b.last_of_tile, b.init_rev, b.lane_lo, b.lane_hi)))
    return recT0, base, tiles_x * tiles_y, tiles_x, st


def _pallas_identity(x):
    """Trivial Pallas TPU identity: re-producer of x as a custom-call."""
    n = x.shape[0]
    pad = -(-n // 128) * 128 - n
    xp = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)]).reshape(-1, 128)

    def k(i_ref, o_ref):
        o_ref[:, :] = i_ref[:, :]

    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct(xp.shape, x.dtype),
    )(xp)
    return out.reshape(-1)[:n]


def main():
    recT0, base, num_tiles, tiles_x, st = build()
    vcap = base[0].shape[0]
    print(f"vcap={vcap}", flush=True)

    def make(variant, ncalls=1):
        @jax.jit
        def run(recT, *va):
            def body(i, carry):
                r, s = carry
                if variant == "dyn":
                    z = (s * 1e-30).astype(jnp.int32)
                    vd = [v + z for v in va]
                elif variant == "launder":
                    z = (s * 1e-30).astype(jnp.int32)
                    vd = [_pallas_identity(v + z) for v in va]
                else:
                    vd = list(va)
                s2 = s
                for _ in range(ncalls):
                    acc, lk = blend_stream(r + s2 * 1e-30, *vd, num_tiles,
                                           tiles_x, st, False)
                    s2 = s2 + jnp.sum(acc) * 1e-30
                return (r, s2)
            r, s = jax.lax.fori_loop(0, ITERS, body,
                                     (recT, jnp.float32(0.0)))
            return s
        return run

    if "--hlo" in sys.argv:
        for variant in ("args", "dyn"):
            txt = (make(variant).lower(recT0, *base)
                   .compile().as_text())
            print(f"\n======== {variant}: ops feeding the custom-call")
            # find the fusion/copy ops that produce the custom-call operands
            lines = txt.splitlines()
            cc = [i for i, l in enumerate(lines) if "custom-call" in l
                  and "tpu" in l.lower() or "custom-call" in l]
            for i in cc[:3]:
                l = lines[i]
                m = re.findall(r"%[\w.-]+", l)
                print(f"  line: {l.strip()[:400]}")
            # layout-bearing copies on small int arrays
            for l in lines:
                if re.search(r"= s32\[\d{4,6}\]", l) and (
                        "copy" in l or "bitcast" in l or "custom-call" in l):
                    print(f"  {l.strip()[:250]}")
        return

    for variant, ncalls in (("args", 1), ("dyn", 1), ("launder", 1),
                            ("dyn", 2), ("args", 2)):
        run = make(variant, ncalls)
        r = jax.block_until_ready(run(recT0, *base))
        t0 = time.perf_counter()
        jax.block_until_ready(run(recT0, *base))
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{variant:8s} x{ncalls}: {dt*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
