"""Bisect the backward blend kernel's per-visit cost (cf. bisect_fwd.py).

Variants replace parts of the body with cheap stand-ins of the same
shape; deltas vs 'full' attribute the cost.

Usage: python tools/bisect_bwd.py [variant ...]
Variants: full floor no_vjp no_dq no_gqqc no_suffmm no_exp
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import build_scene
from streetunveiler_tpu.ops.rasterizer import RasterizeSettings
from streetunveiler_tpu.ops.rasterizer.blendmath import map_depth
from streetunveiler_tpu.ops.rasterizer.kernel import (
    CH, NQ, PIX, Q_ROW0, REC, S_CHUNK, TILE_H, TILE_W, _blend_fwd_call,
    _mm, _mm_precise, _pair_fn, _prefix_mat, _tile_pixel_coords,
    pack_geometry_T)
from streetunveiler_tpu.ops.rasterizer.preprocess import preprocess_surfels
from streetunveiler_tpu.ops.rasterizer.tiles import bin_surfels_stream
from streetunveiler_tpu.ops.rasterizer.types import T_EPS

ITERS = 5


def make_kernel(variant, num_visits, tiles_x, znear, zfar):
    def kern(tile_of_ref, chunk_of_ref, last_ref, init_ref, lo_ref,
             hi_ref, rec_ref, acc_ref, lk_ref, dacc_ref, dgrad_ref,
             state_ref):
        s = S_CHUNK
        v = num_visits - 1 - pl.program_id(0)
        px, py = _tile_pixel_coords(tile_of_ref[v], tiles_x)
        iota_s = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)

        @pl.when(last_ref[v] > 0)
        def _():
            state_ref[:, 0:1] = 1.0 - acc_ref[0][:, 6:7]
            state_ref[:, 1:2] = jnp.zeros((PIX, 1), jnp.float32)

        dead = jnp.max(lk_ref[0].astype(jnp.float32)) < (
            chunk_of_ref[v] * s).astype(jnp.float32)

        @pl.when(jnp.logical_and(last_ref[v] >= 0, dead))
        def _():
            @pl.when(init_ref[v] > 0)
            def _():
                dgrad_ref[:, :] = jnp.zeros_like(dgrad_ref)

        @pl.when(jnp.logical_and(last_ref[v] >= 0, jnp.logical_not(dead)))
        def _():
            gq = dacc_ref[0][:, 0:NQ]
            galpha = dacc_ref[0][:, 6:7]
            gdepth = dacc_ref[0][:, 7:8]
            gm1 = dacc_ref[0][:, 9:10]
            gm2 = dacc_ref[0][:, 10:11]
            lk = lk_ref[0]
            u_in = state_ref[:, 0:1]
            ssuf = state_ref[:, 1:2]

            chunk = rec_ref[:, :]
            if variant == "floor":
                dgrad_ref[:, :] = chunk * 1e-30
                state_ref[:, 0:1] = u_in * 0.999
                return
            qc = chunk[Q_ROW0:Q_ROW0 + NQ]

            if variant == "no_vjp":
                a, tdep = _pair_fn(chunk, px, py, znear)
                pair_vjp = lambda cts: (chunk * 1e-30
                                        + cts[0][0:1, :] * 0.0
                                        + cts[1][0:1, :] * 0.0,)
                pair_vjp = lambda cts: (jnp.concatenate(
                    [cts[0][0:REC - 10] * 1e-6, cts[1][0:10] * 1e-6],
                    axis=0),)
            else:
                pair = functools.partial(_pair_fn, px=px, py=py,
                                         znear=znear)
                (a, tdep), pair_vjp = jax.vjp(pair, chunk)
            inr = (iota_s >= lo_ref[v]) & (iota_s < hi_ref[v])
            a = jnp.where(inr, a, 0.0)

            gidx = chunk_of_ref[v] * s + iota_s
            keep = (a > 0.0) & (gidx <= lk)
            klogom = jnp.where(keep, jnp.log1p(-a), 0.0)
            if variant == "no_exp":
                t_excl = u_in * (1.0 - _mm_precise(
                    klogom, _prefix_mat(s, "sincl")))
                u_out = u_in * (1.0 - jnp.sum(klogom, axis=1,
                                              keepdims=True))
            elif variant == "no_suffmm":
                t_excl = u_in * (1.0 + klogom * 0.0)
                u_out = u_in * 0.999
            else:
                t_excl = u_in * jnp.exp(-_mm_precise(
                    klogom, _prefix_mat(s, "sincl")))
                u_out = u_in * jnp.exp(-jnp.sum(klogom, axis=1,
                                                keepdims=True))
            w = jnp.where(keep, a * t_excl, 0.0)

            m = map_depth(tdep, znear, zfar)
            if variant == "no_gqqc":
                gq_qc = w * 1e-6
            else:
                gq_qc = jnp.zeros_like(a)
                for kk in range(NQ):
                    gq_qc = gq_qc + gq[:, kk:kk + 1] * qc[kk:kk + 1, :]
            omega = gq_qc + galpha + gdepth * tdep + gm1 * m + gm2 * m * m
            womega = w * omega
            if variant == "no_suffmm":
                ssuf_pair = ssuf + womega * 1e-6
            else:
                ssuf_pair = ssuf + _mm(womega, _prefix_mat(s, "sexcl"))
            ssuf_out = ssuf + jnp.sum(womega, axis=1, keepdims=True)

            da = jnp.where(keep, t_excl * omega - ssuf_pair / (1.0 - a),
                           0.0)
            dmdt = (zfar * znear / (zfar - znear)) / jnp.maximum(
                tdep * tdep, 1e-12)
            dt = w * (gdepth + (gm1 + 2.0 * m * gm2) * dmdt)
            da = jnp.where(inr, da, 0.0)
            dt = jnp.where(inr, dt, 0.0)

            (drec,) = pair_vjp((da, dt))
            if variant == "no_dq":
                dq = womega[0:NQ, :] * 1e-6
            else:
                dq = jnp.concatenate(
                    [jnp.sum(gq[:, kk:kk + 1] * w, axis=0, keepdims=True)
                     for kk in range(NQ)], axis=0)
            contrib = jnp.concatenate(
                [drec[:Q_ROW0], drec[Q_ROW0:Q_ROW0 + NQ] + dq,
                 drec[Q_ROW0 + NQ:]], axis=0)

            @pl.when(init_ref[v] > 0)
            def _():
                dgrad_ref[:, :] = contrib

            @pl.when(init_ref[v] == 0)
            def _():
                dgrad_ref[:, :] = dgrad_ref[:, :] + contrib

            state_ref[:, 0:1] = u_out
            state_ref[:, 1:2] = ssuf_out

    return kern


def main():
    variants = sys.argv[1:] or ["full", "floor", "no_vjp", "no_dq"]
    n = 300_000
    W, H, f = 1920, 1280, 1000.0
    pts, scales, quats, opac, cols, sem = build_scene(n)
    args = tuple(map(jnp.asarray, (pts, scales, quats, opac, cols)))
    K = jnp.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], jnp.float32)
    w2c = jnp.eye(4)
    st = RasterizeSettings(width=W, height=H, znear=0.2, zfar=100.0)
    from streetunveiler_tpu.ops.rasterizer.api import \
        default_duplicate_capacity
    dup_cap = default_duplicate_capacity(n, W, H)

    sur = preprocess_surfels(*args, w2c, K, st)
    sg = jax.lax.stop_gradient
    b = jax.jit(lambda: bin_surfels_stream(
        sg(sur.center2d), sg(sur.ext), sg(sur.depth), sur.valid,
        W, H, TILE_W, TILE_H, dup_cap, 64))()
    recT0 = jax.block_until_ready(
        jnp.take(pack_geometry_T(sur, n), b.sorted_surfel, axis=1))
    tiles_x, tiles_y = int(b.tiles_x), int(b.tiles_y)
    num_tiles = tiles_x * tiles_y
    vcap = b.tile_of_visit.shape[0]
    cap = recT0.shape[1]

    # forward pass once for residuals
    acc, lkv = jax.jit(lambda r: _blend_fwd_call(
        r, b.tile_of_visit, b.chunk_of_visit, b.first_of_tile, b.lane_lo,
        b.lane_hi, num_tiles, tiles_x, st, False))(recT0)
    acc = jax.block_until_ready(acc)
    dacc = jnp.ones_like(acc)
    vargs = tuple(map(jax.block_until_ready,
                      (b.tile_of_visit, b.chunk_of_visit, b.last_of_tile,
                       b.init_rev, b.lane_lo, b.lane_hi)))
    print(f"vcap={vcap} tiles={num_tiles}", flush=True)

    rev = lambda g: vcap - 1 - g
    for variant in variants:
        kern = make_kernel(variant, vcap, tiles_x, st.znear, st.zfar)

        def call(recT):
            return pl.pallas_call(
                kern,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=6,
                    grid=(vcap,),
                    in_specs=[
                        pl.BlockSpec((REC, S_CHUNK),
                                     lambda g, t, c, l, ir, lo_, hi_:
                                     (0, c[rev(g)]),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, PIX, CH),
                                     lambda g, t, c, l, ir, lo_, hi_:
                                     (t[rev(g)], 0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, PIX, 1),
                                     lambda g, t, c, l, ir, lo_, hi_:
                                     (t[rev(g)], 0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, PIX, CH),
                                     lambda g, t, c, l, ir, lo_, hi_:
                                     (t[rev(g)], 0, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=[
                        pl.BlockSpec((REC, S_CHUNK),
                                     lambda g, t, c, l, ir, lo_, hi_:
                                     (0, c[rev(g)]),
                                     memory_space=pltpu.VMEM),
                    ],
                    scratch_shapes=[pltpu.VMEM((PIX, 8), jnp.float32)],
                ),
                out_shape=[jax.ShapeDtypeStruct((REC, cap), jnp.float32)],
            )(*vargs, recT, acc, lkv, dacc)[0]

        @jax.jit
        def run(recT):
            def body(i, r):
                out = call(r)
                return r + out * 1e-30
            return jax.lax.fori_loop(0, ITERS, body, recT)

        r = run(recT0)
        jax.block_until_ready(r)
        r2 = recT0 * (1.0 + 1e-6)
        t0 = time.perf_counter()
        jax.block_until_ready(run(r2))
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{variant:10s}: {dt*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
