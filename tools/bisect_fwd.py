"""Bisect the forward blend kernel's time on real binned data.

Builds the bench scene, bins it, then times forward-kernel VARIANTS that
differ only in the kernel body / output set — same grid, same visit
stream, same DMA pattern as production. This is the trustworthy way to
decompose the per-visit cost (micro-harnesses mis-measure through the
axon relay).

Usage: python tools/bisect_fwd.py [variant ...]
Variants: full floor floor_noalldone floor_nolk full_nopair full_noprefix
          full_noexp full_kogge
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
    CH, NQ, PIX, Q_ROW0, REC, S_CHUNK, TILE_H, TILE_W, _mm_precise,
    _pair_fn, _payload_sums, _prefix_mat, _tile_pixel_coords,
    pack_geometry_T)
from streetunveiler_tpu.ops.rasterizer.preprocess import preprocess_surfels
from streetunveiler_tpu.ops.rasterizer.tiles import bin_surfels_stream
from streetunveiler_tpu.ops.rasterizer.types import MEDIAN_T, T_EPS

ITERS = 5


def make_kernel(variant, tiles_x, znear, zfar):
    has_lk = variant != "floor_nolk"

    def kern(tile_of_ref, chunk_of_ref, first_ref, lo_ref, hi_ref,
             rec_ref, *outs):
        if has_lk:
            acc_ref, lk_ref, state_ref = outs
        else:
            acc_ref, state_ref = outs
        s = S_CHUNK
        v = pl.program_id(0)
        px, py = _tile_pixel_coords(tile_of_ref[v], tiles_x)
        iota_s = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)

        @pl.when(first_ref[v] > 0)
        def _():
            acc_ref[0] = jnp.zeros((PIX, CH), jnp.float32)
            if has_lk:
                lk_ref[0] = jnp.full((PIX, 1), -1, jnp.int32)
            state_ref[:, 0:1] = jnp.ones((PIX, 1), jnp.float32)
            state_ref[:, 1:2] = jnp.zeros((PIX, 1), jnp.float32)

        if variant == "floor_noalldone":
            skip = first_ref[v] < 0
        else:
            alldone = state_ref[0, 1] > 1.5
            skip = jnp.logical_or(alldone, first_ref[v] < 0)

        @pl.when(jnp.logical_not(skip))
        def _():
            chunk = rec_ref[:, :]
            if variant.startswith("floor"):
                acc_ref[0] = acc_ref[0] + jnp.sum(chunk) * 1e-30
                state_ref[:, 0:1] = state_ref[:, 0:1] * 0.999
                return

            qc = chunk[Q_ROW0:Q_ROW0 + NQ]
            acc = acc_ref[0]
            t_carry = state_ref[:, 0:1]
            done = state_ref[:, 1:2] > 0.5

            if variant == "full_nopair":
                # pair math replaced by 2 cheap ops (keeps shapes/layout)
                a = chunk[0:1, :] * 1e-6 + px * 1e-8
                tdep = chunk[11:12, :] + py * 0.0
            else:
                a, tdep = _pair_fn(chunk, px, py, znear)
            inr = (iota_s >= lo_ref[v]) & (iota_s < hi_ref[v])
            a = jnp.where(inr, a, 0.0)

            if variant == "full_noprefix":
                t_excl = t_carry * jnp.ones_like(a)
                t_after = t_excl * (1.0 - a)
                t_out_fn = lambda keep, logom=None: t_carry * 0.999
            elif variant == "full_kogge":
                # log-free prefix product via 7-step Kogge–Stone scan
                om = 1.0 - a
                cum = om
                for sh in (1, 2, 4, 8, 16, 32, 64):
                    prev = pltpu.roll(cum, sh, 1)
                    mask = iota_s >= sh
                    cum = cum * jnp.where(mask, prev, 1.0)
                excl = pltpu.roll(cum, 1, 1)
                excl = jnp.where(iota_s >= 1, excl, 1.0)
                t_excl = t_carry * excl
                t_after = t_carry * cum

                def t_out_fn(keep, logom=None):
                    kf = jnp.where(keep, 1.0 - a, 1.0)
                    for sh in (1, 2, 4, 8, 16, 32, 64):
                        kf = kf * pltpu.roll(kf, sh, 1)
                    return t_carry * kf[:, -1:]
            else:  # full / full_noexp
                logom = jnp.log1p(-a)
                if variant == "full_noexp":
                    t_excl = t_carry * (
                        1.0 + _mm_precise(logom, _prefix_mat(s, "excl")))
                else:
                    t_excl = t_carry * jnp.exp(
                        _mm_precise(logom, _prefix_mat(s, "excl")))
                t_after = t_excl * (1.0 - a)

                def t_out_fn(keep, logom=logom):
                    kept = jnp.where(keep, logom, 0.0)
                    if variant == "full_noexp":
                        return t_carry * (
                            1.0 + jnp.sum(kept, axis=1, keepdims=True))
                    return t_carry * jnp.exp(
                        jnp.sum(kept, axis=1, keepdims=True))

            keep = (a > 0.0) & (t_after >= T_EPS) & jnp.logical_not(done)
            if variant == "full_notrigger":
                trigger_any = t_after[:, -1:] * 0.0 > 1.0
            elif variant == "full_f32all":
                trig_f = jnp.where((a > 0.0) & (t_after < T_EPS), 1.0, 0.0)
                trigger_any = jnp.max(trig_f, axis=1, keepdims=True) > 0.5
            else:
                trigger_any = jnp.any((a > 0.0) & (t_after < T_EPS),
                                      axis=1, keepdims=True)
            w = jnp.where(keep, a * t_excl, 0.0)

            if variant == "full_nosums":
                cn = acc[:, 0:NQ] + w[:, 0:NQ]
                alpha = acc[:, 6:7] + w[:, 0:1]
                deptha = acc[:, 7:8] + (w * tdep)[:, 0:1]
                m = map_depth(tdep, znear, zfar)
                wm = w * m
                m1 = acc[:, 9:10] + wm[:, 0:1]
                m2 = acc[:, 10:11] + (wm * m)[:, 0:1]
            elif variant == "full_mxsums":
                # all 10 weighted sums through ONE single-pass MXU matmul
                m = map_depth(tdep, znear, zfar)
                wm = w * m
                lefts = jnp.concatenate([w, w * tdep, wm, wm * m], axis=1)
                ii = jax.lax.broadcasted_iota(jnp.int32, (4 * s, 128), 0)
                jj = jax.lax.broadcasted_iota(jnp.int32, (4 * s, 128), 1)
                qcpad = jnp.concatenate(
                    [qc, jnp.zeros((128 - NQ, s), jnp.float32)], axis=0)
                blk = ii // s
                g = jnp.where((blk == 0) & (jj < NQ),
                              qcpad.T[ii % s, jj], 0.0)
                g = g + ((blk == 0) & (jj == NQ)) * 1.0      # alpha
                g = g + ((blk == 1) & (jj == NQ + 1)) * 1.0  # deptha
                g = g + ((blk == 2) & (jj == NQ + 2)) * 1.0  # m1
                g = g + ((blk == 3) & (jj == NQ + 3)) * 1.0  # m2
                sums = jax.lax.dot_general(
                    lefts, g, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
                cn = acc[:, 0:NQ] + sums[:, 0:NQ]
                alpha = acc[:, 6:7] + sums[:, NQ:NQ + 1]
                deptha = acc[:, 7:8] + sums[:, NQ + 1:NQ + 2]
                m1 = acc[:, 9:10] + sums[:, NQ + 2:NQ + 3]
                m2 = acc[:, 10:11] + sums[:, NQ + 3:NQ + 4]
            else:
                cn = acc[:, 0:NQ] + _payload_sums(w, qc, NQ)
                alpha = acc[:, 6:7] + jnp.sum(w, axis=1, keepdims=True)
                deptha = acc[:, 7:8] + jnp.sum(w * tdep, axis=1,
                                               keepdims=True)
                m = map_depth(tdep, znear, zfar)
                wm = w * m
                m1 = acc[:, 9:10] + jnp.sum(wm, axis=1, keepdims=True)
                m2 = acc[:, 10:11] + jnp.sum(wm * m, axis=1, keepdims=True)

            iota_f = iota_s.astype(jnp.float32)
            if variant == "full_nomed":
                med = acc[:, 11:12]
            elif variant in ("full_f32max", "full_f32all"):
                cand = (w > 0.0) & (t_excl > MEDIAN_T)
                bestf = jnp.max(jnp.where(cand, iota_f, -1.0), axis=1,
                                keepdims=True)
                onehot = (iota_f == bestf) & cand
                med = jnp.where(bestf >= 0,
                                jnp.sum(jnp.where(onehot, tdep, 0.0),
                                        axis=1, keepdims=True),
                                acc[:, 11:12])
            elif variant == "full_suffmm":
                cand = (w > 0.0) & (t_excl > MEDIAN_T)
                both = jnp.concatenate(
                    [cand.astype(jnp.float32), keep.astype(jnp.float32)],
                    axis=1)
                jj2 = jax.lax.broadcasted_iota(jnp.int32, (2 * s, 2 * s), 0)
                ii2 = jax.lax.broadcasted_iota(jnp.int32, (2 * s, 2 * s), 1)
                sexcl2 = (((jj2 // s) == (ii2 // s))
                          & ((jj2 % s) > (ii2 % s))).astype(jnp.float32)
                suff = jax.lax.dot_general(
                    both, sexcl2, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
                lastcand = cand & (suff[:, 0:s] < 0.5)
                lastkeep = keep & (suff[:, s:2 * s] < 0.5)
                lcf = lastcand.astype(jnp.float32)
                anyc = jnp.sum(lcf, axis=1, keepdims=True)
                medsum = jnp.sum(lcf * tdep, axis=1, keepdims=True)
                med = jnp.where(anyc > 0.5, medsum, acc[:, 11:12])
            else:
                cand = (w > 0.0) & (t_excl > MEDIAN_T)
                best = jnp.max(jnp.where(cand, iota_s, -1), axis=1,
                               keepdims=True)
                onehot = (iota_s == best) & cand
                med = jnp.where(best >= 0,
                                jnp.sum(jnp.where(onehot, tdep, 0.0),
                                        axis=1, keepdims=True),
                                acc[:, 11:12])

            if has_lk:
                if variant == "full_nolkmax":
                    lk_ref[0] = jnp.maximum(lk_ref[0],
                                            (w[:, 0:1] > 2.0).astype(
                                                jnp.int32))
                elif variant in ("full_f32max", "full_f32all"):
                    gidxf = (chunk_of_ref[v] * s) + iota_f
                    bk = jnp.max(jnp.where(keep, gidxf, -1.0), axis=1,
                                 keepdims=True)
                    lk_ref[0] = jnp.maximum(lk_ref[0],
                                            bk.astype(jnp.int32))
                elif variant == "full_suffmm":
                    lkf = lastkeep.astype(jnp.float32)
                    anyk = jnp.sum(lkf, axis=1, keepdims=True)
                    lklane = jnp.sum(lkf * iota_f, axis=1, keepdims=True)
                    lknew = (chunk_of_ref[v] * s
                             + lklane.astype(jnp.int32))
                    lk_ref[0] = jnp.where(anyk > 0.5, lknew, lk_ref[0])
                else:
                    gidx = chunk_of_ref[v] * s + iota_s
                    lk_ref[0] = jnp.maximum(
                        lk_ref[0], jnp.max(jnp.where(keep, gidx, -1),
                                           axis=1, keepdims=True))

            t_out = t_out_fn(keep)
            done = jnp.logical_or(done, trigger_any)

            acc_ref[0] = jnp.concatenate(
                [cn, alpha, deptha, acc[:, 8:9], m1, m2, med], axis=1)
            state_ref[:, 0:1] = t_out
            done_f = done.astype(jnp.float32)
            if variant == "full_f32all":
                alldn = jnp.min(done_f, axis=0, keepdims=True) > 0.5
                state_ref[:, 1:2] = jnp.where(alldn, done_f + 1.0, done_f)
            else:
                state_ref[:, 1:2] = jnp.where(jnp.all(done), done_f + 1.0,
                                              done_f)

    return kern


def build_call(variant, vcap, num_tiles, tiles_x, znear, zfar):
    kern = make_kernel(variant, tiles_x, znear, zfar)
    has_lk = variant != "floor_nolk"
    out_specs = [pl.BlockSpec((1, PIX, CH),
                              lambda v, t, c, f, lo_, hi_: (t[v], 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((num_tiles, PIX, CH), jnp.float32)]
    if has_lk:
        out_specs.append(pl.BlockSpec(
            (1, PIX, 1), lambda v, t, c, f, lo_, hi_: (t[v], 0, 0),
            memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((num_tiles, PIX, 1),
                                              jnp.int32))

    def call(tile_of, chunk_of, first_f, lo, hi, recT):
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=5,
                grid=(vcap,),
                in_specs=[pl.BlockSpec(
                    (REC, S_CHUNK),
                    lambda v, t, c, f, lo_, hi_: (0, c[v]),
                    memory_space=pltpu.VMEM)],
                out_specs=out_specs,
                scratch_shapes=[pltpu.VMEM((PIX, 8), jnp.float32)],
            ),
            out_shape=out_shape,
        )(tile_of, chunk_of, first_f, lo, hi, recT)

    return call


def main():
    variants = sys.argv[1:] or ["full", "floor", "floor_noalldone",
                                "floor_nolk", "full_nopair",
                                "full_noprefix", "full_noexp",
                                "full_kogge"]
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
    vargs = tuple(map(jax.block_until_ready,
                      (b.tile_of_visit, b.chunk_of_visit, b.first_of_tile,
                       b.lane_lo, b.lane_hi)))
    print(f"vcap={vcap} tiles={num_tiles}", flush=True)

    for variant in variants:
        call = build_call(variant, vcap, num_tiles, tiles_x, st.znear,
                          st.zfar)

        @jax.jit
        def run(recT):
            def body(i, r):
                out = call(*vargs, r)
                return r + jnp.sum(out[0]) * 1e-30
            return jax.lax.fori_loop(0, ITERS, body, recT)

        r = run(recT0)
        jax.block_until_ready(r)
        r2 = recT0 * (1.0 + 1e-6)
        t0 = time.perf_counter()
        jax.block_until_ready(run(r2))
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{variant:16s}: {dt*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
