"""Pallas TPU forward/backward 2DGS blend kernels.

The TPU-native replacement for the reference's CUDA tile renderer
(SURVEY.md §2.3 N1, §3.5) — designed for the hardware, not translated:

* 16×16 pixel tiles → P=256 pixels on *sublanes*; surfel chunks of S=128
  on *lanes*. With surfels on lanes, per-surfel attribute records stream
  from HBM as lane-aligned [16, 128] slices of a transposed [16, cap]
  array — no gathers and no relayouts on-chip.
* Pair math (ray–plane intersection, Gaussian falloff) on the VPU via the
  shared ``blendmath`` formulas; broadcasting [1,S] × [P,1] → [P,S].
* Front-to-back transmittance via *triangular matmuls on the MXU*:
  cumulative products in log space (T = exp(logα-prefix)) and prefix sums
  for the depth-distortion accumulator — [256,128]×[128,128] matmuls.
* Per-surfel channel accumulation (color, normal) as one [P,S]×[S,C]
  MXU matmul per chunk.
* Early termination: exact reference semantics (a surfel that would push
  T below 1e-4 is dropped and freezes the pixel) via masked cumulative
  triggers; the whole tile stops once every pixel is done.
* Backward runs in *reverse* chunk order with suffix accumulators — no
  replay buffers. Forward saves one int32 per pixel (the last composited
  duplicate index, CUDA's ``n_contrib``) so the backward reconstructs the
  exact composited set. Per-pair input gradients come from ``jax.vjp`` of
  the shared pair function *inside* the kernel, so forward and backward
  can never drift apart. The distortion backward needs only per-pixel
  totals (∂L/∂m_k = 2ω_k(m_k·A_tot − M1_tot)), all saved in the forward
  accumulator — no extra residuals.
* Chunks are double-buffered: the next chunk's DMA is issued before the
  current chunk is blended.

Channel layout of the per-tile accumulator output [PIX, CH=12]:
  0-2 color, 3-5 view-space normal, 6 alpha, 7 expected-depth accum,
  8 distortion, 9 m1 (Σωm), 10 m2 (Σωm²), 11 median depth.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .blendmath import map_depth, pair_alpha_depth
from .types import MEDIAN_T, T_EPS

TILE_H = 16
TILE_W = 16
PIX = TILE_H * TILE_W          # 256 pixels (sublanes) per tile
S_CHUNK = 128                  # surfels (lanes) per chunk
GEOM_ROWS = 16                 # packed per-duplicate geometry record rows
Q_ROWS = 8                     # packed channel rows (color 3 + normal 3 + pad)
CH = 12                        # accumulator channels (see module docstring)
DG_ROWS = GEOM_ROWS + Q_ROWS   # backward per-duplicate gradient record rows


def _prefix_mat(s, mode, dtype=jnp.float32):
    """[S,S] matmul operand for prefix/suffix sums along the lane axis.

    For X [P,S]: (X @ M)[p,i] = Σ_j X[p,j]·M[j,i]. mode selects M[j,i]:
    'incl' j≤i, 'excl' j<i (prefix), 'sincl' j≥i, 'sexcl' j>i (suffix).
    """
    j = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    i = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    op = {"incl": j <= i, "excl": j < i, "sincl": j >= i, "sexcl": j > i}[mode]
    return op.astype(dtype)


def _mm(a, b, contract):
    """dot_general with true-f32 accumulation; contract = ((lhs,), (rhs,)).

    Precision.HIGHEST forces the bf16x6 decomposition on the MXU — the
    default single-pass bf16 loses ~8 mantissa bits, which is visible in
    the log-space transmittance prefixes (1e-3-level image errors).
    """
    return jax.lax.dot_general(
        a, b, dimension_numbers=(contract, ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _tile_pixel_coords(tile_idx, tiles_x):
    """Pixel-center coordinates [PIX, 1] of a tile's flattened pixels."""
    ty = tile_idx // tiles_x
    tx = tile_idx - ty * tiles_x
    sub = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    px = (tx * TILE_W + sub % TILE_W).astype(jnp.float32) + 0.5
    py = (ty * TILE_H + sub // TILE_W).astype(jnp.float32) + 0.5
    return px, py


def _geom_slices(geom):
    """Split a [GEOM_ROWS, S] chunk into the pair_alpha_depth inputs.

    Row layout (must match ``pack_geometry``): 0-8 rows of M, 9-10
    projected center, 11 center depth, 12 opacity, 13 valid flag.
    """
    m_rows = tuple(geom[i:i + 1, :] for i in range(9))
    c2d = (geom[9:10, :], geom[10:11, :])
    return m_rows, c2d, geom[11:12, :], geom[12:13, :], geom[13:14, :]


def _pair_fn(geom, px, py, znear):
    """Differentiable pair computation for one chunk: [16,S] → α,t [P,S]."""
    m_rows, c2d, depth, opac, validf = _geom_slices(geom)
    return pair_alpha_depth(m_rows, c2d, depth, opac, validf > 0.5,
                            px, py, znear)


# ----------------------------------------------------------------- forward

def _fwd_kernel(chunk_off_ref, geom_hbm, q_hbm, acc_ref, lk_ref,
                geom_buf, q_buf, state_ref, dma_sems, *, tiles_x, znear, zfar):
    # Vector state lives in VMEM refs (acc_ref / lk_ref / state_ref) and is
    # updated in place; the while_loop carries only scalars — Mosaic cannot
    # reconcile layouts of [P,1] vector loop carries.
    s = S_CHUNK
    t = pl.program_id(0)
    base = chunk_off_ref[t]
    nch = chunk_off_ref[t + 1] - base
    px, py = _tile_pixel_coords(t, tiles_x)
    m_incl = _prefix_mat(s, "incl")
    m_excl = _prefix_mat(s, "excl")
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)

    def copies(k, slot):
        start = (base + k) * s
        g = pltpu.make_async_copy(geom_hbm.at[:, pl.ds(start, s)],
                                  geom_buf.at[slot], dma_sems.at[2 * slot])
        q = pltpu.make_async_copy(q_hbm.at[:, pl.ds(start, s)],
                                  q_buf.at[slot], dma_sems.at[2 * slot + 1])
        return g, q

    def start_chunk(k, slot):
        for c in copies(k, slot):
            c.start()

    def wait_chunk(k, slot):
        for c in copies(k, slot):
            c.wait()

    acc_ref[0] = jnp.zeros((PIX, CH), jnp.float32)
    lk_ref[0] = jnp.full((PIX, 1), -1, jnp.int32)
    # state cols: 0 transmittance, 1 done flag
    state_ref[:, 0:1] = jnp.ones((PIX, 1), jnp.float32)
    state_ref[:, 1:2] = jnp.zeros((PIX, 1), jnp.float32)

    @pl.when(nch > 0)
    def _():
        start_chunk(0, 0)

    def cond(carry):
        k, alldone = carry
        return jnp.logical_and(k < nch, jnp.logical_not(alldone))

    def body(carry):
        k, _ = carry
        slot = k % 2

        @pl.when(k + 1 < nch)
        def _():
            start_chunk(k + 1, (k + 1) % 2)

        wait_chunk(k, slot)
        geom = geom_buf[slot]
        qc = q_buf[slot]
        acc = acc_ref[0]
        t_carry = state_ref[:, 0:1]
        done = state_ref[:, 1:2] > 0.5
        a_c = acc[:, 6:7]
        m1_c = acc[:, 9:10]
        m2_c = acc[:, 10:11]

        a, tdep = _pair_fn(geom, px, py, znear)        # [P, S]
        logom = jnp.log1p(-a)
        t_after = t_carry * jnp.exp(_mm(logom, m_incl, ((1,), (0,))))
        t_excl = t_carry * jnp.exp(_mm(logom, m_excl, ((1,), (0,))))

        trigger = (a > 0.0) & (t_after < T_EPS)
        dead_cnt = _mm(trigger.astype(jnp.float32), m_incl, ((1,), (0,)))
        keep = (a > 0.0) & (dead_cnt < 0.5) & jnp.logical_not(done)
        w = jnp.where(keep, a * t_excl, 0.0)

        cn = acc[:, 0:6] + _mm(w, qc[:6], ((1,), (1,)))  # [P, 6]
        wsum = jnp.sum(w, axis=1, keepdims=True)
        alpha = a_c + wsum
        deptha = acc[:, 7:8] + jnp.sum(w * tdep, axis=1, keepdims=True)

        m = map_depth(tdep, znear, zfar)
        wm = w * m
        wm2 = wm * m
        a_excl = a_c + _mm(w, m_excl, ((1,), (0,)))
        m1_excl = m1_c + _mm(wm, m_excl, ((1,), (0,)))
        m2_excl = m2_c + _mm(wm2, m_excl, ((1,), (0,)))
        dist = acc[:, 8:9] + jnp.sum(
            w * (m * m * a_excl + m2_excl - 2.0 * m * m1_excl),
            axis=1, keepdims=True)
        m1 = m1_c + jnp.sum(wm, axis=1, keepdims=True)
        m2 = m2_c + jnp.sum(wm2, axis=1, keepdims=True)

        cand = (w > 0.0) & (t_excl > MEDIAN_T)
        best = jnp.max(jnp.where(cand, iota_s, -1), axis=1, keepdims=True)
        onehot = (iota_s == best) & cand
        med = jnp.where(best >= 0,
                        jnp.sum(jnp.where(onehot, tdep, 0.0), axis=1,
                                keepdims=True), acc[:, 11:12])

        gidx = (base + k) * s + iota_s
        lk_ref[0] = jnp.maximum(
            lk_ref[0], jnp.max(jnp.where(keep, gidx, -1), axis=1,
                               keepdims=True))

        kept_logom = jnp.where(keep, logom, 0.0)
        t_out = t_carry * jnp.exp(jnp.sum(kept_logom, axis=1, keepdims=True))
        done = jnp.logical_or(done, jnp.any(trigger, axis=1, keepdims=True))

        acc_ref[0] = jnp.concatenate(
            [cn, alpha, deptha, dist, m1, m2, med], axis=1)
        state_ref[:, 0:1] = t_out
        state_ref[:, 1:2] = done.astype(jnp.float32)
        return (k + 1, jnp.all(done))

    k_end, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.bool_(False)))

    # Early termination can exit the loop with the next chunk's DMA still in
    # flight; it must be drained or its semaphore signal corrupts the next
    # grid step's waits (observed as a device abort on dense scenes).
    @pl.when(k_end < nch)
    def _():
        wait_chunk(k_end, k_end % 2)


# ---------------------------------------------------------------- backward

def _bwd_kernel(chunk_off_ref, geom_hbm, q_hbm, acc_ref, lk_ref, dacc_ref,
                dgrad_hbm, dummy_ref, geom_buf, q_buf, dgrad_buf, state_ref,
                dma_sems, *, tiles_x, znear, zfar):
    s = S_CHUNK
    t = pl.program_id(0)
    base = chunk_off_ref[t]
    nch = chunk_off_ref[t + 1] - base
    px, py = _tile_pixel_coords(t, tiles_x)
    m_sincl = _prefix_mat(s, "sincl")
    m_sexcl = _prefix_mat(s, "sexcl")
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)

    gq = dacc_ref[0][:, 0:6]                 # [P, 6]
    galpha = dacc_ref[0][:, 6:7]
    gdepth = dacc_ref[0][:, 7:8]
    gdist = dacc_ref[0][:, 8:9]
    gm1 = dacc_ref[0][:, 9:10]
    gm2 = dacc_ref[0][:, 10:11]
    a_tot = acc_ref[0][:, 6:7]
    m1_tot = acc_ref[0][:, 9:10]
    m2_tot = acc_ref[0][:, 10:11]
    lk = lk_ref[0]

    def in_copies(k, slot):
        start = (base + k) * s
        g = pltpu.make_async_copy(geom_hbm.at[:, pl.ds(start, s)],
                                  geom_buf.at[slot], dma_sems.at[3 * slot])
        q = pltpu.make_async_copy(q_hbm.at[:, pl.ds(start, s)],
                                  q_buf.at[slot], dma_sems.at[3 * slot + 1])
        return g, q

    def start_load(k, slot):
        for c in in_copies(k, slot):
            c.start()

    def wait_load(k, slot):
        for c in in_copies(k, slot):
            c.wait()

    def store_grad(k, slot):
        start = (base + k) * s
        return pltpu.make_async_copy(
            dgrad_buf.at[slot], dgrad_hbm.at[:, pl.ds(start, s)],
            dma_sems.at[3 * slot + 2])

    @pl.when(nch > 0)
    def _():
        start_load(nch - 1, (nch - 1) % 2)

    # state cols: 0 suffix transmittance U, 1 suffix Σ ωΩ
    state_ref[:, 0:1] = 1.0 - a_tot
    state_ref[:, 1:2] = jnp.zeros((PIX, 1), jnp.float32)

    def cond(k):
        return k >= 0

    def body(k):
        slot = k % 2
        u_in = state_ref[:, 0:1]
        ssuf = state_ref[:, 1:2]

        @pl.when(k > 0)
        def _():
            start_load(k - 1, (k - 1) % 2)

        wait_load(k, slot)
        geom = geom_buf[slot]
        qc = q_buf[slot]

        pair = functools.partial(_pair_fn, px=px, py=py, znear=znear)
        (a, tdep), pair_vjp = jax.vjp(pair, geom)

        gidx = (base + k) * s + iota_s
        keep = (a > 0.0) & (gidx <= lk)
        logom = jnp.log1p(-a)
        klogom = jnp.where(keep, logom, 0.0)
        # T_excl_j = T_final / Π_{kept i≥j}(1−α_i): inclusive reverse suffix
        t_excl = u_in * jnp.exp(-_mm(klogom, m_sincl, ((1,), (0,))))
        u_out = u_in * jnp.exp(-jnp.sum(klogom, axis=1, keepdims=True))
        w = jnp.where(keep, a * t_excl, 0.0)

        m = map_depth(tdep, znear, zfar)
        phi = (_mm(gq, qc[:6], ((1,), (0,))) + galpha + gdepth * tdep
               + gm1 * m + gm2 * m * m)
        psi = m * m * a_tot - 2.0 * m * m1_tot + m2_tot
        omega = phi + gdist * psi
        womega = w * omega
        ssuf_pair = ssuf + _mm(womega, m_sexcl, ((1,), (0,)))
        ssuf_out = ssuf + jnp.sum(womega, axis=1, keepdims=True)

        da = jnp.where(keep, t_excl * omega - ssuf_pair / (1.0 - a), 0.0)
        dmdt = (zfar * znear / (zfar - znear)) / jnp.maximum(tdep * tdep, 1e-12)
        dt = w * (gdepth + (gm1 + 2.0 * m * gm2
                            + 2.0 * gdist * (m * a_tot - m1_tot)) * dmdt)

        (dgeom,) = pair_vjp((da, dt))                    # [16, S]
        dq = _mm(gq, w, ((0,), (0,)))                    # [6, S]
        pad = jnp.zeros((Q_ROWS - 6, s), jnp.float32)
        dgrad_buf[slot] = jnp.concatenate([dgeom, dq, pad], axis=0)
        store = store_grad(k, slot)
        store.start()
        store.wait()

        state_ref[:, 0:1] = u_out
        state_ref[:, 1:2] = ssuf_out
        return k - 1

    jax.lax.while_loop(cond, body, nch - 1)
    dummy_ref[0, 0] = jnp.float32(0)


# ------------------------------------------------------------- public core

class AlignedDuplicates(NamedTuple):
    """Chunk-aligned duplicate stream for the kernels."""
    surfel_idx: jnp.ndarray    # [cap] int32, == n_surfels for padding slots
    chunk_offsets: jnp.ndarray  # [T+1] int32, units of chunks
    num_tiles_x: int
    num_tiles_y: int
    overflow: jnp.ndarray      # [] bool — capacity exceeded (duplicates lost)


def build_aligned(binning, n_surfels: int, s_chunk: int,
                  capacity: int) -> AlignedDuplicates:
    """Re-layout sorted duplicates so each tile's list starts chunk-aligned.

    ``binning``: TileBinning from tiles.bin_surfels. ``capacity`` is the
    static size of the aligned stream (in duplicates, multiple of s_chunk).
    Padding slots point at the sentinel surfel index ``n_surfels`` whose
    packed record is all-zero (valid=0 → never contributes; gradients
    written there are dropped by the scatter).
    """
    off = binning.tile_offsets
    counts = off[1:] - off[:-1]
    nchunks = -(-counts // s_chunk)
    chunk_off_raw = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(nchunks).astype(jnp.int32)])
    # Clamp to capacity so an overflow degrades (tail tiles lose their
    # furthest duplicates) instead of DMA-ing out of bounds on device.
    chunk_off = jnp.minimum(chunk_off_raw, capacity // s_chunk)

    d_flat = binning.sorted_surfel.shape[0]
    entry_tile = jnp.searchsorted(off, jnp.arange(d_flat, dtype=jnp.int32),
                                  side="right").astype(jnp.int32) - 1
    entry_tile = jnp.clip(entry_tile, 0, counts.shape[0] - 1)
    pos = chunk_off[entry_tile] * s_chunk + (
        jnp.arange(d_flat, dtype=jnp.int32) - off[entry_tile])
    pos = jnp.where(binning.sorted_valid, pos, capacity)

    aligned = jnp.full((capacity + 1,), n_surfels, jnp.int32)
    aligned = aligned.at[pos].set(binning.sorted_surfel, mode="drop")
    overflow = chunk_off_raw[-1] * s_chunk > capacity
    return AlignedDuplicates(surfel_idx=aligned[:capacity],
                             chunk_offsets=chunk_off,
                             num_tiles_x=binning.tiles_x,
                             num_tiles_y=binning.tiles_y,
                             overflow=overflow)


def pack_geometry(sur, n_surfels: int):
    """SurfelScreen → per-surfel packed records + channel rows.

    Returns (geomT [GEOM_ROWS, N+1], qT [Q_ROWS, N+1]); column N is the
    zero padding record gathered by alignment-padding slots.
    """
    m_flat = sur.M.reshape(n_surfels, 9)
    validf = sur.valid.astype(jnp.float32)
    cols = [m_flat, sur.center2d, sur.depth[:, None], sur.opacity[:, None],
            validf[:, None]]
    geom = jnp.concatenate(cols, axis=1)
    pad_cols = GEOM_ROWS - geom.shape[1]
    geom = jnp.concatenate([geom, jnp.zeros((n_surfels, pad_cols))], axis=1)
    geom = jnp.concatenate([geom, jnp.zeros((1, GEOM_ROWS))], axis=0)

    c = sur.color.shape[-1]
    q = jnp.concatenate([sur.color, sur.normal,
                         jnp.zeros((n_surfels, Q_ROWS - 3 - c))], axis=1)
    q = jnp.concatenate([q, jnp.zeros((1, Q_ROWS))], axis=0)
    return geom.T, q.T


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def blend_core(geomT, qT, chunk_offsets, num_tiles, tiles_x, settings,
               interpret=False):
    """Pallas blend over aligned duplicates.

    geomT [GEOM_ROWS, cap] f32 (aligned duplicate records), qT [Q_ROWS, cap],
    chunk_offsets [T+1] int32. Returns (acc [T, PIX, CH], lk [T, PIX, 1]).
    """
    return _blend_fwd_call(geomT, qT, chunk_offsets, num_tiles, tiles_x,
                           settings, interpret)


def _blend_fwd_call(geomT, qT, chunk_offsets, num_tiles, tiles_x, settings,
                    interpret):
    kern = functools.partial(_fwd_kernel, tiles_x=tiles_x,
                             znear=settings.znear, zfar=settings.zfar)
    acc, lk = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(num_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                      pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=[
                pl.BlockSpec((1, PIX, CH), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, PIX, 1), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, GEOM_ROWS, S_CHUNK), jnp.float32),
                pltpu.VMEM((2, Q_ROWS, S_CHUNK), jnp.float32),
                pltpu.VMEM((PIX, 8), jnp.float32),
                pltpu.SemaphoreType.DMA((4,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, PIX, CH), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, PIX, 1), jnp.int32),
        ],
        interpret=interpret,
    )(chunk_offsets, geomT, qT)
    return acc, lk


def _blend_fwd(geomT, qT, chunk_offsets, num_tiles, tiles_x, settings,
               interpret):
    acc, lk = _blend_fwd_call(geomT, qT, chunk_offsets, num_tiles, tiles_x,
                              settings, interpret)
    return (acc, lk), (geomT, qT, chunk_offsets, acc, lk)


def _blend_bwd(num_tiles, tiles_x, settings, interpret, res, cts):
    geomT, qT, chunk_offsets, acc, lk = res
    dacc, _ = cts
    cap = geomT.shape[1]
    kern = functools.partial(_bwd_kernel, tiles_x=tiles_x,
                             znear=settings.znear, zfar=settings.zfar)
    dgrad, _ = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec((1, PIX, CH), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, PIX, 1), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, PIX, CH), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec((1, 1), lambda t, *_: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, GEOM_ROWS, S_CHUNK), jnp.float32),
                pltpu.VMEM((2, Q_ROWS, S_CHUNK), jnp.float32),
                pltpu.VMEM((2, DG_ROWS, S_CHUNK), jnp.float32),
                pltpu.VMEM((PIX, 8), jnp.float32),
                pltpu.SemaphoreType.DMA((6,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((DG_ROWS, cap), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(chunk_offsets, geomT, qT, acc, lk, dacc)

    dgeomT = dgrad[:GEOM_ROWS]
    dqT = dgrad[GEOM_ROWS:]
    return dgeomT, dqT, None


blend_core.defvjp(_blend_fwd, _blend_bwd)
