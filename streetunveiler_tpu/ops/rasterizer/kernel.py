"""Pallas TPU forward/backward 2DGS blend kernels.

The TPU-native replacement for the reference's CUDA tile renderer
(SURVEY.md §2.3 N1, §3.5) — designed for the hardware, not translated:

* 16×32 pixel tiles → P=512 pixels on *sublanes*; surfel chunks of S=128
  on *lanes*. With surfels on lanes, per-duplicate records stream from
  HBM as lane-aligned [24, 128] slices of one transposed [24, cap] array
  — a single DMA per chunk, no gathers and no relayouts on-chip.
* Host-side index plumbing is strictly *row-major*: the per-duplicate
  record table is gathered as [cap, 24] rows (TPU gathers/scatters are
  slice-granular along the leading axis; a lane-axis gather of the same
  data costs ~20× more) and transposed once for the kernel.
* Pair math (ray–plane intersection, Gaussian falloff) on the VPU via the
  shared ``blendmath`` formulas; broadcasting [1,S] × [P,1] → [P,S].
* Front-to-back transmittance via *triangular matmuls on the MXU*:
  cumulative products in log space and distortion prefix sums —
  [512,128]×[128,128] matmuls at Precision.HIGHEST (single-pass bf16
  visibly corrupts the log-space prefixes).
* Early termination: exact reference semantics (a surfel that would push
  T below 1e-4 is dropped and freezes the pixel); the tile stops once
  every pixel is done, draining the in-flight DMA (an undrained DMA
  corrupts the next grid step's semaphores — device abort).
* Backward runs in *reverse* chunk order with suffix accumulators — no
  replay buffers. Forward saves one int32 per pixel (the last composited
  duplicate index, CUDA's ``n_contrib``) so the backward reconstructs the
  exact composited set. Per-pair input gradients come from ``jax.vjp`` of
  the shared pair function *inside* the kernel, so forward and backward
  can never drift apart. The distortion backward needs only per-pixel
  totals (∂L/∂m_k = 2ω_k(m_k·A_tot − M1_tot)) saved in the forward
  accumulator — no extra residuals.

Packed per-duplicate record rows (REC=24; must match ``pack_geometry``):
  0-8 rows of M, 9-10 projected center, 11 center depth, 12 opacity,
  13 valid flag, 14-16 color, 17-19 view normal, 20-23 pad.

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
TILE_W = 32
PIX = TILE_H * TILE_W          # 512 pixels (sublanes) per tile
S_CHUNK = 128                  # surfels (lanes) per chunk
REC = 24                       # packed per-duplicate record rows
Q_ROW0 = 14                    # first channel row (color) within the record
CH = 12                        # accumulator channels (see module docstring)


def _prefix_mat(s, mode, dtype=jnp.float32):
    """[S,S] matmul operand for prefix/suffix sums along the lane axis.

    For X [P,S]: (X @ M)[p,i] = Σ_j X[p,j]·M[j,i]. mode selects M[j,i]:
    'incl' j≤i, 'excl' j<i (prefix), 'sincl' j≥i, 'sexcl' j>i (suffix).
    """
    j = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    i = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    op = {"incl": j <= i, "excl": j < i, "sincl": j >= i, "sexcl": j > i}[mode]
    return op.astype(dtype)


def _mm(a, b, contract, precision=jax.lax.Precision.HIGHEST):
    """dot_general with f32 accumulation; contract = ((lhs,), (rhs,)).

    Transmittance prefixes need ≥bf16x3 passes on the MXU (single-pass
    bf16 loses ~8 mantissa bits → 1e-3-level image errors); regularizer
    prefixes (distortion) tolerate the fast path.
    """
    return jax.lax.dot_general(
        a, b, dimension_numbers=(contract, ((), ())),
        preferred_element_type=jnp.float32, precision=precision)


_FAST = jax.lax.Precision.DEFAULT


def _tile_pixel_coords(tile_idx, tiles_x):
    """Pixel-center coordinates [PIX, 1] of a tile's flattened pixels."""
    ty = tile_idx // tiles_x
    tx = tile_idx - ty * tiles_x
    sub = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    px = (tx * TILE_W + sub % TILE_W).astype(jnp.float32) + 0.5
    py = (ty * TILE_H + sub // TILE_W).astype(jnp.float32) + 0.5
    return px, py


def _pair_fn(chunk, px, py, znear):
    """Differentiable pair computation for one chunk: [REC,S] → α,t [P,S].

    Reads the geometry rows (0-13) of the packed record."""
    m_rows = tuple(chunk[i:i + 1, :] for i in range(9))
    c2d = (chunk[9:10, :], chunk[10:11, :])
    return pair_alpha_depth(m_rows, c2d, chunk[11:12, :], chunk[12:13, :],
                            chunk[13:14, :] > 0.5, px, py, znear)


# ----------------------------------------------------------------- forward
#
# The grid is the CHUNK STREAM, not the tile list: grid=(total_chunks,),
# one straight-line kernel body per 128-surfel chunk, records delivered by
# the standard Pallas block pipeline (auto double-buffered). Consecutive
# chunks of the same tile revisit the same output block, which Pallas keeps
# resident in VMEM (the matmul-accumulator pattern); per-pixel carry state
# (transmittance, done flag) lives in scratch that persists across grid
# steps and is reset on each tile's first chunk. A dynamic while_loop +
# manual-DMA formulation of the same algorithm measured ~270µs/chunk in
# loop overhead; this pipelined form removes it entirely.

def _fwd_kernel(tile_of_ref, first_ref, rec_ref, acc_ref, lk_ref,
                state_ref, *, tiles_x, znear, zfar):
    s = S_CHUNK
    c = pl.program_id(0)
    tile = tile_of_ref[c]
    is_first = first_ref[c] > 0
    px, py = _tile_pixel_coords(tile, tiles_x)
    m_excl = _prefix_mat(s, "excl")
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)

    @pl.when(is_first)
    def _():
        acc_ref[0] = jnp.zeros((PIX, CH), jnp.float32)
        lk_ref[0] = jnp.full((PIX, 1), -1, jnp.int32)
        # state cols: 0 transmittance, 1 done flag
        state_ref[:, 0:1] = jnp.ones((PIX, 1), jnp.float32)
        state_ref[:, 1:2] = jnp.zeros((PIX, 1), jnp.float32)

    alldone = state_ref[0, 1] > 1.5      # sentinel: every pixel done
    skip = jnp.logical_or(alldone, first_ref[c] < 0)  # −1 = tail chunk

    @pl.when(jnp.logical_not(skip))
    def _():
        chunk = rec_ref[:, :]
        qc = chunk[Q_ROW0:Q_ROW0 + 6]
        acc = acc_ref[0]
        t_carry = state_ref[:, 0:1]
        done = state_ref[:, 1:2] > 0.5

        a, tdep = _pair_fn(chunk, px, py, znear)        # [P, S]
        logom = jnp.log1p(-a)
        t_excl = t_carry * jnp.exp(_mm(logom, m_excl, ((1,), (0,))))
        t_after = t_excl * (1.0 - a)

        # Early-termination set without a prefix pass: T is monotone along
        # the chunk for a live pixel, so every contributing pair at or
        # after the first trigger has t_after < T_EPS itself (the oracle's
        # cumulative-trigger formulation is equivalent; parity-tested).
        keep = (a > 0.0) & (t_after >= T_EPS) & jnp.logical_not(done)
        trigger_any = jnp.any((a > 0.0) & (t_after < T_EPS), axis=1,
                              keepdims=True)
        w = jnp.where(keep, a * t_excl, 0.0)

        a_c = acc[:, 6:7]
        m1_c = acc[:, 9:10]
        m2_c = acc[:, 10:11]
        cn = acc[:, 0:6] + _mm(w, qc, ((1,), (1,)))     # [P, 6]
        wsum = jnp.sum(w, axis=1, keepdims=True)
        alpha = a_c + wsum
        deptha = acc[:, 7:8] + jnp.sum(w * tdep, axis=1, keepdims=True)

        m = map_depth(tdep, znear, zfar)
        wm = w * m
        wm2 = wm * m
        a_excl = a_c + _mm(w, m_excl, ((1,), (0,)), _FAST)
        m1_excl = m1_c + _mm(wm, m_excl, ((1,), (0,)), _FAST)
        m2_excl = m2_c + _mm(wm2, m_excl, ((1,), (0,)), _FAST)
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

        gidx = c * s + iota_s
        lk_ref[0] = jnp.maximum(
            lk_ref[0], jnp.max(jnp.where(keep, gidx, -1), axis=1,
                               keepdims=True))

        kept_logom = jnp.where(keep, logom, 0.0)
        t_out = t_carry * jnp.exp(jnp.sum(kept_logom, axis=1, keepdims=True))
        done = jnp.logical_or(done, trigger_any)

        acc_ref[0] = jnp.concatenate(
            [cn, alpha, deptha, dist, m1, m2, med], axis=1)
        state_ref[:, 0:1] = t_out
        # done-flag doubles as the tile-wide skip sentinel (2.0)
        done_f = done.astype(jnp.float32)
        state_ref[:, 1:2] = jnp.where(jnp.all(done), done_f + 1.0, done_f)


# ---------------------------------------------------------------- backward
#
# Same pipelined chunk-stream structure as the forward, iterated in
# REVERSE (grid step c' processes chunk capC−1−c'); suffix state resets on
# each tile's *last* chunk (the first one visited in reverse). Sentinel
# tail chunks produce zero gradients and pass state through unchanged, so
# re-initializing at the true last chunk after the tail is a no-op.

def _bwd_kernel(tile_of_ref, last_ref, rec_ref, acc_ref, lk_ref, dacc_ref,
                dgrad_ref, state_ref, *, num_chunks, tiles_x, znear, zfar):
    s = S_CHUNK
    c = num_chunks - 1 - pl.program_id(0)
    tile = tile_of_ref[c]
    px, py = _tile_pixel_coords(tile, tiles_x)
    m_sexcl = _prefix_mat(s, "sexcl")
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)

    a_tot = acc_ref[0][:, 6:7]

    @pl.when(last_ref[c] > 0)
    def _():
        # state cols: 0 suffix transmittance U, 1 suffix Σ ωΩ
        state_ref[:, 0:1] = 1.0 - a_tot
        state_ref[:, 1:2] = jnp.zeros((PIX, 1), jnp.float32)

    # tail sentinel chunks only need zero gradients
    @pl.when(last_ref[c] < 0)
    def _():
        dgrad_ref[:, :] = jnp.zeros((REC, s), jnp.float32)

    @pl.when(last_ref[c] >= 0)
    def _():
        _bwd_chunk(c, tile_of_ref, rec_ref, acc_ref, lk_ref, dacc_ref,
                   dgrad_ref, state_ref, px, py, m_sexcl, iota_s,
                   znear, zfar)


def _bwd_chunk(c, tile_of_ref, rec_ref, acc_ref, lk_ref, dacc_ref,
               dgrad_ref, state_ref, px, py, m_sexcl, iota_s, znear, zfar):
    s = S_CHUNK
    a_tot = acc_ref[0][:, 6:7]
    gq = dacc_ref[0][:, 0:6]                 # [P, 6]
    galpha = dacc_ref[0][:, 6:7]
    gdepth = dacc_ref[0][:, 7:8]
    gdist = dacc_ref[0][:, 8:9]
    gm1 = dacc_ref[0][:, 9:10]
    gm2 = dacc_ref[0][:, 10:11]
    m1_tot = acc_ref[0][:, 9:10]
    m2_tot = acc_ref[0][:, 10:11]
    lk = lk_ref[0]
    u_in = state_ref[:, 0:1]
    ssuf = state_ref[:, 1:2]

    chunk = rec_ref[:, :]
    qc = chunk[Q_ROW0:Q_ROW0 + 6]

    pair = functools.partial(_pair_fn, px=px, py=py, znear=znear)
    (a, tdep), pair_vjp = jax.vjp(pair, chunk)

    gidx = c * s + iota_s
    keep = (a > 0.0) & (gidx <= lk)
    logom = jnp.log1p(-a)
    klogom = jnp.where(keep, logom, 0.0)
    # T_excl_j = T_final / Π_{kept i≥j}(1−α_i): inclusive reverse suffix
    t_excl = u_in * jnp.exp(-(_mm(klogom, m_sexcl, ((1,), (0,)))
                              + klogom))
    u_out = u_in * jnp.exp(-jnp.sum(klogom, axis=1, keepdims=True))
    w = jnp.where(keep, a * t_excl, 0.0)

    m = map_depth(tdep, znear, zfar)
    phi = (_mm(gq, qc, ((1,), (0,))) + galpha + gdepth * tdep
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

    (drec,) = pair_vjp((da, dt))                     # [REC, S]
    dq = _mm(gq, w, ((0,), (0,)))                    # [6, S]
    dgrad_ref[:, :] = jnp.concatenate(
        [drec[:Q_ROW0], drec[Q_ROW0:Q_ROW0 + 6] + dq,
         drec[Q_ROW0 + 6:]], axis=0)

    state_ref[:, 0:1] = u_out
    state_ref[:, 1:2] = ssuf_out


# ------------------------------------------------------------- public core

class AlignedDuplicates(NamedTuple):
    """Chunk-aligned duplicate stream + chunk metadata for the kernels."""
    surfel_idx: jnp.ndarray    # [cap] int32, == n_surfels for padding slots
    chunk_offsets: jnp.ndarray  # [T+1] int32, units of chunks
    tile_of_chunk: jnp.ndarray  # [cap_chunks] int32
    first_of_tile: jnp.ndarray  # [cap_chunks] int32 1 = tile's first chunk
    last_of_tile: jnp.ndarray   # [cap_chunks] int32 1 = tile's last chunk
    num_tiles_x: int
    num_tiles_y: int
    overflow: jnp.ndarray      # [] bool — capacity exceeded (duplicates lost)


def build_aligned(binning, n_surfels: int, s_chunk: int,
                  capacity: int) -> AlignedDuplicates:
    """Re-layout sorted duplicates so each tile's list starts chunk-aligned.

    ``binning``: TileBinning from tiles.bin_surfels. ``capacity`` is the
    static size of the aligned stream (in duplicates, multiple of s_chunk).
    Every tile owns at least one chunk (so its output block gets
    initialized); padding slots point at the sentinel surfel index
    ``n_surfels`` whose packed record is all-zero (valid=0 → never
    contributes, zero gradients → dropped by the scatter).
    """
    off = binning.tile_offsets
    counts = off[1:] - off[:-1]
    nchunks = jnp.maximum(-(-counts // s_chunk), 1)
    chunk_off_raw = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(nchunks).astype(jnp.int32)])
    # Clamp to capacity so an overflow degrades (tail tiles lose their
    # furthest duplicates) instead of DMA-ing out of bounds on device.
    cap_chunks = capacity // s_chunk
    chunk_off = jnp.minimum(chunk_off_raw, cap_chunks)

    # Gather formulation (TPU scatters serialize; a capacity-sized scatter
    # costs ~1s at street scale). For every aligned slot, compute its
    # source entry in the depth-sorted duplicate stream:
    #   tile_of_chunk via a tiny scatter+cumsum over [cap_chunks],
    #   src = off[tile] + (slot − chunk_off[tile]·s).
    marks = jnp.zeros((cap_chunks,), jnp.int32).at[chunk_off[1:-1]].add(
        1, mode="drop")
    tile_of_chunk = jnp.cumsum(marks)
    n_tiles = counts.shape[0]
    tile_of_chunk = jnp.minimum(tile_of_chunk, n_tiles - 1)

    cidx = jnp.arange(cap_chunks, dtype=jnp.int32)
    # −1 marks stream-tail sentinel chunks: the kernels skip their compute
    first_of_tile = jnp.where(
        cidx >= chunk_off[-1], jnp.int32(-1),
        (cidx == chunk_off[tile_of_chunk]).astype(jnp.int32))
    # reverse-iteration state reset at a tile's true last chunk; tail
    # sentinels are skipped (−1) and only emit zero gradients
    last_of_tile = jnp.where(
        cidx >= chunk_off[-1], jnp.int32(-1),
        (cidx == chunk_off[tile_of_chunk + 1] - 1).astype(jnp.int32))

    slot = jnp.arange(capacity, dtype=jnp.int32)
    t_of = tile_of_chunk[slot // s_chunk]
    local = slot - chunk_off[t_of] * s_chunk
    in_tile = (local >= 0) & (local < counts[t_of]) & (
        slot < chunk_off[-1] * s_chunk)
    src = jnp.clip(off[t_of] + local, 0, binning.sorted_surfel.shape[0] - 1)
    gathered = binning.sorted_surfel[src]
    valid = in_tile & binning.sorted_valid[src]
    aligned = jnp.where(valid, gathered, n_surfels)

    overflow = chunk_off_raw[-1] > cap_chunks
    return AlignedDuplicates(surfel_idx=aligned,
                             chunk_offsets=chunk_off,
                             tile_of_chunk=tile_of_chunk,
                             first_of_tile=first_of_tile,
                             last_of_tile=last_of_tile,
                             num_tiles_x=binning.tiles_x,
                             num_tiles_y=binning.tiles_y,
                             overflow=overflow)


def pack_geometry(sur, n_surfels: int):
    """SurfelScreen → per-surfel packed records, ROW-major [N+1, REC].

    Row N is the zero padding record gathered by alignment-padding slots.
    The caller gathers rows by duplicate index (slice-granular, fast on
    TPU) and transposes once for the kernels.
    """
    m_flat = sur.M.reshape(n_surfels, 9)
    validf = sur.valid.astype(jnp.float32)
    cols = [m_flat, sur.center2d, sur.depth[:, None], sur.opacity[:, None],
            validf[:, None], sur.color, sur.normal]
    rec = jnp.concatenate(cols, axis=1)
    pad = REC - rec.shape[1]
    rec = jnp.concatenate([rec, jnp.zeros((n_surfels, pad))], axis=1)
    return jnp.concatenate([rec, jnp.zeros((1, REC))], axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def blend_core(recT, tile_of_chunk, first_of_tile, last_of_tile,
               num_tiles, tiles_x, settings, interpret=False):
    """Pallas blend over the aligned duplicate chunk stream.

    recT [REC, cap] f32 (lane-major records); tile_of_chunk /
    first_of_tile / last_of_tile [cap_chunks] int32 (see build_aligned).
    Returns (acc [T, PIX, CH], lk [T, PIX, 1]).
    """
    return _blend_fwd_call(recT, tile_of_chunk, first_of_tile,
                           num_tiles, tiles_x, settings, interpret)


def _blend_fwd_call(recT, tile_of_chunk, first_of_tile, num_tiles, tiles_x,
                    settings, interpret):
    cap_chunks = tile_of_chunk.shape[0]
    kern = functools.partial(_fwd_kernel, tiles_x=tiles_x,
                             znear=settings.znear, zfar=settings.zfar)
    acc, lk = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(cap_chunks,),
            in_specs=[pl.BlockSpec((REC, S_CHUNK), lambda c, *_: (0, c),
                                   memory_space=pltpu.VMEM)],
            out_specs=[
                pl.BlockSpec((1, PIX, CH),
                             lambda c, tile_of, first: (tile_of[c], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, PIX, 1),
                             lambda c, tile_of, first: (tile_of[c], 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((PIX, 8), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, PIX, CH), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, PIX, 1), jnp.int32),
        ],
        interpret=interpret,
    )(tile_of_chunk, first_of_tile, recT)
    return acc, lk


def _blend_fwd(recT, tile_of_chunk, first_of_tile, last_of_tile,
               num_tiles, tiles_x, settings, interpret=False):
    acc, lk = _blend_fwd_call(recT, tile_of_chunk, first_of_tile,
                              num_tiles, tiles_x, settings, interpret)
    return (acc, lk), (recT, tile_of_chunk, last_of_tile, acc, lk)


def _blend_bwd(num_tiles, tiles_x, settings, interpret, res, cts):
    recT, tile_of_chunk, last_of_tile, acc, lk = res
    dacc, _ = cts
    cap_chunks = tile_of_chunk.shape[0]
    kern = functools.partial(_bwd_kernel, num_chunks=cap_chunks,
                             tiles_x=tiles_x,
                             znear=settings.znear, zfar=settings.zfar)
    rev = lambda c: cap_chunks - 1 - c
    dgrad = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(cap_chunks,),
            in_specs=[
                pl.BlockSpec((REC, S_CHUNK),
                             lambda c, *_: (0, rev(c)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, PIX, CH),
                             lambda c, tile_of, last: (tile_of[rev(c)], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, PIX, 1),
                             lambda c, tile_of, last: (tile_of[rev(c)], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, PIX, CH),
                             lambda c, tile_of, last: (tile_of[rev(c)], 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((REC, S_CHUNK), lambda c, *_: (0, rev(c)),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((PIX, 8), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((REC, cap_chunks * S_CHUNK), jnp.float32),
        ],
        interpret=interpret,
    )(tile_of_chunk, last_of_tile, recT, acc, lk, dacc)[0]

    return dgrad, None, None, None


blend_core.defvjp(_blend_fwd, _blend_bwd)
