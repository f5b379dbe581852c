"""Pallas TPU forward/backward 2DGS blend kernels (visit-stream design).

The TPU-native replacement for the reference's CUDA tile renderer
(SURVEY.md §2.3 N1, §3.5) — designed for the hardware, not translated:

* 16×32 pixel tiles → P=512 pixels on *sublanes*; surfel chunks of S=128
  on *lanes*. Per-duplicate records stream from HBM as lane-aligned
  [24, 128] slices of one [24, cap] array — one DMA per chunk, no gathers
  and no relayouts on-chip.
* The grid iterates over (tile, chunk) VISITS of a *compact* sorted
  duplicate stream (tiles.bin_surfels_stream): chunks may span tile
  boundaries, handled by per-visit lane ranges. This removed the round-1
  tile-aligned re-layout whose per-duplicate gathers dominated the step
  (XLA:TPU gathers cost ~12ns/index regardless of row width).
* Pair math (ray–plane intersection, Gaussian falloff) on the VPU via the
  shared ``blendmath`` formulas; broadcasting [1,S] × [P,1] → [P,S].
* Front-to-back transmittance via ONE log-space prefix matmul on the MXU,
  in f32-faithful precision from two DEFAULT-precision (bf16-input)
  passes over an exact hi/lo mantissa split (Precision.HIGHEST spends 6
  passes for the same accuracy class; measured 1.7µs vs 0.6µs per chunk).
* The depth-distortion regularizer needs NO prefix at all: the ordered
  pairwise sum telescopes to ``alpha·M2 − M1²`` per pixel (symmetric-pair
  identity), computed from accumulated totals outside the kernel — its
  backward arrives through the alpha/m1/m2 channel cotangents for free.
  Round 1 spent 3 of its 4 prefix matmuls on this term.
* Low-rank contractions (6-channel color/normal payload, gq·qc, dq) are
  lane/sublane VPU reductions, not matmuls — the MXU pads N to 128, so a
  [512,128]@[128,6] matmul costs as much as a full [512,128]@[128,128].
* Early termination: exact reference semantics (a surfel that would push
  T below 1e-4 is dropped and freezes the pixel); a tile-wide done
  sentinel skips the tile's remaining visits.
* Backward runs in *reverse* visit order with suffix accumulators — no
  replay buffers. Forward saves one int32 per pixel (the last composited
  duplicate index, CUDA's ``n_contrib``). Per-pair input gradients come
  from ``jax.vjp`` of the shared pair function *inside* the kernel, so
  forward and backward can never drift apart. Per-chunk gradient blocks
  accumulate across the chunk's (consecutive) visits.

Packed per-duplicate record rows (REC=16; must match ``pack_geometry_T``):
  0-2 M's first column (K'a), 3-5 M's second column (K'b), 6-7 projected
  center, 8 center depth, 9 opacity (0 ⇒ invalid — the valid flag is
  folded in), 10-12 color, 13-15 view normal.
  M's THIRD column is (c2d_x·z, c2d_y·z, z) by construction
  (preprocess.py col_c), so the kernels rebuild it from rows 6-8 with
  two multiplies instead of carrying 3 more rows — together with the
  valid fold and the 8-row alignment this shrinks the record from 24 to
  16 rows: −33% on the per-duplicate gather and the record DMA stream.

Channel layout of the per-tile accumulator output [PIX, CH=12]:
  0-2 color, 3-5 view-space normal, 6 alpha, 7 expected-depth accum,
  8 unused (distortion is alpha·m2−m1², computed by the caller),
  9 m1 (Σωm), 10 m2 (Σωm²), 11 median depth.

With ``n_gates=G`` the same pass additionally runs G per-class gated
transmittance chains (the reference's 5 per-class distortion
rasterizations, train.py:94-105) sharing the pair math, records, grid
and — in the backward — the single pair vjp; 4 channels per class
(alpha_g, m1_g, m2_g, lk_g) append after the main layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .blendmath import map_depth, pair_alpha_depth
from .types import MEDIAN_T, T_EPS

TILE_H = 16
TILE_W = 32
PIX = TILE_H * TILE_W          # 512 pixels (sublanes) per tile. Measured
#                                tradeoff: 16×16 tiles cut pair work 19%
#                                but grow duplicates 49% (gather+sort);
#                                32×16 is the total-work sweet spot.
S_CHUNK = 128                  # surfels (lanes) per chunk
Q_ROW0 = 10                    # first payload row (color) within the record
NQ = 6                         # default payload channels (3 color + 3 normal)
REC = 16                       # record rows at the default NQ
CH = 12                        # accumulator channels at the default NQ


def rec_for(nq: int) -> int:
    """Packed record rows for an nq-channel payload (8-sublane aligned)."""
    return -(-(Q_ROW0 + nq) // 8) * 8


def ch_for(nq: int) -> int:
    """Accumulator channels: nq payload + alpha, expected-depth, spare,
    m1, m2, median (same tail layout at every nq)."""
    return nq + 6


def _prefix_mat(s, mode, dtype=jnp.float32):
    """[S,S] matmul operand for prefix/suffix sums along the lane axis.

    For X [P,S]: (X @ M)[p,i] = Σ_j X[p,j]·M[j,i]. mode selects M[j,i]:
    'incl' j≤i, 'excl' j<i (prefix), 'sincl' j≥i, 'sexcl' j>i (suffix).
    """
    j = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    i = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    op = {"incl": j <= i, "excl": j < i, "sincl": j >= i, "sexcl": j > i}[mode]
    return op.astype(dtype)


def _mm(a, b):
    """[P,S]@[S,S] with f32 accumulation, DEFAULT (single-pass bf16) MXU."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=((((1,), (0,))), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)


def _sexcl2_mat(s, dtype=jnp.float32):
    """Block-diagonal strict-suffix matrix [2S,2S]: two independent [S,S]
    'sexcl' blocks, so ONE matmul computes suffix counts for two masks
    stacked along the lane axis (used by the last-contributor trick)."""
    jj = jax.lax.broadcasted_iota(jnp.int32, (2 * s, 2 * s), 0)
    ii = jax.lax.broadcasted_iota(jnp.int32, (2 * s, 2 * s), 1)
    return (((jj // s) == (ii // s)) & ((jj % s) > (ii % s))).astype(dtype)


def _mm_precise(a, b):
    """f32-faithful [P,S]@[S,S] from 2 DEFAULT passes on a hi/lo split.

    ``b`` must be exactly bf16-representable (the 0/1 prefix matrices are).
    hi keeps the top 8 mantissa bits via an integer mask (no bf16 vreg
    relayout, which is what makes .astype(bf16) splits slow on TPU);
    hi converts to bf16 losslessly inside the MXU, and |lo| ≤ 2⁻⁸|a| so
    its single-pass error is ≤ 2⁻¹⁶ relative — f32-class for ≤128 terms.

    This error does NOT compound across a tile's chunk chain: the
    transmittance CARRY (``t_out``) is an exact VPU lane sum, so the
    matmul only shapes the per-pair weights within one chunk (a 3-pass
    fully-exact split was tried round 4 and measured zero parity benefit
    — the residual kernel-vs-oracle drift is the early-termination
    knife-edge, see tools/verify_device_parity.py — at +1 MXU pass).
    """
    bits = jax.lax.bitcast_convert_type(a, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(bits & jnp.uint32(0xFFFF0000),
                                      jnp.float32)
    return _mm(hi, b) + _mm(a - hi, b)


def _hi8(a):
    """Top-8-mantissa part of f32 (exactly bf16-representable)."""
    bits = jax.lax.bitcast_convert_type(a, jnp.uint32)
    return jax.lax.bitcast_convert_type(bits & jnp.uint32(0xFFFF0000),
                                        jnp.float32)


def _mmT3(a, b):
    """[P,S] × [Q,S] → [P,Q] contracting the lane axis, f32-faithful from
    3 DEFAULT passes on hi/lo splits of BOTH operands (arbitrary f32 data,
    unlike ``_mm_precise``'s exact-bf16 ``b``). hi·hi, hi·lo, lo·hi are
    each exact products (8-bit × 8-bit mantissas) accumulated in f32; the
    dropped lo·lo term is ≤ 2⁻¹⁶ relative — the same accuracy class as
    ``_mm_precise``. No transpose: dot_general contracts b's axis 1."""
    dot = lambda x, y: jax.lax.dot_general(
        x, y, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    ah = _hi8(a)
    bh = _hi8(b)
    return dot(ah, bh) + (dot(ah, b - bh) + dot(a - ah, bh))


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

    Reads the geometry rows (0-9) of the packed record, rebuilding M's
    third column (c2d_x·z, c2d_y·z, z) from center2d and depth — exact:
    these are the same f32 products the preprocess computed (col_c), and
    the VJP through the reconstruction flows to the center2d/depth rows
    automatically via the shared ``jax.vjp`` of this function."""
    c2dx, c2dy = chunk[6:7, :], chunk[7:8, :]
    z = chunk[8:9, :]
    opac = chunk[9:10, :]
    # m_rows are ROWS of M: r_i = (colA_i, colB_i, colC_i)
    m_rows = (chunk[0:1, :], chunk[3:4, :], c2dx * z,
              chunk[1:2, :], chunk[4:5, :], c2dy * z,
              chunk[2:3, :], chunk[5:6, :], z)
    return pair_alpha_depth(m_rows, (c2dx, c2dy), z, opac,
                            opac > 0.0, px, py, znear)


def _payload_sums(w, qc, nq):
    """Σ_s w·qc_k per pixel, exact f32 lane reductions → [P, nq]."""
    return jnp.concatenate(
        [jnp.sum(w * qc[k:k + 1, :], axis=1, keepdims=True)
         for k in range(nq)], axis=1)


# ----------------------------------------------------------------- forward
#
# grid=(v_cap,): one straight-line kernel body per visit, records delivered
# by the standard Pallas block pipeline (auto double-buffered) through the
# chunk_of_visit block map. A tile's visits are consecutive, so its output
# blocks and carry scratch (transmittance, done flag) stay resident; state
# resets on the tile's first visit. A dynamic while_loop + manual-DMA
# formulation of the same algorithm measured ~270µs/chunk in loop overhead;
# this pipelined form removes it entirely.

def _fwd_kernel(tile_of_ref, chunk_of_ref, first_ref, lo_ref, hi_ref,
                rec_ref, acc_ref, lk_ref, state_ref, *, tiles_x, znear,
                zfar, t_eps=T_EPS, nq=NQ, n_gates=0, gate_row=0):
    ch = ch_for(nq)
    s = S_CHUNK
    G = n_gates
    v = pl.program_id(0)
    px, py = _tile_pixel_coords(tile_of_ref[v], tiles_x)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)

    @pl.when(first_ref[v] > 0)
    def _():
        acc_ref[0] = jnp.zeros_like(acc_ref[0])
        lk_ref[0] = jnp.full((PIX, 1), -1, jnp.int32)
        # state cols: 0 transmittance, 1 done flag, then per gated class
        # (2+g transmittance, 2+G+g done)
        state_ref[:, 0:1] = jnp.ones((PIX, 1), jnp.float32)
        state_ref[:, 1:2] = jnp.zeros((PIX, 1), jnp.float32)
        for g in range(G):
            acc_ref[0, :, ch + 4 * g + 3:ch + 4 * g + 4] = jnp.full(
                (PIX, 1), -1.0, jnp.float32)   # per-class lk starts at −1
        if G:
            state_ref[:, 2:2 + G] = jnp.ones((PIX, G), jnp.float32)
            state_ref[:, 2 + G:2 + 2 * G] = jnp.zeros((PIX, G), jnp.float32)

    alldone = state_ref[0, 1] > 1.5      # sentinel: every chain done
    # skips: −1 = sentinel visit; lo==hi = empty init-only visit (a tile
    # with no duplicates — its block zeroing above is the entire job)
    skip = jnp.logical_or(jnp.logical_or(alldone, first_ref[v] < 0),
                          hi_ref[v] <= lo_ref[v])

    @pl.when(jnp.logical_not(skip))
    def _():
        chunk = rec_ref[:, :]
        qc = chunk[Q_ROW0:Q_ROW0 + nq]
        acc = acc_ref[0]
        t_carry = state_ref[:, 0:1]
        done = state_ref[:, 1:2] > 0.5

        a, tdep = _pair_fn(chunk, px, py, znear)        # [P, S]
        inr = (iota_s >= lo_ref[v]) & (iota_s < hi_ref[v])
        a = jnp.where(inr, a, 0.0)
        logom = jnp.log1p(-a)
        t_excl = t_carry * jnp.exp(_mm_precise(logom, _prefix_mat(s, "excl")))
        t_after = t_excl * (1.0 - a)

        # Early-termination set without a prefix pass: T is monotone along
        # the chunk for a live pixel, so every contributing pair at or
        # after the first trigger has t_after < T_EPS itself (the oracle's
        # cumulative-trigger formulation is equivalent; parity-tested).
        # trigger via a SUM reduction: Mosaic lowers lane-wide max/any
        # reductions pathologically (measured ~half the whole kernel across
        # med/lk/trigger, tools/bisect_fwd.py); sums are fast.
        keep = (a > 0.0) & (t_after >= t_eps) & jnp.logical_not(done)
        trigf = jnp.where((a > 0.0) & (t_after < t_eps), 1.0, 0.0)
        trigger_any = jnp.sum(trigf, axis=1, keepdims=True) > 0.5
        w = jnp.where(keep, a * t_excl, 0.0)

        # Payload channels + alpha as ONE MXU contraction over the lane
        # axis (w × [qc; 1]): the per-surfel-constant channels don't need
        # nq separate [P,S] multiply+lane-reduce passes on the VPU (which
        # is this kernel's bottleneck — it measures at ~100% utilization).
        # _mmT3's 3-pass hi/lo split keeps f32-faithful accuracy; the
        # per-PAIR channels (deptha, m1, m2 — depth varies per pair) stay
        # as exact VPU lane reductions.
        qc1 = jnp.concatenate([qc, jnp.ones((1, s), jnp.float32)], axis=0)
        pay = _mmT3(w, qc1)                             # [P, nq+1]
        cn = acc[:, 0:nq] + pay[:, 0:nq]
        alpha = acc[:, nq:nq + 1] + pay[:, nq:nq + 1]
        deptha = acc[:, nq + 1:nq + 2] + jnp.sum(w * tdep, axis=1,
                                                 keepdims=True)
        m = map_depth(tdep, znear, zfar)
        wm = w * m
        m1 = acc[:, nq + 3:nq + 4] + jnp.sum(wm, axis=1, keepdims=True)
        m2 = acc[:, nq + 4:nq + 5] + jnp.sum(wm * m, axis=1, keepdims=True)

        # Last-contributor extraction (median depth + lk) WITHOUT lane-max
        # reductions: Mosaic lowers lane-wide max reductions pathologically
        # (f32 maxes here measured ~half the whole kernel,
        # tools/bisect_fwd.py full vs full_suffmm: 92 → 44 ms). Instead,
        # ONE block-diagonal suffix-count matmul marks each mask's LAST
        # set lane (strict-suffix count == 0); 0/1 operands are exact in
        # bf16 and the counts (< 2S) accumulate exactly in f32, so this is
        # numerically identical to the max formulation.
        iota_f = iota_s.astype(jnp.float32)
        cand = (w > 0.0) & (t_excl > MEDIAN_T)
        both = jnp.concatenate(
            [cand.astype(jnp.float32), keep.astype(jnp.float32)], axis=1)
        suff = _mm(both, _sexcl2_mat(s))
        lastc = jnp.where(cand & (suff[:, 0:s] < 0.5), 1.0, 0.0)
        lastk = jnp.where(keep & (suff[:, s:2 * s] < 0.5), 1.0, 0.0)
        anyc = jnp.sum(lastc, axis=1, keepdims=True)
        med = jnp.where(anyc > 0.5,
                        jnp.sum(lastc * tdep, axis=1, keepdims=True),
                        acc[:, nq + 5:nq + 6])

        anyk = jnp.sum(lastk, axis=1, keepdims=True)
        lklane = jnp.sum(lastk * iota_f, axis=1, keepdims=True)
        lknew = chunk_of_ref[v] * s + lklane.astype(jnp.int32)
        lk_ref[0] = jnp.where(anyk > 0.5, lknew, lk_ref[0])

        kept_logom = jnp.where(keep, logom, 0.0)
        t_out = t_carry * jnp.exp(jnp.sum(kept_logom, axis=1, keepdims=True))
        done = jnp.logical_or(done, trigger_any)

        acc_ref[0, :, 0:ch] = jnp.concatenate(
            [cn, alpha, deptha, acc[:, nq + 2:nq + 3], m1, m2, med], axis=1)
        state_ref[:, 0:1] = t_out

        # ---- gated per-class distortion chains (fused: share the pair
        # math, records and grid with the main chain; the reference runs
        # these as 5 whole extra rasterizations, train.py:94-105). Each
        # class g re-runs the transmittance recurrence over its gated
        # alpha stream — skipped when the visit has no class-g lanes
        # (street classes are spatially clustered).
        if G:
            gates = _gate_bits(chunk[gate_row:gate_row + 1, :], G)
            start_f = (chunk_of_ref[v] * s).astype(jnp.float32)
            for g in range(G):
                has = jnp.sum(jnp.where(inr, gates[g], 0.0)) > 0.5

                @pl.when(has)
                def _(g=g):
                    tg_carry = state_ref[:, 2 + g:3 + g]
                    done_g = state_ref[:, 2 + G + g:3 + G + g] > 0.5
                    ag = a * gates[g]
                    # exact for 0/1 gates: log1p(-a·g) = g·log1p(-a) —
                    # reuses the main chain's transcendental instead of
                    # one log1p per class per visit
                    logom_g = gates[g] * logom
                    tg_excl = tg_carry * jnp.exp(
                        _mm_precise(logom_g, _prefix_mat(s, "excl")))
                    tg_after = tg_excl * (1.0 - ag)
                    keep_g = ((ag > 0.0) & (tg_after >= t_eps)
                              & jnp.logical_not(done_g))
                    trig_g = jnp.sum(
                        jnp.where((ag > 0.0) & (tg_after < t_eps), 1.0, 0.0),
                        axis=1, keepdims=True) > 0.5
                    wg = jnp.where(keep_g, ag * tg_excl, 0.0)
                    wgm = wg * m
                    c0 = ch + 4 * g
                    acc_ref[0, :, c0:c0 + 1] = (
                        acc_ref[0, :, c0:c0 + 1]
                        + jnp.sum(wg, axis=1, keepdims=True))
                    acc_ref[0, :, c0 + 1:c0 + 2] = (
                        acc_ref[0, :, c0 + 1:c0 + 2]
                        + jnp.sum(wgm, axis=1, keepdims=True))
                    acc_ref[0, :, c0 + 2:c0 + 3] = (
                        acc_ref[0, :, c0 + 2:c0 + 3]
                        + jnp.sum(wgm * m, axis=1, keepdims=True))
                    # last-kept lane via suffix-count matmul (no lane max —
                    # see the main chain's med/lk comment)
                    suffg = _mm(jnp.where(keep_g, 1.0, 0.0),
                                _prefix_mat(s, "sexcl"))
                    lastg = jnp.where(keep_g & (suffg < 0.5), 1.0, 0.0)
                    anyg = jnp.sum(lastg, axis=1, keepdims=True)
                    lgl = jnp.sum(lastg * iota_f, axis=1, keepdims=True)
                    acc_ref[0, :, c0 + 3:c0 + 4] = jnp.where(
                        anyg > 0.5, start_f + lgl,
                        acc_ref[0, :, c0 + 3:c0 + 4])
                    kept_lg = jnp.where(keep_g, logom_g, 0.0)
                    state_ref[:, 2 + g:3 + g] = tg_carry * jnp.exp(
                        jnp.sum(kept_lg, axis=1, keepdims=True))
                    state_ref[:, 2 + G + g:3 + G + g] = jnp.where(
                        jnp.logical_or(done_g, trig_g), 1.0, 0.0)

        # done-flag doubles as the tile-wide skip sentinel (2.0) — only
        # once the main chain AND every gated chain are finished
        # (sum-based all(): see the med/lk reduction comment)
        done_f = done.astype(jnp.float32)
        every = jnp.sum(done_f) > PIX - 0.5
        if G:
            every = jnp.logical_and(
                every,
                jnp.sum(state_ref[:, 2 + G:2 + 2 * G]) > PIX * G - 0.5)
        state_ref[:, 1:2] = jnp.where(every, done_f + 1.0, done_f)


# ---------------------------------------------------------------- backward
#
# Same pipelined visit-stream structure as the forward, iterated in REVERSE
# (grid step g processes visit V−1−g); per-tile suffix state resets on each
# tile's *last* visit (the first one seen in reverse). A chunk's visits are
# consecutive in reverse order too, so its [REC,S] gradient block stays
# resident and accumulates across visits: overwritten on the chunk's first
# reverse visit (init_rev), added to afterwards. Sentinel visits map to the
# first-processed real chunk and touch nothing, so no garbage ever reaches
# a block that a real visit initializes later.

def _bwd_kernel(tile_of_ref, chunk_of_ref, last_ref, init_ref, lo_ref,
                hi_ref, rec_ref, acc_ref, lk_ref, dacc_ref, dgrad_ref,
                state_ref, *scratch, num_visits, tiles_x, znear, zfar,
                nq=NQ, n_gates=0, gate_row=0):
    s = S_CHUNK
    G = n_gates
    ch = ch_for(nq)
    v = num_visits - 1 - pl.program_id(0)
    px, py = _tile_pixel_coords(tile_of_ref[v], tiles_x)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)

    @pl.when(last_ref[v] > 0)
    def _():
        # state cols: 0 suffix transmittance U, 1 suffix Σ ωΩ, then per
        # gated class (2+g U_g, 2+G+g suffix Σ ωΩ_g)
        state_ref[:, 0:1] = 1.0 - acc_ref[0][:, nq:nq + 1]
        state_ref[:, 1:2] = jnp.zeros((PIX, 1), jnp.float32)
        for g in range(G):
            state_ref[:, 2 + g:3 + g] = (
                1.0 - acc_ref[0][:, ch + 4 * g:ch + 4 * g + 1])
        if G:
            state_ref[:, 2 + G:2 + 2 * G] = jnp.zeros((PIX, G), jnp.float32)

    # Early-termination skip, mirroring the forward's done sentinel: if
    # every pixel's last contributor (on every chain) precedes this chunk,
    # no pair has gidx ≤ lk — the visit is gradient-free. Suffix state is
    # unchanged (all klogom = 0); only the gradient block needs its init.
    # Sum-based any(): Mosaic lowers max reductions pathologically (see
    # the forward kernel's med/lk comment); lk < 2^24 so the f32 compare
    # is exact and the count is what the predicate needs
    start_f = (chunk_of_ref[v] * s).astype(jnp.float32)
    alive_cnt = jnp.sum(jnp.where(
        lk_ref[0].astype(jnp.float32) >= start_f, 1.0, 0.0))
    for g in range(G):
        alive_cnt = alive_cnt + jnp.sum(jnp.where(
            acc_ref[0][:, ch + 4 * g + 3:ch + 4 * g + 4] >= start_f,
            1.0, 0.0))
    dead = alive_cnt < 0.5

    @pl.when(jnp.logical_and(last_ref[v] >= 0, dead))
    def _():
        @pl.when(init_ref[v] > 0)
        def _():
            dgrad_ref[:, :] = jnp.zeros_like(dgrad_ref)

    @pl.when(jnp.logical_and(last_ref[v] >= 0, jnp.logical_not(dead)))
    def _():
        gq = dacc_ref[0][:, 0:nq]                # [P, nq]
        galpha = dacc_ref[0][:, nq:nq + 1]
        gdepth = dacc_ref[0][:, nq + 1:nq + 2]
        gm1 = dacc_ref[0][:, nq + 3:nq + 4]
        gm2 = dacc_ref[0][:, nq + 4:nq + 5]
        lk = lk_ref[0]
        u_in = state_ref[:, 0:1]
        ssuf = state_ref[:, 1:2]

        chunk = rec_ref[:, :]
        qc = chunk[Q_ROW0:Q_ROW0 + nq]

        pair = functools.partial(_pair_fn, px=px, py=py, znear=znear)
        (a, tdep), pair_vjp = jax.vjp(pair, chunk)
        inr = (iota_s >= lo_ref[v]) & (iota_s < hi_ref[v])
        a = jnp.where(inr, a, 0.0)

        gidx = chunk_of_ref[v] * s + iota_s
        keep = (a > 0.0) & (gidx <= lk)
        logom = jnp.log1p(-a)
        klogom = jnp.where(keep, logom, 0.0)
        # T_excl_j = U_in / Π_{kept i≥j}(1−α_i): inclusive reverse suffix.
        # _mm_precise is REQUIRED here, unlike the linear contractions
        # (ssuf_pair/gq_qc/dq, whose 2⁻⁸ rounding hits individual TERMS):
        # this matmul's error lands in an EXPONENT, so a single-pass bf16
        # rounding of the suffix sum (≤ 2⁻⁸·|log suffix|, and |log| runs
        # to |log t_eps| ≈ 9 on dense-occlusion tiles) amplifies to
        # percent-level weight error — round 3 downgraded this to _mm and
        # tools/verify_device_parity.py measured 12% l2 gradient error on
        # its dense scene; with _mm_precise the same check is ~1e-4.
        t_excl = u_in * jnp.exp(-_mm_precise(klogom,
                                             _prefix_mat(s, "sincl")))
        u_out = u_in * jnp.exp(-jnp.sum(klogom, axis=1, keepdims=True))
        w = jnp.where(keep, a * t_excl, 0.0)

        m = map_depth(tdep, znear, zfar)
        dmdt = (zfar * znear / (zfar - znear)) / jnp.maximum(
            tdep * tdep, 1e-12)
        # Low-rank payload contraction on the MXU: the pad-to-128 charge
        # is cheaper than nq [P,S] VPU FMAs at every nq (the MXU sits
        # mostly idle while the VPU is the kernel's bottleneck —
        # tools/bisect_bwd.py no_gqqc: ~10ms of 65 for the VPU loop).
        # Single-pass DEFAULT matches the gradient-precision standard
        # already set by ``ssuf_pair``'s ``_mm`` below (one bf16 rounding
        # per operand). Distortion cotangents arrive folded into
        # galpha/gm1/gm2.
        gq_qc = jax.lax.dot_general(
            gq, qc, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
        omega = gq_qc + galpha + gdepth * tdep + gm1 * m + gm2 * m * m
        womega = w * omega
        ssuf_pair = ssuf + _mm(womega, _prefix_mat(s, "sexcl"))
        ssuf_out = ssuf + jnp.sum(womega, axis=1, keepdims=True)

        da = jnp.where(keep, t_excl * omega - ssuf_pair / (1.0 - a), 0.0)
        dt = w * (gdepth + (gm1 + 2.0 * m * gm2) * dmdt)
        # cotangents are zero outside this visit's lane range, so drec is
        # too (the pair function is lane-local) — no extra masking needed
        da = jnp.where(inr, da, 0.0)
        dt = jnp.where(inr, dt, 0.0)

        state_ref[:, 0:1] = u_out
        state_ref[:, 1:2] = ssuf_out

        # ---- gated per-class chains: mirror the forward's fused blocks,
        # accumulating their pair cotangents into the SAME (da, dt) so one
        # shared pair_vjp serves every chain
        if G:
            da_ref, dt_ref = scratch
            da_ref[:, :] = da
            dt_ref[:, :] = dt
            gates = _gate_bits(chunk[gate_row:gate_row + 1, :], G)
            for g in range(G):
                lkg = acc_ref[0][:, ch + 4 * g + 3:ch + 4 * g + 4]
                # sum-based any(): Mosaic lowers lane/sublane max
                # reductions pathologically (see the forward's med/lk
                # comment); gates are 0/1 and the lkg test is a count
                has = jnp.logical_and(
                    jnp.sum(jnp.where(inr, gates[g], 0.0)) > 0.5,
                    jnp.sum(jnp.where(lkg >= start_f, 1.0, 0.0)) > 0.5)

                @pl.when(has)
                def _(g=g, lkg=lkg):
                    ga = dacc_ref[0][:, ch + 4 * g:ch + 4 * g + 1]
                    gm1g = dacc_ref[0][:, ch + 4 * g + 1:ch + 4 * g + 2]
                    gm2g = dacc_ref[0][:, ch + 4 * g + 2:ch + 4 * g + 3]
                    ug_in = state_ref[:, 2 + g:3 + g]
                    ssufg = state_ref[:, 2 + G + g:3 + G + g]
                    ag = a * gates[g]
                    keep_g = (ag > 0.0) & (gidx.astype(jnp.float32) <= lkg)
                    # keep_g ⊆ {gate=1}, so log1p(-ag) = log1p(-a) there —
                    # the main chain's logom serves every class
                    klg = jnp.where(keep_g, logom, 0.0)
                    # _mm_precise: exponent-path precision, see the main
                    # chain's t_excl comment
                    tg_excl = ug_in * jnp.exp(-_mm_precise(
                        klg, _prefix_mat(s, "sincl")))
                    wg = jnp.where(keep_g, ag * tg_excl, 0.0)
                    omg = ga + gm1g * m + gm2g * m * m
                    wom = wg * omg
                    ssufg_pair = ssufg + _mm(wom, _prefix_mat(s, "sexcl"))
                    dag = jnp.where(
                        keep_g, tg_excl * omg - ssufg_pair / (1.0 - ag),
                        0.0)
                    dtg = wg * (gm1g + 2.0 * m * gm2g) * dmdt
                    # ∂ag/∂a = gate (0/1); dag is zero off-class already
                    da_ref[:, :] = da_ref[:, :] + jnp.where(inr, dag, 0.0)
                    dt_ref[:, :] = dt_ref[:, :] + jnp.where(inr, dtg, 0.0)
                    state_ref[:, 2 + g:3 + g] = ug_in * jnp.exp(
                        -jnp.sum(klg, axis=1, keepdims=True))
                    state_ref[:, 2 + G + g:3 + G + g] = ssufg + jnp.sum(
                        wom, axis=1, keepdims=True)
            da = da_ref[:, :]
            dt = dt_ref[:, :]

        (drec,) = pair_vjp((da, dt))                     # [REC, S]
        # dq[k,s] = Σ_p gq[p,k]·w[p,s] — one MXU contraction over the
        # pixel axis instead of nq sublane reductions (same DEFAULT
        # precision standard as gq_qc above)
        dq = jax.lax.dot_general(
            gq, w, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)         # [nq, S]
        # tail slice only when pad rows exist — Mosaic rejects zero-size
        # vector slices (rec == Q_ROW0 + nq at the default layout)
        tail = ([drec[Q_ROW0 + nq:]] if drec.shape[0] > Q_ROW0 + nq
                else [])
        contrib = jnp.concatenate(
            [drec[:Q_ROW0], drec[Q_ROW0:Q_ROW0 + nq] + dq] + tail, axis=0)

        @pl.when(init_ref[v] > 0)
        def _():
            dgrad_ref[:, :] = contrib

        @pl.when(init_ref[v] == 0)
        def _():
            dgrad_ref[:, :] = dgrad_ref[:, :] + contrib


# ------------------------------------------------------------- public core

def pack_geometry_T(sur, n_surfels: int, extra_payload=None,
                    pad_column: bool = True):
    """SurfelScreen → packed per-surfel records, LANE-major [rec, N+1].

    Column N is the zero padding record referenced by stream-pad slots
    (opacity=0 → never contributes; its scatter-added gradients land in
    the dropped row). Built transposed so the per-duplicate gather runs
    along the lane axis and the kernels stream the result without any
    relayout.

    Only M's first two columns are stored — the third is
    (c2d_x·z, c2d_y·z, z) and the kernels rebuild it from the
    center2d/depth rows (see the module docstring's record layout). The
    valid flag folds into the opacity row (0 ⇒ invalid: the α ≥ 1/255
    gate can never pass, matching the old explicit mask).

    ``extra_payload`` [N, E] appends E payload rows after color+normal
    (nq = 6 + E) — fused multi-pass rendering shares this one gather.
    """
    validf = sur.valid.astype(jnp.float32)
    cols = [sur.M[:, :, 0], sur.M[:, :, 1], sur.center2d,
            sur.depth[:, None], (sur.opacity * validf)[:, None],
            sur.color, sur.normal]
    nq = NQ
    if extra_payload is not None:
        cols.append(extra_payload)
        nq = NQ + extra_payload.shape[1]
    rec_rows = rec_for(nq)
    rec = jnp.concatenate(cols, axis=1)
    pad = rec_rows - rec.shape[1]
    rec = jnp.concatenate([rec, jnp.zeros((n_surfels, pad))], axis=1)
    if not pad_column:
        # caller appends the padding record itself (e.g. after an
        # all_gather of per-shard packs, where a per-shard pad column
        # would corrupt the gathered column indexing)
        return rec.T
    return jnp.concatenate([rec, jnp.zeros((1, rec_rows))], axis=0).T


def _state_width(n_gates: int) -> int:
    return -(-max(8, 2 + 2 * n_gates) // 8) * 8


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12,
                                                    13, 14))
def blend_stream(recT, tile_of, chunk_of, first_f, last_f, init_rev,
                 lo, hi, num_tiles, tiles_x, settings, interpret=False,
                 nq=NQ, n_gates=0, gate_row=0):
    """Pallas blend over the compact sorted duplicate stream.

    recT [REC, cap] f32 (lane-major records); the visit arrays come from
    ``tiles.bin_surfels_stream``. Returns (acc [T, PIX, CH], lk [T, PIX, 1]).
    Tiles with no visits are left uninitialized — the caller masks them.

    ``n_gates`` > 0 fuses G per-class gated distortion chains into the
    same pass (sharing pair math, records, grid and — in the backward —
    the single pair vjp): acc grows by 4·G channels, per class
    (alpha_g, m1_g, m2_g, lk_g as f32). ``gate_row`` is the record row
    holding the per-surfel class bitmask (an exact small float).
    """
    return _blend_fwd_call(recT, tile_of, chunk_of, first_f, lo, hi,
                           num_tiles, tiles_x, settings, interpret, nq,
                           n_gates, gate_row)


def _blend_fwd_call(recT, tile_of, chunk_of, first_f, lo, hi,
                    num_tiles, tiles_x, settings, interpret, nq=NQ,
                    n_gates=0, gate_row=0):
    vcap = tile_of.shape[0]
    rec = recT.shape[0]
    ch = ch_for(nq) + 4 * n_gates
    kern = functools.partial(_fwd_kernel, tiles_x=tiles_x,
                             znear=settings.znear, zfar=settings.zfar,
                             t_eps=settings.t_eps,
                             nq=nq, n_gates=n_gates, gate_row=gate_row)
    acc, lk = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(vcap,),
            in_specs=[pl.BlockSpec((rec, S_CHUNK),
                                   lambda v, t, c, f, lo_, hi_: (0, c[v]),
                                   memory_space=pltpu.VMEM)],
            out_specs=[
                pl.BlockSpec((1, PIX, ch),
                             lambda v, t, c, f, lo_, hi_: (t[v], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, PIX, 1),
                             lambda v, t, c, f, lo_, hi_: (t[v], 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((PIX, _state_width(n_gates)), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, PIX, ch), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, PIX, 1), jnp.int32),
        ],
        interpret=interpret,
    )(tile_of, chunk_of, first_f, lo, hi, recT)
    return acc, lk


def _blend_fwd(recT, tile_of, chunk_of, first_f, last_f, init_rev, lo, hi,
               num_tiles, tiles_x, settings, interpret=False, nq=NQ,
               n_gates=0, gate_row=0):
    acc, lk = _blend_fwd_call(recT, tile_of, chunk_of, first_f, lo, hi,
                              num_tiles, tiles_x, settings, interpret, nq,
                              n_gates, gate_row)
    return (acc, lk), (recT, tile_of, chunk_of, last_f, init_rev, lo, hi,
                       acc, lk)


def _blend_bwd(num_tiles, tiles_x, settings, interpret, nq, n_gates,
               gate_row, res, cts):
    (recT, tile_of, chunk_of, last_f, init_rev, lo, hi, acc, lk) = res
    dacc, _ = cts
    vcap = tile_of.shape[0]
    cap = recT.shape[1]
    rec = recT.shape[0]
    ch = ch_for(nq) + 4 * n_gates
    kern = functools.partial(_bwd_kernel, num_visits=vcap, tiles_x=tiles_x,
                             znear=settings.znear, zfar=settings.zfar,
                             nq=nq, n_gates=n_gates, gate_row=gate_row)
    rev = lambda g: vcap - 1 - g
    scratch = [pltpu.VMEM((PIX, _state_width(n_gates)), jnp.float32)]
    if n_gates:
        scratch += [pltpu.VMEM((PIX, S_CHUNK), jnp.float32),
                    pltpu.VMEM((PIX, S_CHUNK), jnp.float32)]
    dgrad = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(vcap,),
            in_specs=[
                pl.BlockSpec((rec, S_CHUNK),
                             lambda g, t, c, l, ir, lo_, hi_: (0, c[rev(g)]),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, PIX, ch),
                             lambda g, t, c, l, ir, lo_, hi_:
                             (t[rev(g)], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, PIX, 1),
                             lambda g, t, c, l, ir, lo_, hi_:
                             (t[rev(g)], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, PIX, ch),
                             lambda g, t, c, l, ir, lo_, hi_:
                             (t[rev(g)], 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((rec, S_CHUNK),
                             lambda g, t, c, l, ir, lo_, hi_: (0, c[rev(g)]),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=scratch,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((rec, cap), jnp.float32),
        ],
        interpret=interpret,
    )(tile_of, chunk_of, last_f, init_rev, lo, hi, recT, acc, lk, dacc)[0]

    return (dgrad,) + (None,) * 7


blend_stream.defvjp(_blend_fwd, _blend_bwd)


# ------------------------------------------- gate decoding helper
#
# Gates arrive as ONE record row holding the per-surfel class bitmask as
# an exact small float (bit g = class g membership); the row index is a
# static arg so the same packed record (and the same gather) serves the
# payload and the gated chains.

def _gate_bits(grow, n_gates):
    """Decode G gate rows [1,S] (0/1 floats) from the packed bitmask row."""
    bits = []
    r = grow
    for _ in range(n_gates):
        half = jnp.floor(r * 0.5)
        bits.append(r - 2.0 * half)
        r = half
    return bits
