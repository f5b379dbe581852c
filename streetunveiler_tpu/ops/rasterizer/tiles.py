"""Tile binning: surfels → a compact depth-sorted, tile-grouped stream.

The CUDA reference bins by writing (tile|depth)-keyed duplicates with global
atomics and cub radix sort (SURVEY.md §3.5, §7.3 hard-part #1). The TPU
design is sort-based with *static capacities* so it jits cleanly, and is
shaped around one measured fact: XLA:TPU dynamic gathers cost ~12ns *per
index* regardless of row width, so the whole pipeline is arranged to touch
per-duplicate indices as few times as possible:

1. Depth-argsort the surfels once; fuse every per-surfel quantity the
   duplicate expansion needs into ONE int table so the expansion costs a
   single per-duplicate gather.
2. Expand to duplicates via the marks+cumsum rank trick (gather-free), and
   stable-sort (tile_id, surfel_id) — two operands only; invalid/overflow
   entries carry a sentinel tile so no separate validity payload is sorted.
3. The sorted stream is used *compactly*: chunks of 128 duplicates may span
   tile boundaries. Instead of re-materializing a tile-aligned stream (which
   cost 3 more per-duplicate gathers in round 1), the Pallas kernel iterates
   over (tile, chunk) VISITS with per-visit lane ranges; all visit metadata
   is tiny ([T]-sized / [V]-sized) and computed gather-free here.

Visit order is tile-major (all visits of tile t, chunks ascending). Two key
adjacency properties the kernels rely on:
  * visits of one tile are consecutive → per-tile output blocks and carry
    scratch stay resident across the tile's visits;
  * visits of one chunk are consecutive (a chunk is shared only by tiles
    t, t+1, ... whose ranges abut) → the backward can accumulate per-chunk
    gradient blocks across visits without a reduction pass.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

S_CHUNK = 128  # duplicates per stream chunk == kernel lane count


class StreamBinning(NamedTuple):
    """Compact sorted duplicate stream + (tile, chunk) visit schedule."""

    sorted_surfel: jnp.ndarray   # [cap] i32 surfel per duplicate; n = pad
    tile_offsets: jnp.ndarray    # [T+1] i32 CSR offsets into the stream
    tile_of_visit: jnp.ndarray   # [V] i32 (sentinel visits: clamped)
    chunk_of_visit: jnp.ndarray  # [V] i32 block index into the stream
    first_of_tile: jnp.ndarray   # [V] i32 1 = tile's first visit, −1 = sentinel
    last_of_tile: jnp.ndarray    # [V] i32 1 = tile's last visit, −1 = sentinel
    init_rev: jnp.ndarray        # [V] i32 1 = chunk's first visit in REVERSE
    lane_lo: jnp.ndarray         # [V] i32 first lane of this tile's range
    lane_hi: jnp.ndarray         # [V] i32 one-past-last lane
    tiles_x: int
    tiles_y: int
    overflow: jnp.ndarray        # [] bool — capacity exceeded


def visit_capacity(dup_capacity: int, tiles_x: int, tiles_y: int) -> int:
    """Static visit count: every chunk once + one extra per tile boundary."""
    return dup_capacity // S_CHUNK + tiles_x * tiles_y


def bin_surfels_stream(center2d, ext, depth, valid, width: int, height: int,
                       tile_w: int, tile_h: int, dup_capacity: int,
                       max_tiles_per_surfel: int = 64) -> StreamBinning:
    """center2d [N,2], ext [N,2] per-axis extents, depth [N], valid [N].

    ``dup_capacity`` (multiple of S_CHUNK) is the static stream size; on
    overflow the farthest surfels' duplicates are dropped (``overflow``).
    """
    tiles_x = -(-width // tile_w)
    tiles_y = -(-height // tile_h)
    n_tiles = tiles_x * tiles_y
    sentinel = n_tiles
    n = center2d.shape[0]
    cap = dup_capacity
    assert cap % S_CHUNK == 0

    # -- per-surfel tile ranges in depth-rank order (one fused gather)
    order = jnp.argsort(jnp.where(valid, depth, jnp.inf)).astype(jnp.int32)
    per_surfel = jnp.concatenate(
        [center2d, ext, valid[:, None].astype(jnp.float32)], axis=1)
    ps = jnp.take(per_surfel, order, axis=0)          # [N, 5]
    cx, cy, ex, ey, vf = (ps[:, i] for i in range(5))
    x0 = jnp.clip(jnp.floor((cx - ex) / tile_w), 0, tiles_x - 1).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((cx + ex) / tile_w), 0, tiles_x - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((cy - ey) / tile_h), 0, tiles_y - 1).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((cy + ey) / tile_h), 0, tiles_y - 1).astype(jnp.int32)
    nx = x1 - x0 + 1
    nt = jnp.where(vf > 0.5,
                   jnp.minimum(nx * (y1 - y0 + 1), max_tiles_per_surfel), 0)
    dup_start = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                 jnp.cumsum(nt).astype(jnp.int32)])
    total = dup_start[-1]

    # -- duplicate expansion: rank via marks+cumsum, then ONE fused gather
    marks = jnp.zeros((cap,), jnp.int32).at[dup_start[1:-1]].add(
        1, mode="drop")
    rank = jnp.minimum(jnp.cumsum(marks), n - 1)
    # fused expansion table: everything indexed by rank in one gather
    tbl = jnp.stack([x0, y0, jnp.maximum(nx, 1), dup_start[:-1], order],
                    axis=1)                            # [N, 5] i32
    g = jnp.take(tbl, rank, axis=0)                   # [cap, 5]
    slot = jnp.arange(cap, dtype=jnp.int32)
    k = slot - g[:, 3]
    tx = g[:, 0] + k % g[:, 2]
    ty = g[:, 1] + k // g[:, 2]
    in_stream = slot < jnp.minimum(total, cap)
    tile_id = jnp.where(in_stream, ty * tiles_x + tx, sentinel)
    surf_id = jnp.where(in_stream, g[:, 4], n)

    # -- stable single-key sort: depth order within each tile is preserved
    s_tile, s_surf = jax.lax.sort((tile_id, surf_id), num_keys=1,
                                  is_stable=True)
    off = jnp.searchsorted(
        s_tile, jnp.arange(n_tiles + 1, dtype=jnp.int32),
        side="left").astype(jnp.int32)

    # -- visit schedule ([T]-sized math only)
    counts = off[1:] - off[:-1]
    first_chunk = off[:-1] // S_CHUNK
    last_chunk = jnp.maximum(off[1:] - 1, 0) // S_CHUNK
    nvis_t = jnp.where(counts > 0, last_chunk - first_chunk + 1, 0)
    vstart = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(nvis_t).astype(jnp.int32)])
    nvis = vstart[-1]

    vcap = visit_capacity(cap, tiles_x, tiles_y)
    vmarks = jnp.zeros((vcap,), jnp.int32).at[vstart[1:-1]].add(
        1, mode="drop")
    t_of = jnp.minimum(jnp.cumsum(vmarks), n_tiles - 1)
    vslot = jnp.arange(vcap, dtype=jnp.int32)
    in_vis = vslot < nvis
    c_of = first_chunk[t_of] + (vslot - vstart[t_of])
    lo = jnp.clip(off[t_of] - c_of * S_CHUNK, 0, S_CHUNK)
    hi = jnp.clip(off[t_of + 1] - c_of * S_CHUNK, 0, S_CHUNK)
    first_f = jnp.where(in_vis, (vslot == vstart[t_of]).astype(jnp.int32), -1)
    last_f = jnp.where(in_vis,
                       (vslot == vstart[t_of + 1] - 1).astype(jnp.int32), -1)
    # sentinel visits revisit the last real (tile, chunk) without touching it
    idx_last = jnp.maximum(nvis - 1, 0)
    t_of = jnp.where(in_vis, t_of, t_of[idx_last])
    c_of = jnp.clip(jnp.where(in_vis, c_of, c_of[idx_last]), 0,
                    cap // S_CHUNK - 1)
    lo = jnp.where(in_vis, lo, 0)
    hi = jnp.where(in_vis, hi, 0)
    # chunk's first visit when iterating the visit list in reverse
    nxt_c = jnp.concatenate([c_of[1:], jnp.full((1,), -1, jnp.int32)])
    init_rev = jnp.where(
        in_vis, ((vslot == nvis - 1) | (c_of != nxt_c)).astype(jnp.int32), -1)

    return StreamBinning(sorted_surfel=s_surf, tile_offsets=off,
                         tile_of_visit=t_of, chunk_of_visit=c_of,
                         first_of_tile=first_f, last_of_tile=last_f,
                         init_rev=init_rev, lane_lo=lo, lane_hi=hi,
                         tiles_x=tiles_x, tiles_y=tiles_y,
                         overflow=total > cap)
