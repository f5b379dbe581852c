"""Tile binning: surfels → per-tile depth-sorted duplicate lists.

The CUDA reference bins by writing (tile|depth)-keyed duplicates with global
atomics and cub radix sort (SURVEY.md §3.5, §7.3 hard-part #1). The TPU-native
design is fully sort-based with *static capacities* so it jits cleanly:

1. For each surfel, compute the range of image tiles its screen AABB covers.
2. Expand to at most ``max_tiles_per_surfel`` (static) duplicate slots via a
   bounded iota grid — out-of-range slots get an invalid key.
3. Pack sort keys as (tile_id, depth) into one uint64-equivalent pair and
   sort with ``jax.lax.sort`` (XLA's on-device sort).
4. CSR tile offsets via searchsorted over the sorted tile ids.

The result (sorted surfel indices + per-tile offsets) feeds the Pallas blend
kernel, which walks each tile's contiguous index range.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class TileBinning(NamedTuple):
    sorted_surfel: jnp.ndarray   # [D] int32 surfel index per duplicate (depth-sorted per tile)
    sorted_valid: jnp.ndarray    # [D] bool
    tile_offsets: jnp.ndarray    # [T+1] int32 CSR offsets into sorted_surfel
    tiles_x: int
    tiles_y: int


def _tile_ranges(center2d, radius, tiles_x, tiles_y, tile_w, tile_h):
    x0 = jnp.clip(jnp.floor((center2d[:, 0] - radius) / tile_w), 0, tiles_x - 1)
    x1 = jnp.clip(jnp.floor((center2d[:, 0] + radius) / tile_w), 0, tiles_x - 1)
    y0 = jnp.clip(jnp.floor((center2d[:, 1] - radius) / tile_h), 0, tiles_y - 1)
    y1 = jnp.clip(jnp.floor((center2d[:, 1] + radius) / tile_h), 0, tiles_y - 1)
    return tuple(a.astype(jnp.int32) for a in (x0, x1, y0, y1))


def bin_surfels_exact(center2d, radius, depth, valid, width: int,
                      height: int, tile_w: int, tile_h: int,
                      dup_capacity: int,
                      max_tiles_per_surfel: int = 64) -> TileBinning:
    """Exact-count tile binning (the production path).

    Instead of a fixed slot grid of N×max_tiles mostly-invalid entries
    (``bin_surfels``), this allocates exactly one stream slot per real
    duplicate: surfels are depth-sorted first, duplicate offsets come from
    a cumsum of per-surfel tile counts, and a single-key *stable* sort by
    tile preserves the depth order — ~3× less sort traffic at street
    scale. ``dup_capacity`` is the static stream size; if the scene
    overflows it the farthest surfels' duplicates are dropped.
    """
    tiles_x = -(-width // tile_w)
    tiles_y = -(-height // tile_h)
    n = center2d.shape[0]
    sentinel = tiles_x * tiles_y

    order = jnp.argsort(jnp.where(valid, depth, jnp.inf))
    c2d = center2d[order]
    rad = radius[order]
    val = valid[order]
    x0, x1, y0, y1 = _tile_ranges(c2d, rad, tiles_x, tiles_y, tile_w, tile_h)
    nx = x1 - x0 + 1
    ny = y1 - y0 + 1
    nt = jnp.where(val, jnp.minimum(nx * ny, max_tiles_per_surfel), 0)

    dup_start = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                 jnp.cumsum(nt).astype(jnp.int32)])
    total = dup_start[-1]

    # rank-of-slot via marks+cumsum (gather-only; no big scatter)
    marks = jnp.zeros((dup_capacity,), jnp.int32).at[dup_start[1:-1]].add(
        1, mode="drop")
    rank = jnp.cumsum(marks)
    slot = jnp.arange(dup_capacity, dtype=jnp.int32)
    in_stream = slot < jnp.minimum(total, dup_capacity)
    rank = jnp.minimum(rank, n - 1)

    k = slot - dup_start[rank]
    nxr = jnp.maximum(nx[rank], 1)
    tx = x0[rank] + k % nxr
    ty = y0[rank] + k // nxr
    tile_id = jnp.where(in_stream, ty * tiles_x + tx, sentinel)
    surfel_id = jnp.where(in_stream, order[rank].astype(jnp.int32), n)

    s_tile, s_idx, s_val = jax.lax.sort(
        (tile_id, surfel_id, in_stream), num_keys=1, is_stable=True)

    offsets = jnp.searchsorted(
        s_tile, jnp.arange(sentinel + 1, dtype=jnp.int32),
        side="left").astype(jnp.int32)
    return TileBinning(sorted_surfel=s_idx, sorted_valid=s_val,
                       tile_offsets=offsets, tiles_x=tiles_x,
                       tiles_y=tiles_y)


def bin_surfels(center2d, radius, depth, valid, width: int, height: int,
                tile_w: int, tile_h: int, max_tiles_per_surfel: int = 64):
    """Build per-tile duplicate lists.

    center2d [N,2], radius [N], depth [N], valid [N]. Static image/tile dims.
    A surfel covering more than ``max_tiles_per_surfel`` tiles is clipped to
    its first rows of tiles (callers pick the cap from the scene scale; huge
    splats are rare because densification splits them).
    """
    tiles_x = -(-width // tile_w)
    tiles_y = -(-height // tile_h)
    n = center2d.shape[0]

    x0 = jnp.clip(jnp.floor((center2d[:, 0] - radius) / tile_w), 0, tiles_x - 1)
    x1 = jnp.clip(jnp.floor((center2d[:, 0] + radius) / tile_w), 0, tiles_x - 1)
    y0 = jnp.clip(jnp.floor((center2d[:, 1] - radius) / tile_h), 0, tiles_y - 1)
    y1 = jnp.clip(jnp.floor((center2d[:, 1] + radius) / tile_h), 0, tiles_y - 1)
    x0, x1, y0, y1 = (a.astype(jnp.int32) for a in (x0, x1, y0, y1))
    nx = x1 - x0 + 1
    ny = y1 - y0 + 1

    # Slot grid: slot s → (dy, dx) = divmod(s, nx) per surfel.
    slots = jnp.arange(max_tiles_per_surfel, dtype=jnp.int32)
    dy = slots[None, :] // nx[:, None]
    dx = slots[None, :] - dy * nx[:, None]
    tx = x0[:, None] + dx
    ty = y0[:, None] + dy
    in_range = (slots[None, :] < (nx * ny)[:, None]) & valid[:, None]
    tile_id = jnp.where(in_range, ty * tiles_x + tx, tiles_x * tiles_y)

    # Sort by (tile, depth): keys in f64-free form — combine int tile and
    # float depth via two-key lexicographic lax.sort.
    surf_idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None],
                                tile_id.shape)
    flat_tile = tile_id.reshape(-1)
    flat_depth = jnp.broadcast_to(depth[:, None], tile_id.shape).reshape(-1)
    flat_idx = surf_idx.reshape(-1)
    flat_val = in_range.reshape(-1)

    s_tile, s_depth, s_idx, s_val = jax.lax.sort(
        (flat_tile, flat_depth, flat_idx, flat_val), num_keys=2)

    num_tiles = tiles_x * tiles_y
    offsets = jnp.searchsorted(s_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32),
                               side="left").astype(jnp.int32)
    return TileBinning(sorted_surfel=s_idx, sorted_valid=s_val,
                       tile_offsets=offsets, tiles_x=tiles_x, tiles_y=tiles_y)
