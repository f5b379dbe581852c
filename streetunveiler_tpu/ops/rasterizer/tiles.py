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

import dataclasses

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S_CHUNK = 128  # duplicates per stream chunk == kernel lane count
CULL_KMAX = 16  # AABB tile-span up to which the conic cull runs BEFORE
#                 duplicate expansion (exact counts shrink the stream);
#                 wider surfels fall back to post-expansion culling


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StreamBinning:
    """Compact sorted duplicate stream + (tile, chunk) visit schedule.

    ``tiles_x``/``tiles_y`` are STATIC pytree aux-data (they derive from
    the static image size), so a ``StreamBinning`` returned from a jitted
    ``bin_for_camera`` crosses the jit boundary with concrete grid ints —
    the blend kernels' nondiff/static arguments never see tracers and the
    two-phase step needs no host-side fixup."""

    sorted_surfel: jnp.ndarray   # [cap] i32 surfel per duplicate; n = pad
    tile_offsets: jnp.ndarray    # [T+1] i32 CSR offsets into the stream
    tile_of_visit: jnp.ndarray   # [V] i32 (sentinel visits: clamped)
    chunk_of_visit: jnp.ndarray  # [V] i32 block index into the stream
    first_of_tile: jnp.ndarray   # [V] i32 1 = tile's first visit, −1 = sentinel
    last_of_tile: jnp.ndarray    # [V] i32 1 = tile's last visit, −1 = sentinel
    init_rev: jnp.ndarray        # [V] i32 1 = chunk's first visit in REVERSE
    lane_lo: jnp.ndarray         # [V] i32 first lane of this tile's range
    lane_hi: jnp.ndarray         # [V] i32 one-past-last lane
    overflow: jnp.ndarray        # [] bool — capacity exceeded
    demand: jnp.ndarray = None   # [] i32 — UNCAPPED duplicate total (what
    #                              the stream would need; ``overflow`` ⟺
    #                              demand > capacity). Lets callers size a
    #                              retry/bump capacity exactly instead of
    #                              guessing (train loop auto-bump, GT gen)
    tiles_x: int = dataclasses.field(metadata=dict(static=True), default=0)
    tiles_y: int = dataclasses.field(metadata=dict(static=True), default=0)

    def _replace(self, **kw):
        """NamedTuple-compatible shim (pre-round-4 callers)."""
        return dataclasses.replace(self, **kw)


def visit_capacity(dup_capacity: int, tiles_x: int, tiles_y: int) -> int:
    """Static visit count: every chunk once + one extra per tile boundary."""
    return dup_capacity // S_CHUNK + tiles_x * tiles_y


def _divmod_small(k, d):
    """Exact (q, r) = divmod(k, d) for small non-negative int32 via f32
    divide + fixup — the VPU's general integer division lowers an order
    of magnitude slower than a float divide (both k and d < 2^23 here,
    so the float path plus one-step correction is exact)."""
    q = jnp.floor(k.astype(jnp.float32) / d.astype(jnp.float32)
                  ).astype(jnp.int32)
    r = k - q * d
    over = (r >= d).astype(jnp.int32)
    q = q + over
    r = r - over * d
    neg = (r < 0).astype(jnp.int32)
    q = q - neg
    r = r + neg * d
    return q, r


def _tile_can_contribute(coefs, tx, ty, tile_w: int, tile_h: int):
    """Exact tile test against a surfel's contribution region.

    coefs: 13 arrays broadcastable against tx/ty —
    (ax,ay,az, bx,by,bz, cx,cy,cz, rho_max, d2max, c2dx, c2dy) from
    ``SurfelScreen.cull`` + the projected center, where
    k(p) = A + px·B + py·C. A (surfel, tile) pair survives iff some pixel
    center of the tile satisfies ρ2d ≤ ρ_max (disc) or ρ3d ≤ ρ_max
    (conic). The conic part checks ρ3d = (kx²+ky²)/kz² at every candidate
    minimum of the quadratic Q = kx²+ky²−ρ_max·kz² over the rect
    (4 corners, 4 edge criticals, interior stationary — exhaustive for a
    quadratic, so the test is exact; ρ evaluation at a critical point is
    second-order insensitive to f32 location error)."""
    ax, ay, az, bx, by, bz, cx, cy, cz, rho_max, d2max, c2dx, c2dy = coefs
    txf = tx.astype(jnp.float32)
    tyf = ty.astype(jnp.float32)
    xlo, xhi = txf * tile_w + 0.5, txf * tile_w + (tile_w - 0.5)
    ylo, yhi = tyf * tile_h + 0.5, tyf * tile_h + (tile_h - 0.5)

    # low-pass disc vs rect (exact)
    dx = jnp.clip(c2dx, xlo, xhi) - c2dx
    dy = jnp.clip(c2dy, ylo, yhi) - c2dy
    hit = dx * dx + dy * dy <= d2max

    # conic: quadratic coefficients of Q in (px, py)
    A = bx * bx + by * by - rho_max * bz * bz
    C = cx * cx + cy * cy - rho_max * cz * cz
    B = 2.0 * (bx * cx + by * cy - rho_max * bz * cz)
    D = 2.0 * (ax * bx + ay * by - rho_max * az * bz)
    E = 2.0 * (ax * cx + ay * cy - rho_max * az * cz)
    thresh = rho_max * 1.001 + 1e-6      # keep marginal pairs (f32 slack)

    def rho_at(px, py):
        kx = ax + px * bx + py * cx
        ky = ay + px * by + py * cy
        kz = az + px * bz + py * cz
        return (kx * kx + ky * ky) / jnp.maximum(kz * kz, 1e-24)

    safe = lambda q: jnp.where(jnp.abs(q) < 1e-20,
                               jnp.where(q < 0, -1e-20, 1e-20), q)
    for px, py in ((xlo, ylo), (xlo, yhi), (xhi, ylo), (xhi, yhi)):
        hit |= rho_at(px, py) <= thresh
    for py in (ylo, yhi):                 # dQ/dx = 0 on horizontal edges
        px = jnp.clip(-(B * py + D) / (2.0 * safe(A)), xlo, xhi)
        hit |= rho_at(px, py) <= thresh
    for px in (xlo, xhi):                 # dQ/dy = 0 on vertical edges
        py = jnp.clip(-(B * px + E) / (2.0 * safe(C)), ylo, yhi)
        hit |= rho_at(px, py) <= thresh
    det = safe(4.0 * A * C - B * B)       # interior stationary point
    px = jnp.clip((B * E - 2.0 * C * D) / det, xlo, xhi)
    py = jnp.clip((B * D - 2.0 * A * E) / det, ylo, yhi)
    hit |= rho_at(px, py) <= thresh
    return hit


EXP_BLK = 1024   # duplicate slots per expansion-kernel grid step


def _expand_kernel(total_ref, g_ref, tid_ref, sid_ref, *, tiles_x,
                   tile_w, tile_h, n, sentinel, has_cull):
    """Per-duplicate (tile_id, surf_id) from gathered table rows.

    One Pallas pass over the row-major gathered table: XLA materializes
    every row read of a [cap, R] gather result as its own strided
    full-array pass (~2 ms each, ~20 of them); here the block transposes
    once in VMEM and all the expansion arithmetic (nibble pick, divmod)
    runs lane-wise in registers. The table arrives int32 (see
    bin_surfels_stream — f32-bitcast ints are denormals XLA flushes);
    the in-kernel f32 bitcast exists only because Mosaic transposes f32
    blocks, and is lane-exact both ways."""
    c = pl.program_id(0)
    gf = jnp.transpose(
        jax.lax.bitcast_convert_type(g_ref[:, :], jnp.float32),
        (1, 0))                                      # [R, BLK]
    row_i = lambda i: jax.lax.bitcast_convert_type(gf[i:i + 1, :],
                                                   jnp.int32)
    slot = c * EXP_BLK + jax.lax.broadcasted_iota(jnp.int32, (1, EXP_BLK),
                                                  1)
    x0, y0, nx = row_i(0), row_i(1), row_i(2)
    k = slot - row_i(3)
    in_stream = slot < total_ref[0]
    if has_cull:
        is_small = row_i(5) > 0
        kk = jnp.clip(k, 0, CULL_KMAX - 1)
        # k-th 4-bit rect position: select word, variable lane shift
        prow = jnp.where(kk < 8, row_i(6), row_i(7))
        pk = (prow >> ((kk & 7) * 4)) & 15
        k = jnp.where(is_small, pk, k)
    # exact divmod via f32 divide + fixup (VPU int division is very slow)
    nxf = jnp.maximum(nx.astype(jnp.float32), 1.0)
    q = jnp.floor(k.astype(jnp.float32) / nxf).astype(jnp.int32)
    r = k - q * nx
    over = (r >= nx).astype(jnp.int32)
    q, r = q + over, r - over * nx
    neg = (r < 0).astype(jnp.int32)
    q, r = q - neg, r + neg * nx
    tx = x0 + r
    ty = y0 + q
    tid = ty * tiles_x + tx
    tid_ref[0] = jnp.where(in_stream, tid, sentinel).reshape(8, 128)
    sid_ref[0] = jnp.where(in_stream, row_i(4), n).reshape(8, 128)


def _expand_stream(g, total_capped, tiles_x, tile_w, tile_h, n, sentinel,
                   has_cull, interpret):
    """g [capp, R] f32 (capp % EXP_BLK == 0) → (tile_id, surf_id) [capp]."""
    import functools
    capp, rows = g.shape
    assert capp % EXP_BLK == 0
    kern = functools.partial(_expand_kernel, tiles_x=tiles_x,
                             tile_w=tile_w, tile_h=tile_h, n=n,
                             sentinel=sentinel, has_cull=has_cull)
    tid, sid = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(capp // EXP_BLK,),
            in_specs=[pl.BlockSpec((EXP_BLK, rows), lambda c, tot: (c, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[
                pl.BlockSpec((1, 8, 128), lambda c, tot: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, 128), lambda c, tot: (c, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((capp // EXP_BLK, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((capp // EXP_BLK, 8, 128), jnp.int32),
        ],
        interpret=interpret,
    )(total_capped.reshape(1), g)
    return tid.reshape(-1), sid.reshape(-1)


def bin_surfels_stream(center2d, ext, depth, valid, width: int, height: int,
                       tile_w: int, tile_h: int, dup_capacity: int,
                       max_tiles_per_surfel: int = 256,
                       cull=None, interpret=None) -> StreamBinning:
    """center2d [N,2], ext [N,2] per-axis extents, depth [N], valid [N].

    ``dup_capacity`` (multiple of S_CHUNK) is the static stream size; on
    overflow the farthest surfels' duplicates are dropped (``overflow``).

    ``cull`` [N, 11] (preprocess ``SurfelScreen.cull``) enables the exact
    conic tile test: AABB tiles where neither the ρ3d conic nor the
    low-pass disc can reach α ≥ 1/255 are dropped from the stream
    (~18% of duplicates on street scenes — the AABB's corner tiles).
    Exact: the pair condition ρ3d ≤ ρ_max ⟺ Q(p) ≤ 0 for the quadratic
    Q = kx²+ky²−ρ_max·kz², and min of a quadratic over a rect is attained
    at a corner, an edge-critical or the interior stationary point — all
    candidates are evaluated (via the well-conditioned ratio ρ3d, which
    is second-order insensitive to f32 error in candidate locations).
    The test runs PRE-expansion for surfels spanning ≤ CULL_KMAX AABB
    tiles (all of them on street scenes); wider surfels keep their
    (capped) rectangle tiles unculled — correct, marginally more
    duplicates — so the conic coefficients stay out of the [cap]-row
    expansion gather (round 3 carried 13 extra columns through it).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    tiles_x = -(-width // tile_w)
    tiles_y = -(-height // tile_h)
    n_tiles = tiles_x * tiles_y
    sentinel = n_tiles
    n = center2d.shape[0]
    cap = dup_capacity
    assert cap % S_CHUNK == 0

    # -- per-surfel tile ranges, computed in ORIGINAL surfel order (all
    # elementwise); only the final compact table is gathered into
    # depth-rank order — ONE [N]-row take instead of round 3's two
    cx, cy = center2d[:, 0], center2d[:, 1]
    ex, ey = ext[:, 0], ext[:, 1]
    vf = valid
    x0 = jnp.clip(jnp.floor((cx - ex) / tile_w), 0, tiles_x - 1).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((cx + ex) / tile_w), 0, tiles_x - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((cy - ey) / tile_h), 0, tiles_y - 1).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((cy + ey) / tile_h), 0, tiles_y - 1).astype(jnp.int32)
    nx = x1 - x0 + 1
    rect_nt = nx * (y1 - y0 + 1)
    nt = jnp.where(vf, jnp.minimum(rect_nt, max_tiles_per_surfel), 0)

    cull_cols = []
    if cull is not None:
        # -- pre-expansion exact counts: for surfels whose AABB spans at
        # most CULL_KMAX tiles (the vast majority; EVERY surfel in the
        # bench street scene), test every candidate tile NOW so culled
        # tiles never enter the duplicate stream at all — the stream,
        # sort, gather and scatter all shrink ~18% (1.42M → 1.16M dups at
        # the bench shape). The compact passing-tile list (rect order) is
        # built with one tiny [N, K] lane sort. Wider surfels keep their
        # (max_tiles_per_surfel-capped) rectangle counts uncul led — the
        # conic coefficients no longer ride the [cap]-row expansion
        # gather (13 of its 21 columns in round 3, ~4 ms of gather).
        coefs_k = tuple(jnp.concatenate([cull, center2d], axis=1)[:, i:i + 1]
                        for i in range(13))
        ks = jnp.arange(CULL_KMAX, dtype=jnp.int32)[None, :]
        nx_safe = jnp.maximum(nx, 1)[:, None]
        kyk, kxk = _divmod_small(jnp.broadcast_to(ks, (n, CULL_KMAX)),
                                 nx_safe)
        txk = x0[:, None] + kxk
        tyk = y0[:, None] + kyk
        passk = ((ks < rect_nt[:, None])
                 & _tile_can_contribute(coefs_k, txk, tyk, tile_w, tile_h))
        small = (rect_nt <= CULL_KMAX) & vf
        exact_nt = jnp.sum(passk, axis=1).astype(jnp.int32)
        nt = jnp.where(small,
                       jnp.minimum(exact_nt, max_tiles_per_surfel), nt)
        # compact list: passing tiles first, rect order preserved. Entries
        # are 4-bit RECT POSITIONS (k < K = 16) packed 8-per-int32 into
        # TWO words, so the expansion below picks tile k with one select +
        # one variable shift instead of a K-way select over K gathered
        # rows (measured: 16 full-[cap] select passes ≈ 34 ms).
        keys = jnp.where(passk, ks, CULL_KMAX + ks)
        (keys_sorted,) = jax.lax.sort((keys,), num_keys=1,
                                      is_stable=True)     # [N, K]
        pos = keys_sorted % CULL_KMAX
        nib = (jnp.arange(CULL_KMAX, dtype=jnp.int32) % 8) * 4
        cull_cols = [small[:, None].astype(jnp.int32)] + [
            jnp.sum(pos[:, j:j + 8] << nib[None, :8], axis=1,
                    dtype=jnp.int32)[:, None] for j in (0, 8)]

    # -- depth-rank order: ONE fused take of the per-surfel table; only
    # nt needs reordering before the dup_start cumsum
    order = jnp.argsort(jnp.where(vf, depth, jnp.inf)).astype(jnp.int32)
    tbl_orig = jnp.concatenate(
        [x0[:, None], y0[:, None], jnp.maximum(nx, 1)[:, None],
         nt[:, None]] + cull_cols, axis=1)           # [N, 4(+3)] i32
    tbl_s = jnp.take(tbl_orig, order, axis=0)
    nt_s = tbl_s[:, 3]
    dup_start = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                 jnp.cumsum(nt_s).astype(jnp.int32)])
    total = dup_start[-1]

    # -- duplicate expansion: rank via marks+cumsum, ONE row-major gather
    # (XLA's fast gather form), then the Pallas _expand_kernel consumes
    # the gathered rows in a single pass (transposing each block once in
    # VMEM). The table is int32 END-TO-END: round 3 carried float conic
    # columns and rode the ints through f32 bitcasts to share one gather
    # — with the conic cull fully pre-expansion the floats are gone, and
    # the bitcast trick is actively DANGEROUS on TPU: small ints bitcast
    # to f32 are denormals, preserved by pure data movement but flushed
    # to zero when XLA:TPU fuses them through any arithmetic op (the
    # round-4 all-black renders: standalone binning was byte-exact while
    # the fused-in-rasterize program zeroed the gathered tile table).
    capp = -(-cap // EXP_BLK) * EXP_BLK
    marks = jnp.zeros((capp,), jnp.int32).at[dup_start[1:-1]].add(
        1, mode="drop")
    rank = jnp.minimum(jnp.cumsum(marks), n - 1)
    tbl = jnp.concatenate(
        [tbl_s[:, 0:3], dup_start[:-1][:, None], order[:, None]]
        + ([tbl_s[:, 4:7]] if cull is not None else []),
        axis=1)                                     # [N, 5(+3)] i32
    g = jnp.take(tbl, rank, axis=0, mode="clip")    # [capp, rows]
    tile_id, surf_id = _expand_stream(
        g, jnp.minimum(total, cap), tiles_x, tile_w, tile_h, n, sentinel,
        cull is not None, interpret)
    tile_id = tile_id[:cap]
    surf_id = surf_id[:cap]

    # -- stable single-key sort: depth order within each tile is preserved
    s_tile, s_surf = jax.lax.sort((tile_id, surf_id), num_keys=1,
                                  is_stable=True)
    off = jnp.searchsorted(
        s_tile, jnp.arange(n_tiles + 1, dtype=jnp.int32),
        side="left").astype(jnp.int32)

    # -- visit schedule ([T]-sized math only). Tiles with no duplicates
    # get ONE empty visit (lane range lo==hi, aliasing the boundary
    # chunk): the kernel's first-visit init zeroes their output blocks,
    # so the caller never needs a counts>0 mask over the full [T,PIX,CH]
    # accumulator (two full-array select passes per direction).
    counts = off[1:] - off[:-1]
    first_chunk = off[:-1] // S_CHUNK
    last_chunk = jnp.maximum(off[1:] - 1, 0) // S_CHUNK
    nvis_t = jnp.where(counts > 0, last_chunk - first_chunk + 1, 1)
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
                         overflow=total > cap, demand=total)
