"""Public rasterization API: tiled Pallas path with full autodiff.

``rasterize`` is the TPU equivalent of constructing the reference's
``GaussianRasterizer(settings)(...)`` (``gaussian_renderer/__init__.py:39-54``)
— one differentiable call producing the full output contract. Differences by
design (SURVEY.md §7.1):

* colors are precomputed by the caller (SH decode lives in jnp where
  autodiff handles it) — like the reference's ``colors_precomp`` path;
* the screen-space position gradient used by densification is exposed via
  the ``center2d`` reparameterization instead of a zero-tensor grad tap
  (SURVEY.md §7.4);
* static capacity knobs (``max_tiles_per_surfel``, ``duplicate_capacity``)
  replace the CUDA dynamic allocations so everything jits once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .kernel import (CH, NQ, PIX, Q_ROW0, S_CHUNK, TILE_H, TILE_W,
                     blend_stream, ch_for, pack_geometry_T)
from .preprocess import preprocess_surfels
from .tiles import bin_surfels_stream
from .types import RasterizeSettings, RenderOutput


def default_duplicate_capacity(n_surfels: int, width: int, height: int,
                               avg_tiles_per_surfel: float = 4.5) -> int:
    """A practical static capacity for the sorted duplicate stream.

    4.5 tiles/surfel holds ~16% headroom over the bench street scene's
    measured 4.48 (1.16M culled duplicates / 259k valid surfels; round 3
    shipped 5.0 = 23% slack, and every per-duplicate op — sort, gathers,
    the backward grad scatter — pays for the slack). Undersizing degrades
    gracefully — farthest surfels drop and ``RenderOutput.overflow``
    flags it (the train loop surfaces an overflow fraction)."""
    cap = int(n_surfels * avg_tiles_per_surfel) + 16 * S_CHUNK
    return -(-cap // S_CHUNK) * S_CHUNK


def bin_for_camera(means3d, scales, quats, opacities, w2c, K,
                   settings: RasterizeSettings,
                   max_tiles_per_surfel: int = 256,
                   duplicate_capacity: int | None = None,
                   center2d_offset=None,
                   interpret: bool | None = None):
    """Preprocess + tile binning alone → ``StreamBinning`` (stop-grad).

    Run this as its OWN jit and pass the result to ``rasterize(...,
    binning=...)`` (a "two-phase" step): the binning is stop-gradient by
    construction, and feeding the visit schedule to the blend kernels as
    top-level executable arguments avoids the Mosaic scalar-prefetch
    composition tax (~13 ms/direction at the bench shape, measured by
    tools/probe_compose*.py / probe_split.py). ``tiles_x``/``tiles_y``
    are static pytree aux-data, so the result crosses jit boundaries
    intact — no host-side fixup.

    ``center2d_offset`` mirrors ``rasterize``'s densification grad-tap
    reparameterization so a two-phase step culls/bins the same geometry
    (the offset is numerically zero in training; it exists for grads).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = means3d.shape[0]
    if duplicate_capacity is None:
        duplicate_capacity = default_duplicate_capacity(
            n, settings.width, settings.height)
    zeros3 = jnp.zeros((n, 3))
    sur = preprocess_surfels(means3d, scales, quats, opacities, zeros3,
                             w2c, K, settings,
                             center2d_offset=center2d_offset)
    sg = jax.lax.stop_gradient
    return bin_surfels_stream(sg(sur.center2d), sg(sur.ext), sg(sur.depth),
                              sur.valid, settings.width, settings.height,
                              TILE_W, TILE_H, duplicate_capacity,
                              max_tiles_per_surfel, cull=sg(sur.cull),
                              interpret=interpret)


@jax.custom_vjp
def _gather_records(packT, idx):
    """``jnp.take(packT, idx, axis=1)`` with a row-padded backward.

    The VJP of a lane-axis take is a column scatter-add, and XLA:TPU's
    scatter lowering is wildly row-count dependent: ≤16 update rows hit
    a slow path (measured 82 ms at the bench shape for 16 rows vs 23.5
    ms for 17 — tools/probe_scatter3.py), so the backward zero-pads the
    cotangent to 17 rows before scattering and slices the result back.
    """
    return jnp.take(packT, idx, axis=1)


def _gather_records_fwd(packT, idx):
    return jnp.take(packT, idx, axis=1), (idx, packT.shape)


def _gather_records_bwd(res, g):
    idx, (rows, ncols) = res
    pad = max(0, 17 - rows)
    if pad:
        g = jnp.concatenate(
            [g, jnp.zeros((pad, g.shape[1]), g.dtype)], axis=0)
    out = jnp.zeros((rows + pad, ncols), g.dtype).at[:, idx].add(g)
    return (out[:rows] if pad else out), None


_gather_records.defvjp(_gather_records_fwd, _gather_records_bwd)


def bin_inputs_for_camera(means3d, scales, quats, opacities, w2c, K,
                          settings: RasterizeSettings,
                          center2d_offset=None):
    """Full-frame, slab-shiftable binning inputs (stop-grad).

    Returns ``(center2d, ext, depth, valid, cull)`` computed once with
    the FULL camera. A tile-sharded step computes these for a SHARD of
    surfels per device, all-gathers along 'tile', and derives each
    slab's binning via ``bin_slab_from_inputs`` — the per-surfel
    preprocess then runs once per data replica instead of once per tile
    device (VERDICT r3 #3). ``valid`` here uses the full-frame
    on-screen test; slab visibility (a subset) is re-derived per slab.
    """
    n = means3d.shape[0]
    zeros3 = jnp.zeros((n, 3))
    sur = preprocess_surfels(means3d, scales, quats, opacities, zeros3,
                             w2c, K, settings,
                             center2d_offset=center2d_offset)
    sg = jax.lax.stop_gradient
    return (sg(sur.center2d), sg(sur.ext), sg(sur.depth), sur.valid,
            sg(sur.cull))


def bin_slab_from_inputs(inputs, row0, width: int, slab_h: int,
                         duplicate_capacity: int,
                         max_tiles_per_surfel: int = 256,
                         interpret: bool | None = None):
    """Slab binning from full-frame ``bin_inputs_for_camera`` outputs.

    The slab camera is the full camera with ``cy -= row0`` (an exact
    crop), which acts linearly on every binning input:
    * ``center2d``: y shifts by −row0;
    * ``ext``: invariant (the conic's axis extents only translate);
    * ``cull``: k(p) = A + px·B + py·C, so py → py − row0 under the crop
      means the constant term becomes A + row0·C (equivalently: the
      M y-row r2' = r2 − row0·r3 gives A' = r1×r2' = A + row0·(r3×r1));
      B, C, ρ_max, d²max are invariant;
    * ``valid``: full-frame validity ∧ the slab's on-screen test (slab
      visibility implies full-frame visibility, so the full-frame flag
      is a safe base).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    c2d, ext, depth, valid, cull = inputs
    r0 = jnp.float32(row0)
    c2d_s = c2d - jnp.stack([jnp.float32(0.0), r0])
    cull_s = cull.at[:, 0:3].add(r0 * cull[:, 6:9])
    on_s = ((c2d_s[:, 0] + ext[:, 0] > 0)
            & (c2d_s[:, 0] - ext[:, 0] < width)
            & (c2d_s[:, 1] + ext[:, 1] > 0)
            & (c2d_s[:, 1] - ext[:, 1] < slab_h))
    valid_s = valid & on_s
    return bin_surfels_stream(c2d_s, ext, depth, valid_s, width, slab_h,
                              TILE_W, TILE_H, duplicate_capacity,
                              max_tiles_per_surfel, cull=cull_s,
                              interpret=interpret)


def encode_extra(extra_payload, class_gates):
    """Fold ``class_gates`` [N, G] bool into one exact-float bitmask row
    appended after ``extra_payload`` (shares the record pack + duplicate
    gather). Returns (pack_extra, n_gates)."""
    if class_gates is None:
        return extra_payload, 0
    n_gates = class_gates.shape[1]
    powers = jnp.asarray(2.0 ** jnp.arange(n_gates), jnp.float32)
    grow = jnp.sum(class_gates.astype(jnp.float32) * powers, axis=1,
                   keepdims=True)
    return (grow if extra_payload is None
            else jnp.concatenate([extra_payload, grow], axis=1)), n_gates


def shift_packT(packT, row0):
    """Re-express full-camera packed records for a row-slab crop.

    A slab camera differs from the full camera only by the principal
    point ``cy -= row0`` (parallel/shard.py's exact crop), which acts
    LINEARLY on the packed records: the y-components of M's stored
    columns (rows 1, 4) lose ``row0 ×`` their z-components (rows 2, 5),
    and the projected center's y row (7) shifts by ``row0``. Everything
    else (depth, opacity, color, normal, extra payload) is
    K-independent. This is what lets the tile-sharded step preprocess
    each surfel ONCE per data replica (sharded over 'tile', then
    all-gathered) instead of once per tile device — VERDICT r3 #3.

    The zero padding column stays non-contributing (its opacity row is
    0), though its center row becomes −row0.
    """
    r0 = jnp.float32(row0)
    return (packT.at[1].add(-r0 * packT[2])
                 .at[4].add(-r0 * packT[5])
                 .at[7].add(-r0))


def rasterize_stream(recT, radii, settings: RasterizeSettings, binning,
                     bg=None, nq: int = NQ, gates_n: int = 0,
                     interpret: bool | None = None) -> RenderOutput:
    """Blend + image assembly over an already-gathered record stream.

    ``recT`` [rec, cap] comes from ``_gather_records(packT,
    binning.sorted_surfel)``; ``settings.height`` is the height the
    binning was built for (a slab height in the tile-sharded step).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    num_tiles = binning.tiles_x * binning.tiles_y
    ch = ch_for(nq)
    acc, lk = blend_stream(recT, binning.tile_of_visit,
                           binning.chunk_of_visit, binning.first_of_tile,
                           binning.last_of_tile, binning.init_rev,
                           binning.lane_lo, binning.lane_hi,
                           num_tiles, binning.tiles_x, settings, interpret,
                           nq, gates_n, Q_ROW0 + nq)
    ch_tot = ch + 4 * gates_n

    # [T, PIX, ch_tot] → [ch_tot, H, W]
    h, w_img = settings.height, settings.width
    img = acc.reshape(binning.tiles_y, binning.tiles_x, TILE_H, TILE_W,
                      ch_tot)
    img = img.transpose(4, 0, 2, 1, 3).reshape(
        ch_tot, binning.tiles_y * TILE_H, binning.tiles_x * TILE_W)
    img = img[:, :h, :w_img]

    class_dist = None
    if gates_n:
        # fused gated chains: per class (alpha, m1, m2, lk) after the main
        # channels; distortion_g telescopes like the main term below
        al = img[ch + 0::4]
        m1d = img[ch + 1::4]
        m2d = img[ch + 2::4]
        class_dist = jnp.moveaxis(al * m2d - m1d * m1d, 0, -1)

    color = jnp.moveaxis(img[0:3], 0, -1)
    alpha = img[nq]
    if bg is not None:
        color = color + (1.0 - alpha)[..., None] * bg

    # Depth distortion via the symmetric-pair identity: the ordered pairwise
    # sum Σ_{j<i} w_i w_j (m_i−m_j)² telescopes to alpha·M2 − M1² — exact,
    # and its backward flows through the channel cotangents automatically.
    m1 = img[nq + 3]
    m2 = img[nq + 4]
    distortion = alpha * m2 - m1 * m1

    return RenderOutput(
        color=color,
        alpha=alpha,
        expected_depth=img[nq + 1],
        normal=jnp.moveaxis(img[3:6], 0, -1),
        median_depth=jax.lax.stop_gradient(img[nq + 5]),
        distortion=distortion,
        radii=radii,
        overflow=binning.overflow,
        demand=getattr(binning, "demand", None),
        extra=(None if nq == NQ else jnp.moveaxis(img[6:nq], 0, -1)),
        class_dist=class_dist,
    )


def rasterize(means3d, scales, quats, opacities, colors, w2c, K,
              settings: RasterizeSettings, bg=None,
              max_tiles_per_surfel: int = 256,
              duplicate_capacity: int | None = None,
              center2d_offset=None,
              interpret: bool | None = None,
              extra_payload=None, class_gates=None,
              binning=None) -> RenderOutput:
    """Differentiable tiled 2DGS render (Pallas TPU kernels).

    Same semantics as ``rasterize_oracle`` (tested to match); activated
    scales/opacities, ``colors`` [N, 3].

    ``extra_payload`` [N, E] blends E additional per-surfel channels with
    the same compositing weights in the SAME kernel pass (returned as
    ``out.extra`` [H, W, E]) — how the fused train step renders semantic
    class probabilities without extra rasterizations (the reference runs
    2 whole extra passes, gaussian_renderer/__init__.py:347-369).

    ``class_gates`` [N, G] bool fuses G per-class gated distortion chains
    INTO the main blend pass (sharing pair math, the record stream, the
    grid, and the backward's single pair vjp): ``out.class_dist``
    [H, W, G] holds each class's gated depth-distortion map — the
    reference's 5 per-class rasterizations (train.py:94-105) at the
    marginal cost of the extra transmittance recurrences.

    ``binning``: a precomputed ``StreamBinning`` from ``bin_for_camera``
    (the two-phase step). The binning's OWN capacities rule:
    ``duplicate_capacity`` / ``max_tiles_per_surfel`` passed here are
    ignored (asserted consistent when explicit) — the stream shape and
    visit schedule were fixed when the binning was built."""
    if interpret is None:
        # Mosaic only compiles for TPU; tests/virtual-device meshes run on
        # the CPU backend through the Pallas interpreter.
        interpret = jax.default_backend() == "cpu"
    n = means3d.shape[0]
    c = colors.shape[-1]
    if c != 3:
        raise ValueError(
            f"the blend kernel is templated for 3 color channels, got {c}; "
            "render multi-channel payloads in triples like the reference's "
            "semantic passes (gaussian_renderer/__init__.py:347-369)")
    if binning is not None:
        # the precomputed stream's shape rules; an explicit mismatching
        # capacity is a caller bug (ADVICE r3)
        assert (duplicate_capacity is None
                or duplicate_capacity == binning.sorted_surfel.shape[0]), (
            f"binning built with duplicate_capacity="
            f"{binning.sorted_surfel.shape[0]}, rasterize called with "
            f"{duplicate_capacity}")
        duplicate_capacity = binning.sorted_surfel.shape[0]
    elif duplicate_capacity is None:
        duplicate_capacity = default_duplicate_capacity(
            n, settings.width, settings.height)

    sur = preprocess_surfels(means3d, scales, quats, opacities, colors,
                             w2c, K, settings, center2d_offset=center2d_offset)

    nq = NQ + (0 if extra_payload is None else extra_payload.shape[1])
    pack_extra, gates_n = encode_extra(extra_payload, class_gates)

    sg = jax.lax.stop_gradient
    if binning is None:
        binning = bin_surfels_stream(sg(sur.center2d), sg(sur.ext),
                                     sg(sur.depth), sur.valid,
                                     settings.width, settings.height,
                                     TILE_W, TILE_H, duplicate_capacity,
                                     max_tiles_per_surfel,
                                     cull=sg(sur.cull), interpret=interpret)
    # else: a precomputed StreamBinning (``bin_for_camera``) — the
    # scalar-prefetch operands then enter the blend kernels as TOP-LEVEL
    # jit arguments, which sidesteps the Mosaic dynamic-scalar-prefetch
    # tax (docs/profile.md "composition overhead"): visit arrays produced
    # inside the SAME executable cost ~13 ms/direction extra.

    # lane-axis gather of the packed records — the step's one unavoidable
    # per-duplicate gather; builds the kernels' [rec, cap] layout directly
    recT = _gather_records(pack_geometry_T(sur, n, pack_extra),
                           binning.sorted_surfel)
    # (tiles with no duplicates get an empty init-only visit that zeroes
    # their blocks in-kernel — no counts>0 masking pass needed)
    return rasterize_stream(recT, sur.radius, settings, binning, bg=bg,
                            nq=nq, gates_n=gates_n, interpret=interpret)
