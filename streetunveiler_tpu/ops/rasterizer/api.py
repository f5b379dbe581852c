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
                   max_tiles_per_surfel: int = 64,
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


def rasterize(means3d, scales, quats, opacities, colors, w2c, K,
              settings: RasterizeSettings, bg=None,
              max_tiles_per_surfel: int = 64,
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
    ch = ch_for(nq)
    pack_extra = extra_payload
    if class_gates is not None:
        # per-surfel class bitmask as ONE exact-float record row past the
        # main payload — shares the record pack and the duplicate gather
        n_gates = class_gates.shape[1]
        powers = jnp.asarray(2.0 ** jnp.arange(n_gates), jnp.float32)
        grow = jnp.sum(class_gates.astype(jnp.float32) * powers, axis=1,
                       keepdims=True)
        pack_extra = (grow if pack_extra is None
                      else jnp.concatenate([pack_extra, grow], axis=1))

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

    num_tiles = binning.tiles_x * binning.tiles_y
    gates_n = 0 if class_gates is None else n_gates
    acc, lk = blend_stream(recT, binning.tile_of_visit,
                           binning.chunk_of_visit, binning.first_of_tile,
                           binning.last_of_tile, binning.init_rev,
                           binning.lane_lo, binning.lane_hi,
                           num_tiles, binning.tiles_x, settings, interpret,
                           nq, gates_n, Q_ROW0 + nq)
    ch_tot = ch + 4 * gates_n
    # (tiles with no duplicates get an empty init-only visit that zeroes
    # their blocks in-kernel — no counts>0 masking pass needed here)

    # [T, PIX, ch_tot] → [ch_tot, H, W]
    h, w_img = settings.height, settings.width
    img = acc.reshape(binning.tiles_y, binning.tiles_x, TILE_H, TILE_W,
                      ch_tot)
    img = img.transpose(4, 0, 2, 1, 3).reshape(
        ch_tot, binning.tiles_y * TILE_H, binning.tiles_x * TILE_W)
    img = img[:, :h, :w_img]

    class_dist = None
    if class_gates is not None:
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
        radii=sur.radius,
        overflow=binning.overflow,
        extra=(None if extra_payload is None
               else jnp.moveaxis(img[6:nq], 0, -1)),
        class_dist=class_dist,
    )
