"""High-level differentiable renders — the TPU ``gaussian_renderer``.

Re-creates the four reference entry points (``gaussian_renderer/__init__.py``:
``render`` :18, ``render_with_mask`` :190, ``render_semantic`` :327,
``render_semantic_with_mask`` :462) as pure functions over the
``SurfelState`` pytree. The dict contract of the reference is preserved as
a dataclass with the same keys/semantics (SURVEY.md §1 renderer layer).

Differences by design:
* masking is just opacity gating — no separate CUDA entry point needed;
* the zero ``means2D`` grad-tap tensor is replaced by the explicit
  ``center2d_offset`` input (pass a zeros array, take grads w.r.t. it);
* normals are produced in view space (rotation-invariant for the losses)
  with world-space copies computed on demand.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .models.gaussians import SurfelState
from .ops.depth_normal import depth_to_normal
from .ops.rasterizer import RasterizeSettings, rasterize, rasterize_oracle
from .ops.sh import eval_sh
from .scene.cameras import Camera


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RenderResult:
    """The reference render-dict contract, channels-last."""
    render: Any          # [H, W, 3]
    rend_alpha: Any      # [H, W]
    rend_normal: Any     # [H, W, 3] view-space, alpha-weighted
    rend_dist: Any       # [H, W] depth-distortion accumulator
    surf_depth: Any      # [H, W]
    surf_normal: Any     # [H, W, 3] view-space, alpha-weighted
    radii: Any           # [C] screen radii (0 = culled)
    expected_depth: Any  # [H, W] unnormalized (allmap ch0)
    median_depth: Any    # [H, W]
    overflow: Any = False   # [] bool — duplicate stream truncated
    demand: Any = None   # [] i32 uncapped duplicate total (capacity sizing)
    extra: Any = None    # [H, W, E] fused extra payload channels
    class_dist: Any = None  # [H, W, G] fused per-class distortion maps

    @property
    def visibility_filter(self):
        return self.radii > 0

    def rend_normal_world(self, camera: Camera):
        return jnp.matmul(self.rend_normal, camera.w2c[:3, :3],
                          precision=jax.lax.Precision.HIGHEST)

    def surf_normal_world(self, camera: Camera):
        return jnp.matmul(self.surf_normal, camera.w2c[:3, :3],
                          precision=jax.lax.Precision.HIGHEST)


def _settings_for(camera: Camera, scale_modifier: float) -> RasterizeSettings:
    return RasterizeSettings(width=camera.width, height=camera.height,
                             znear=0.2, zfar=100.0,
                             scale_modifier=scale_modifier)


def surfel_colors(state: SurfelState, camera: Camera, active_sh_degree):
    """Per-surfel view-dependent RGB: SH decode + 0.5 shift, clamped ≥ 0
    (the rasterizer-internal convention the reference relies on)."""
    dirs = state.params.xyz - camera.camera_center[None, :]
    dirs = dirs / jnp.sqrt(jnp.maximum(
        jnp.sum(dirs * dirs, axis=-1, keepdims=True), 1e-12))
    feats = state.get_features()
    # static max degree; lower active degrees are realized by zeroing the
    # tail bands (warmup trains them from zero anyway — oneupSHdegree)
    k = feats.shape[1]
    band = jnp.asarray(np.repeat(np.arange(state.sh_degree + 1),
                                 2 * np.arange(state.sh_degree + 1) + 1)[:k])
    feats = jnp.where((band <= active_sh_degree)[None, :, None], feats, 0.0)
    rgb = eval_sh(state.sh_degree, feats, dirs) + 0.5
    return jnp.maximum(rgb, 0.0)


def bin_camera(camera: Camera, state: SurfelState,
               scale_modifier: float = 1.0, opacity_mask=None,
               center2d_offset=None, interpret: bool | None = None,
               duplicate_capacity: int | None = None,
               max_tiles_per_surfel: int = 256):
    """Phase 1 of a two-phase render: tile binning alone → StreamBinning.

    Jit this separately and pass the result to ``render(..., binning=...)``:
    the visit schedule then enters the blend kernels as top-level
    executable arguments, sidestepping the Mosaic dynamic scalar-prefetch
    tax (~13 ms/direction at the bench shape — docs/profile.md). Must see
    the same geometry/opacity inputs as the subsequent ``render`` call.
    """
    from .ops.rasterizer.api import bin_for_camera
    opac = state.get_opacity()[:, 0]
    if opacity_mask is not None:
        opac = jnp.where(opacity_mask, opac, 0.0)
    settings = _settings_for(camera, scale_modifier)
    return bin_for_camera(state.params.xyz, state.get_scaling(),
                          state.get_rotation(), opac, camera.w2c, camera.K,
                          settings, max_tiles_per_surfel=max_tiles_per_surfel,
                          duplicate_capacity=duplicate_capacity,
                          center2d_offset=center2d_offset,
                          interpret=interpret)


def round_capacity(demand: int, headroom: float = 1.2) -> int:
    """Chunk-aligned static duplicate capacity for a measured demand."""
    from .ops.rasterizer.kernel import S_CHUNK
    cap = int(demand * headroom) + S_CHUNK
    return -(-cap // S_CHUNK) * S_CHUNK


def measure_duplicate_capacity(cameras, state: SurfelState,
                               headroom: float = 1.2, sample: int = 8,
                               interpret: bool | None = None) -> int:
    """Measure the true duplicate demand of ``state`` over (a sample of)
    ``cameras`` and return an overflow-free static capacity.

    The binning computes its uncapped total (``StreamBinning.demand``)
    before truncation, so the probe is exact at ANY probe capacity — one
    cheap binning executable per distinct camera size. Use this to size
    ``duplicate_capacity`` for eval/render/mesh drivers instead of the
    4.5-tiles/surfel default, which silently truncates on scenes with
    larger splats (the round-4 config-2 GT corruption: true demand was
    6.1 tiles/surfel and every GT render dropped ~25% of its duplicates).
    """
    cams = list(cameras)
    if len(cams) > sample:          # evenly spaced sample
        idx = np.linspace(0, len(cams) - 1, sample).astype(int)
        cams = [cams[i] for i in idx]
    bin_jit = jax.jit(bin_camera,
                      static_argnames=("interpret", "duplicate_capacity",
                                       "max_tiles_per_surfel"))
    demand = 0
    for cam in cams:
        b = bin_jit(cam, state, interpret=interpret)
        demand = max(demand, int(b.demand))
    return round_capacity(demand, headroom)


def render(camera: Camera, state: SurfelState, bg,
           active_sh_degree=3, scale_modifier: float = 1.0,
           depth_ratio: float = 0.0, opacity_mask=None,
           colors_override=None, center2d_offset=None,
           interpret: bool | None = None, use_oracle: bool = False,
           duplicate_capacity: int | None = None,
           extra_payload=None, class_gates=None,
           binning=None) -> RenderResult:
    """Differentiable render of a SurfelState through the Pallas kernels.

    opacity_mask [C] bool: surfels where False render with opacity 0 —
    subsumes the reference's ``render_with_mask`` (its ``valid_mask``/
    ``invert`` bitmask filtering, ``gaussian_renderer/__init__.py:87-94``).
    colors_override [C,3]: skip SH decode (the semantic passes).
    extra_payload [C,E]: extra channels blended in the same kernel pass
    (→ ``result.extra``) — the fused replacement for separate semantic
    rasterizations.
    binning: a precomputed StreamBinning from ``bin_camera`` (two-phase
    step; must come from the same state/camera/mask).
    """
    opac = state.get_opacity()[:, 0]
    if opacity_mask is not None:
        opac = jnp.where(opacity_mask, opac, 0.0)
    colors = (colors_override if colors_override is not None
              else surfel_colors(state, camera, active_sh_degree))

    settings = _settings_for(camera, scale_modifier)
    raster = rasterize_oracle if use_oracle else rasterize
    kwargs = {} if use_oracle else dict(
        interpret=interpret, duplicate_capacity=duplicate_capacity,
        extra_payload=extra_payload, class_gates=class_gates,
        binning=binning)
    out = raster(state.params.xyz, state.get_scaling(), state.get_rotation(),
                 opac, colors, camera.w2c, camera.K, settings,
                 bg=jnp.asarray(bg), center2d_offset=center2d_offset,
                 **kwargs)
    return finalize_render(out, camera, depth_ratio=depth_ratio)


def finalize_render(out, camera: Camera, depth_ratio: float = 0.0
                    ) -> RenderResult:
    """RenderOutput → the reference render-dict contract (depth mix +
    depth→normal pseudo surface, ``gaussian_renderer/__init__.py:149-174``)."""
    alpha = out.alpha
    exp_depth = jnp.nan_to_num(out.expected_depth
                               / jnp.maximum(alpha, 1e-8))
    surf_depth = exp_depth * (1.0 - depth_ratio) + depth_ratio * jnp.nan_to_num(
        out.median_depth)
    surf_normal = depth_to_normal(surf_depth, camera.K)
    surf_normal = surf_normal * jax.lax.stop_gradient(alpha)[..., None]

    return RenderResult(
        render=out.color,
        rend_alpha=alpha,
        rend_normal=out.normal,
        rend_dist=out.distortion,
        surf_depth=surf_depth,
        surf_normal=surf_normal,
        radii=out.radii,
        expected_depth=out.expected_depth,
        median_depth=out.median_depth,
        overflow=getattr(out, "overflow", False),
        demand=getattr(out, "demand", None),
        extra=getattr(out, "extra", None),
        class_dist=getattr(out, "class_dist", None),
    )


def semantic_class_mask(state: SurfelState, class_bits: int,
                        reverse: bool = True):
    """Opacity mask for bitmask semantic filtering (reference
    ``gaussian_renderer/__init__.py:87-94``): reverse=True keeps surfels
    *in* the class, reverse=False keeps the complement."""
    m = state.semantic_mask(class_bits)
    return m if reverse else ~m


def render_semantic(camera: Camera, state: SurfelState,
                    num_classes: int = 6, sky_index: int = 4,
                    scale_modifier: float = 1.0, opacity_mask=None,
                    center2d_offset=None, interpret: bool | None = None,
                    duplicate_capacity: int | None = None):
    """Semantic probability rendering (reference ``render_semantic`` :327).

    Splats each surfel's one-hot class vector as color, 3 channels per
    pass, with the sky-class prior as background (empty pixels read as
    sky). Returns [H, W, num_classes] composited probabilities.
    """
    onehot = jax.nn.one_hot(state.semantics, num_classes, dtype=jnp.float32)
    res = render(camera, state, jnp.zeros(3), scale_modifier=scale_modifier,
                 opacity_mask=opacity_mask,
                 colors_override=onehot[:, 0:3],
                 extra_payload=onehot[:, 3:num_classes],
                 center2d_offset=center2d_offset, interpret=interpret,
                 duplicate_capacity=duplicate_capacity)
    probs = jnp.concatenate([res.render, res.extra], axis=-1)
    # sky prior: empty pixels read as sky (the reference passes it as the
    # per-pass rasterizer background, gaussian_renderer/__init__.py:347-358)
    sky_prior = jax.nn.one_hot(sky_index, num_classes, dtype=jnp.float32)
    return probs + sky_prior * (1.0 - res.rend_alpha)[..., None]
