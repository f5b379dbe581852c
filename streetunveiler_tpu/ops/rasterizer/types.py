"""Shared types for the 2DGS rasterizer."""

from __future__ import annotations

import dataclasses
from typing import Any

import jax


# Numerical constants of the 2DGS blending semantics (the reference rasterizer
# behavior the oracle pins down; SURVEY.md §3.5).
ALPHA_EPS = 1.0 / 255.0     # minimum contribution weight
ALPHA_MAX = 0.99            # opacity clamp
T_EPS = 1e-4                # early-termination transmittance
FILTER_INV_SQUARE = 2.0     # screen-space low-pass: rho2d = 2 * d^2
MEDIAN_T = 0.5              # transmittance threshold for median depth
DETACH_FILTER = True        # low-pass branch contributes no position grads


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RasterizeSettings:
    """Static rasterization configuration (all fields static → jit keys)."""

    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))
    znear: float = dataclasses.field(default=0.2, metadata=dict(static=True))
    zfar: float = dataclasses.field(default=100.0, metadata=dict(static=True))
    # depth range used by the distortion mapping (reference kernel behavior)
    scale_modifier: float = dataclasses.field(default=1.0, metadata=dict(static=True))
    # Early-termination transmittance (the reference CUDA loop break).
    # The trigger comparison ``t_after < t_eps`` is a knife-edge on f32
    # rounding: implementations that compute T differently (cumprod vs
    # log-space; CUDA vs XLA vs Mosaic) flip which pair triggers at a few
    # pixels, each flip moving one weight of up to t_eps·a/(1−a) — an
    # inherent, bounded reimplementation discrepancy. Set 0.0 to disable
    # termination entirely (exact-parity testing; slower on deep scenes).
    # FORWARD-ONLY: the Pallas backward reconstructs per-pair
    # transmittance by dividing suffix products out of the saved final T,
    # so it needs the termination floor T ≳ t_eps — at 0.0 the final T
    # underflows f32 on deep occlusion stacks and gradients explode.
    t_eps: float = dataclasses.field(default=T_EPS, metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RenderOutput:
    """All rasterizer outputs, channels-last.

    ``expected_depth``/``normal`` are alpha-weighted and unnormalized, exactly
    like allmap ch0/ch2-4 (the caller normalizes by ``alpha``, cf. reference
    ``gaussian_renderer/__init__.py:155-169``).
    """

    color: Any          # [H, W, C]
    alpha: Any          # [H, W]
    expected_depth: Any  # [H, W]
    normal: Any         # [H, W, 3] view-space
    median_depth: Any   # [H, W]
    distortion: Any     # [H, W]
    radii: Any          # [N] float screen-space radius (0 = culled)
    overflow: Any = False   # [] bool — duplicate stream truncated (the
    #                         farthest surfels were dropped); surface this
    #                         in training metrics to size duplicate_capacity
    demand: Any = None  # [] i32 — uncapped duplicate total of the binning
    #                     (the capacity an overflow-free render needs);
    #                     drives the capacity auto-bump in the train loop
    extra: Any = None   # [H, W, E] extra payload channels blended with the
    #                     same weights as color (fused multi-pass rendering,
    #                     e.g. semantic class probabilities)
    class_dist: Any = None  # [H, W, G] per-class gated depth-distortion
    #                         maps from the fused multi-gate kernel
