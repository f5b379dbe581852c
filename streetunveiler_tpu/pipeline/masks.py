"""Stage B2 — inpainting condition preparation (reference
``inpainting_pipeline/2_condition_preparation/2_generate_inpainted_mask.py``).

1. Expand the removal set to nearby surfels by mean-KNN distance to the
   removed cloud: trainable < 4e-2, editable < 2e-2 (reference :71-89).
2. Per (front) frame: removal mask = dilate(|α_full − α_without| > 0.01)
   by a 5×5 kernel (:132-137), plus background-only renders used as
   inpaint conditions (:139-159).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.gaussians import SurfelState
from ..ops.knn import mean_dist_to_reference
from ..renderer import render

TRAINABLE_DIST = 4e-2    # reference 2_generate_inpainted_mask.py:71-89
EDITABLE_DIST = 2e-2
ALPHA_DIFF_THRESH = 0.01
DILATE_PX = 5


class RemovalMasks(NamedTuple):
    removed: np.ndarray     # [C] the selected instance surfels
    editable: np.ndarray    # [C] removed + close neighbors (tight)
    trainable: np.ndarray   # [C] removed + wider neighborhood


def include_neighbor_pcd(state: SurfelState, removed_mask) -> RemovalMasks:
    """Reference ``include_neighbor_pcd``: distances of every surfel to the
    removed sub-cloud select the editable/trainable neighborhoods."""
    removed = np.asarray(removed_mask) & np.asarray(state.alive)
    xyz = np.asarray(state.params.xyz)
    ref = xyz[removed]
    if ref.shape[0] == 0:
        z = np.zeros_like(removed)
        return RemovalMasks(removed, z.copy(), z.copy())
    d = mean_dist_to_reference(xyz, ref)
    alive = np.asarray(state.alive)
    return RemovalMasks(
        removed=removed,
        editable=((d < EDITABLE_DIST) | removed) & alive,
        trainable=((d < TRAINABLE_DIST) | removed) & alive)


def dilate(mask, radius: int = DILATE_PX):
    """Binary dilation by a (2r+1)² square kernel via max-pooling."""
    m = mask.astype(jnp.float32)[None, :, :, None]
    k = 2 * radius + 1
    out = jax.lax.reduce_window(m, -jnp.inf, jax.lax.max,
                                (1, k, k, 1), (1, 1, 1, 1), "SAME")
    return out[0, :, :, 0] > 0.5


def removal_mask_for_frame(camera, state: SurfelState, removed_mask, bg,
                           dilate_px: int = DILATE_PX, **render_kwargs):
    """Per-frame removal mask + background-only render (the inpaint
    conditions). Returns dict(mask [H,W] bool, rgb/depth/normal without
    the instance)."""
    keep = jnp.asarray(~np.asarray(removed_mask))
    full = render(camera, state, bg, **render_kwargs)
    wo = render(camera, state, bg, opacity_mask=keep, **render_kwargs)
    diff = jnp.abs(full.rend_alpha - wo.rend_alpha) > ALPHA_DIFF_THRESH
    mask = dilate(diff, dilate_px)
    return dict(mask=mask,
                rgb_without=wo.render,
                depth_without=wo.surf_depth,
                normal_without=wo.rend_normal,
                alpha_without=wo.rend_alpha,
                rgb_full=full.render)
