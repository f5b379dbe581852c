"""Stage B2 — inpainting condition preparation (reference
``inpainting_pipeline/2_condition_preparation/2_generate_inpainted_mask.py``).

1. Expand the removal set to nearby surfels by mean-KNN distance to the
   removed cloud: trainable < 4e-2, editable < 2e-2 (reference :71-89).
2. Per (front) frame: removal mask = dilate(|α_full − α_without| > 0.01)
   by a 5×5 kernel (:132-137), plus background-only renders used as
   inpaint conditions (:139-159).
"""

from __future__ import annotations

import os
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
                alpha_full=full.rend_alpha,
                rgb_full=full.render)


def _save_png(path, arr):
    from PIL import Image
    a = np.asarray(arr)
    if a.dtype != np.uint8:
        a = (np.clip(a.astype(np.float32), 0, 1) * 255).astype(np.uint8)
    Image.fromarray(a).save(path)


def write_inpaint_conditions(scene, state: SurfelState, removed_mask,
                             workspace: str, bg, sky_images=None,
                             frames=None, duplicate_capacity=None):
    """Persist the per-frame stage-B condition artifacts in the reference
    layout (``2_generate_inpainted_mask.py:94-165``): for every frame
    ``mask_inpaint/{f:05d}.png|.npy`` (dilated α-difference removal mask),
    ``inpainted_rgb/`` (background-only render, the inpaint condition),
    ``inpainted_depth/`` (clamped disparity), ``inpainted_normal/``
    (0.5·n+0.5), ``original_rgb/`` and ``empty_opacity/`` (α − α_wo),
    plus ``valid_inpaint_frame.npy``. Returns {frame: mask [H,W] bool}.

    These directories are the filesystem half of the out-of-band inpainter
    contract — a GPU host running the real ZITS++/LeftRefill consumes them
    directly, exactly as the reference's stage C does (:127-199)."""
    dirs = {k: os.path.join(workspace, k)
            for k in ("mask_inpaint", "inpainted_rgb", "inpainted_depth",
                      "inpainted_normal", "original_rgb", "empty_opacity")}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)

    frames = list(range(len(scene.train_cameras))) if frames is None \
        else list(frames)
    out_masks = {}
    valid = []
    for f in frames:
        cam = scene.train_cameras[f]
        cond = removal_mask_for_frame(
            cam, state, removed_mask, bg,
            duplicate_capacity=duplicate_capacity)
        sky = None if sky_images is None else np.asarray(sky_images[f])
        rgb_full = np.asarray(cond["rgb_full"])
        rgb_wo = np.asarray(cond["rgb_without"])
        if sky is not None:
            # reference composites the sky with the FULL render's alpha in
            # both images (:113-119)
            a = np.asarray(cond["alpha_full"])[..., None]
            rgb_full = rgb_full + sky * (1.0 - a)
            rgb_wo = rgb_wo + sky * (1.0 - a)
        mask = np.asarray(cond["mask"], bool)
        out_masks[f] = mask
        _save_png(os.path.join(dirs["mask_inpaint"], f"{f:05d}.png"),
                  mask.astype(np.uint8) * 255)
        np.save(os.path.join(dirs["mask_inpaint"], f"{f:05d}.npy"), mask)
        _save_png(os.path.join(dirs["original_rgb"], f"{f:05d}.png"),
                  rgb_full)
        _save_png(os.path.join(dirs["inpainted_rgb"], f"{f:05d}.png"),
                  rgb_wo)
        disp = 1.0 / np.maximum(np.asarray(cond["depth_without"]), 1e-6)
        disp[~np.isfinite(disp)] = 0.0
        _save_png(os.path.join(dirs["inpainted_depth"], f"{f:05d}.png"),
                  np.repeat(np.clip(disp, 0, 1)[..., None], 3, -1))
        _save_png(os.path.join(dirs["inpainted_normal"], f"{f:05d}.png"),
                  np.asarray(cond["normal_without"]) * 0.5 + 0.5)
        _save_png(os.path.join(dirs["empty_opacity"], f"{f:05d}.png"),
                  np.abs(np.asarray(cond["alpha_full"])
                         - np.asarray(cond["alpha_without"])))
        valid.append(f)
    np.save(os.path.join(workspace, "valid_inpaint_frame.npy"),
            np.asarray(valid))
    return out_masks
