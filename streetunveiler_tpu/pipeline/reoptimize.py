"""Stage C — unveiling re-optimization (reference
``inpainting_pipeline/3_reoptimization/1_optimization.py:44-290``).

Walks the key frames back-to-front in (key, previously-processed-key) pairs
(:92). Each key frame is inpainted (the first via the primary inpainter,
later frames guided by the previous inpaint through the refill mask,
:144-171), propagated forward to the frames between it and the previous
key (:180-199), and then the masked delta model is optimized for
``opt.iterations`` steps sampling random frames **from the accumulated
candidate set** (:212-218) — not just the current key frame — with masked
L1 + distortion + normal losses (:229-277). The surfel state stays
fixed-capacity; only deltas train.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ReOptimizationParams
from ..models.deltas import apply_deltas, zero_deltas
from ..models.gaussians import SurfelState, prune_mask
from ..renderer import render
from ..train.losses import l1_loss
from ..train.optim import adam_init, adam_update
from ..train.step import make_lrs
from .masks import dilate

REFILL_DIFF = 2e-2     # reference :160


@partial(jax.jit, static_argnames=("opt", "duplicate_capacity"))
def reoptimize_step(base: SurfelState, deltas, opt_state, train_mask,
                    camera, target, bg, iteration,
                    opt: ReOptimizationParams, sky_image=None,
                    duplicate_capacity=None):
    """One delta-optimization step against an inpainted target.

    ``target`` [H,W,3] is the pre-composited supervision: the inpainted
    image inside the removal mask, the original ground truth outside —
    mathematically identical to the reference's masked+unmasked L1 split
    (:229-256) in one image.
    """
    def loss_fn(d):
        st = apply_deltas(base, d, train_mask)
        res = render(camera, st, bg,
                     duplicate_capacity=duplicate_capacity)
        image = res.render
        if sky_image is not None:
            image = image + sky_image * (1.0 - res.rend_alpha)[..., None]
        ll1 = l1_loss(image, target)
        loss = ll1
        loss = loss + opt.lambda_dist * jnp.mean(res.rend_dist)
        normal_err = 1.0 - jnp.sum(res.rend_normal * res.surf_normal, -1)
        loss = loss + opt.lambda_normal * jnp.mean(normal_err)
        return loss, image

    (loss, image), grads = jax.value_and_grad(loss_fn, has_aux=True)(deltas)
    lrs = make_lrs(opt, iteration, base.spatial_scale)
    deltas, opt_state = adam_update(grads, opt_state, deltas, lrs)
    return deltas, opt_state, loss


def refill_mask(last_inframe_render, current_render, inpaint_mask):
    """Pixels not yet constrained by earlier key frames (reference :160):
    channel-summed |last − current| > 2e-2 within the removal mask."""
    diff = jnp.sum(jnp.abs(last_inframe_render - current_render), axis=-1)
    return (diff > REFILL_DIFF) & inpaint_mask


def unveil(scene, state: SurfelState, masks, key_frames: Sequence[int],
           inpainter, opt: ReOptimizationParams = ReOptimizationParams(),
           bg=None, sky_images=None, propagate: bool = True,
           duplicate_capacity=None, callback=None, frame_masks=None,
           seed: int = 0):
    """Full stage-C loop. ``masks``: RemovalMasks from stage B;
    ``frame_masks`` optionally maps frame→[H,W] bool removal masks from the
    persisted stage-B artifacts (recomputed from the alpha difference when
    absent). Returns (unveiled_state, deltas, inpainted_targets)."""
    bg = jnp.zeros(3) if bg is None else jnp.asarray(bg)
    removed = jnp.asarray(masks.removed)
    train_mask = jnp.asarray(masks.trainable) & ~removed

    # base: removed surfels pruned (reference prepare_mask_gaussians :466-479)
    base = prune_mask(state, removed)
    deltas = zero_deltas(base.params)
    opt_state = adam_init(deltas)

    images = scene.train_images
    n_cams = len(scene.train_cameras)
    inpainted_targets: dict[int, np.ndarray] = {}
    masks_by_frame: dict[int, np.ndarray] = {}
    last_inpaint = None
    rng = np.random.default_rng(seed)

    # key list: sorted, with the final frame appended as a pure propagation
    # boundary (reference :81-83 appends camera_frame_dict['front_end'];
    # the last key itself is never inpainted — :92 iterates pairs)
    keys = sorted(set(key_frames))
    if not keys:
        return apply_deltas(base, deltas, train_mask), deltas, {}
    if keys[-1] != n_cams - 1:
        keys.append(n_cams - 1)

    # editable narrowing (:96-98): each surfel's neighborhood is hidden from
    # the inpaint-input render only in the FIRST (latest) key frame that
    # sees it, so later conditions keep the now-constrained geometry.
    editable_remaining = np.asarray(masks.editable) & ~np.asarray(
        masks.removed) & np.asarray(base.alive)
    candidates: list[int] = []
    loss = jnp.float32(0.0)

    pairs = list(zip(reversed(keys[:-1]), reversed(keys[1:])))
    for frame, last_frame in pairs:
        cam = scene.train_cameras[frame]
        gt = np.asarray(images[frame])

        in_frame = np.asarray(scene.pcd_in_frame_mask(
            jnp.asarray(base.params.xyz), frame)) & np.asarray(base.alive)
        hide = jnp.asarray(in_frame & editable_remaining)
        editable_remaining = editable_remaining & ~in_frame

        cond = _frame_condition(cam, state, base, bg, duplicate_capacity,
                                hide_mask=hide)
        if frame_masks is not None and frame in frame_masks:
            mask = np.asarray(frame_masks[frame], bool)
        else:
            mask = np.asarray(cond["mask"])
        masks_by_frame[frame] = mask

        if last_inpaint is None:
            inp = inpainter.inpaint(np.asarray(cond["rgb_without"]), mask)
        else:
            rm = np.asarray(refill_mask(
                jnp.asarray(last_inpaint), cond["rgb_without"],
                jnp.asarray(mask)))
            inp = inpainter.inpaint(np.asarray(cond["rgb_without"]), rm,
                                    reference=last_inpaint)
        last_inpaint = inp

        # supervision: inpainted inside the mask, original gt outside (:229)
        target = np.where(mask[..., None], inp, gt).astype(np.float32)
        inpainted_targets[frame] = target

        # propagate forward to the frames between this key and the
        # previously-processed one (:180-199)
        new_frames = [frame]
        if propagate:
            for mid in range(frame + 1, last_frame):
                mcam = scene.train_cameras[mid]
                mcond = _frame_condition(mcam, state, base, bg,
                                         duplicate_capacity)
                if frame_masks is not None and mid in frame_masks:
                    mmask = np.asarray(frame_masks[mid], bool)
                else:
                    mmask = np.asarray(mcond["mask"])
                masks_by_frame[mid] = mmask
                minp = inpainter.inpaint(np.asarray(images[mid]), mmask,
                                         reference=last_inpaint)
                inpainted_targets[mid] = np.where(
                    mmask[..., None], minp,
                    np.asarray(images[mid])).astype(np.float32)
                new_frames.append(mid)

        # re-optimization over the ACCUMULATED candidate set with random
        # frame order without replacement (:212-218)
        candidates += new_frames
        stack: list[int] = []
        for it in range(1, opt.iterations + 1):
            if not stack:
                stack = list(rng.permutation(candidates))
            fid = int(stack.pop())
            fcam = scene.train_cameras[fid]
            sky_img = None if sky_images is None else sky_images[fid]
            deltas, opt_state, loss = reoptimize_step(
                base, deltas, opt_state, train_mask, fcam,
                jnp.asarray(inpainted_targets[fid]), bg,
                jnp.asarray(it), opt, sky_image=sky_img,
                duplicate_capacity=duplicate_capacity)
        if callback:
            callback(frame, float(loss), target)

    final = apply_deltas(base, deltas, train_mask)
    return final, deltas, inpainted_targets


def _frame_condition(camera, full_state, base, bg, duplicate_capacity,
                     hide_mask=None):
    """Removal mask + inpaint-input render for one frame.

    ``hide_mask`` [C] bool additionally hides the frame's editable
    neighborhood from the input render (reference :102-113 renders with
    ``~trainable_mask`` so leftover floaters near the hole don't condition
    the inpainter)."""
    full = render(camera, full_state, bg,
                  duplicate_capacity=duplicate_capacity)
    wo = render(camera, base, bg, duplicate_capacity=duplicate_capacity)
    diff = jnp.abs(full.rend_alpha - wo.rend_alpha) > 0.01
    rgb_without = wo.render
    if hide_mask is not None:
        hidden = render(camera, base, bg, opacity_mask=~jnp.asarray(hide_mask),
                        duplicate_capacity=duplicate_capacity)
        rgb_without = hidden.render
    return dict(mask=dilate(diff), rgb_without=rgb_without)
