"""Stage C — unveiling re-optimization (reference
``inpainting_pipeline/3_reoptimization/1_optimization.py:44-290``).

Walks the key frames back-to-front; each key frame is inpainted (first via
the primary inpainter, later frames guided by the previous inpaint — the
refill mask keeps already-constrained pixels, :144-171), propagated to the
in-between frames (:180-199), then the masked delta model is optimized for
``opt.iterations`` steps of masked L1 + distortion + normal losses
(:212-277). The surfel state stays fixed-capacity; only deltas train.
"""

from __future__ import annotations

import dataclasses
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
                    camera, target, pixel_mask, bg, iteration,
                    opt: ReOptimizationParams, sky_image=None,
                    duplicate_capacity=None):
    """One delta-optimization step against an inpainted target.

    pixel_mask [H,W] bool: True = supervised by the inpainted image;
    False pixels keep the original ground truth (both live in ``target``,
    pre-composited by the caller like the reference's masked L1 :229-256).
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
    |last − current| > 2e-2 within the removal mask."""
    diff = jnp.max(jnp.abs(last_inframe_render - current_render), axis=-1)
    return (diff > REFILL_DIFF) & inpaint_mask


def unveil(scene, state: SurfelState, masks, key_frames: Sequence[int],
           inpainter, opt: ReOptimizationParams = ReOptimizationParams(),
           bg=None, sky_images=None, propagate: bool = True,
           duplicate_capacity=None, callback=None):
    """Full stage-C loop. ``masks``: RemovalMasks from stage B.

    Returns the unveiled state (base with removed surfels pruned +
    optimized deltas applied).
    """
    bg = jnp.zeros(3) if bg is None else jnp.asarray(bg)
    removed = jnp.asarray(masks.removed)
    train_mask = jnp.asarray(masks.trainable) & ~removed

    # base: removed surfels pruned (reference prepare_mask_gaussians :466-479)
    base = prune_mask(state, removed)
    deltas = zero_deltas(base.params)
    opt_state = adam_init(deltas)

    images = scene.train_images
    inpainted_targets: dict[int, np.ndarray] = {}
    last_inpaint = None

    keys = sorted(key_frames, reverse=True)   # back-to-front (:92)
    for ki, frame in enumerate(keys):
        cam = scene.train_cameras[frame]
        gt = np.asarray(images[frame])
        cond = _frame_condition(cam, state, base, removed, bg,
                                duplicate_capacity)
        mask = np.asarray(cond["mask"])

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

        sky_img = None if sky_images is None else sky_images[frame]
        for it in range(1, opt.iterations + 1):
            deltas, opt_state, loss = reoptimize_step(
                base, deltas, opt_state, train_mask, cam,
                jnp.asarray(target), jnp.asarray(mask), bg,
                jnp.asarray(it), opt, sky_image=sky_img,
                duplicate_capacity=duplicate_capacity)
        if callback:
            callback(frame, float(loss), target)

        if propagate and ki + 1 < len(keys):
            # propagate to frames between this and the next key (:180-199)
            nxt = keys[ki + 1]
            for mid in range(nxt + 1, frame):
                mcam = scene.train_cameras[mid]
                mcond = _frame_condition(mcam, state, base, removed, bg,
                                         duplicate_capacity)
                mmask = np.asarray(mcond["mask"])
                minp = inpainter.inpaint(np.asarray(images[mid]), mmask,
                                         reference=last_inpaint)
                inpainted_targets[mid] = np.where(
                    mmask[..., None], minp,
                    np.asarray(images[mid])).astype(np.float32)

    final = apply_deltas(base, deltas, train_mask)
    return final, deltas, inpainted_targets


def _frame_condition(camera, full_state, base, removed, bg,
                     duplicate_capacity):
    full = render(camera, full_state, bg,
                  duplicate_capacity=duplicate_capacity)
    wo = render(camera, base, bg, duplicate_capacity=duplicate_capacity)
    diff = jnp.abs(full.rend_alpha - wo.rend_alpha) > 0.01
    return dict(mask=dilate(diff), rgb_without=wo.render)
