"""The jitted training step — the reference's hot loop folded into one XLA
program (SURVEY.md §7.1.2, reference ``train.py:62-200``).

One ``train_step`` call = render + all losses + backward + Adam update +
densification-stat accumulation. Iteration-dependent schedule gates (λ_dist
after 27.5k, λ_normal after 30k, shrink after 31k, SH warmup, xyz LR decay)
are traced ``jnp.where`` gates so the step compiles exactly once.
Densify/prune/opacity-reset run between steps at the reference intervals
(also jitted, fixed shapes).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from ..config import OptimizationParams
from ..models.gaussians import (SurfelParams, SurfelState,
                                add_densification_stats)
from ..renderer import render
from ..scene.cameras import Camera
from .losses import l1_loss, psnr, ssim
from .optim import AdamState, adam_init, adam_update
from .schedule import expon_lr


def make_lrs(opt: OptimizationParams, iteration, spatial_scale):
    """Per-parameter LR pytree (reference ``training_setup`` :171-186 and
    ``update_learning_rate``)."""
    xyz_lr = expon_lr(iteration,
                      opt.position_lr_init * spatial_scale,
                      opt.position_lr_final * spatial_scale,
                      lr_delay_mult=opt.position_lr_delay_mult,
                      max_steps=opt.position_lr_max_steps)
    return SurfelParams(
        xyz=xyz_lr,
        features_dc=jnp.float32(opt.feature_lr),
        features_rest=jnp.float32(opt.feature_lr / 20.0),
        scaling=jnp.float32(opt.scaling_lr),
        rotation=jnp.float32(opt.rotation_lr),
        opacity=jnp.float32(opt.opacity_lr),
    )


SEMANTIC_CLASS_WEIGHTS = (1.0, 1.0, 1.0, 1.0, 0.2, 1.0)  # sky down-weighted


def semantic_ce_loss(probs, gt_labels, weights=SEMANTIC_CLASS_WEIGHTS):
    """Cross entropy treating composited class probabilities as logits —
    the reference feeds ``render_semantics`` straight into
    ``F.cross_entropy`` (train.py:88-91), log-softmax included."""
    logp = jax.nn.log_softmax(probs, axis=-1)
    onehot = jax.nn.one_hot(gt_labels, probs.shape[-1], dtype=jnp.float32)
    w = jnp.asarray(weights)
    return -jnp.mean(jnp.sum(w * onehot * logp, axis=-1))


def stage1_loss(state: SurfelState, camera: Camera, gt_image, bg,
                iteration, opt: OptimizationParams, sky_params=None,
                sky_image=None, gt_semantic=None, class_dist: bool = False,
                center2d_offset=None, interpret=None,
                duplicate_capacity=None, binning=None):
    """Full stage-1 loss (train.py:84-148). Returns (loss, aux).

    ``sky_params``: SkyParams trained jointly — the sky composites behind
    the splats, ``image = render + sky·(1−α)`` (train.py:114-115).
    ``gt_semantic``: [H,W] int class labels enables the semantic CE loss
    and (after ``semantic_dist_from_iter``) the per-class distortion
    renders. The reference backwards the semantic loss separately before
    the photometric one (train.py:107) purely as a memory optimization —
    a single summed backward produces the identical gradients.
    """
    active_sh = jnp.minimum(iteration // 1000, state.sh_degree)
    # semantic probabilities ride the SAME rasterization as extra payload
    # channels (the reference spends 2 whole extra passes on them,
    # gaussian_renderer/__init__.py:347-369; here they cost 6 extra
    # payload sums in the one blend kernel)
    want_sem = gt_semantic is not None and opt.enable_semantic_loss
    extra = (jax.nn.one_hot(state.semantics, 6, dtype=jnp.float32)
             if want_sem else None)
    # per-class distortion chains are fused INTO the main blend kernel
    # (zero extra passes vs the reference's 5 whole rasterizations,
    # train.py:94-105)
    gates = None
    if want_sem and class_dist:
        from ..renderer import semantic_class_mask
        from ..utils.semantics import CONCERNED_IND as _CI0
        gates = jnp.stack(
            [semantic_class_mask(state, 1 << ci, reverse=True)
             for ci in range(len(SEMANTIC_CLASS_WEIGHTS))
             if ci != _CI0["sky"]], axis=1)
    res = render(camera, state, bg, active_sh_degree=active_sh,
                 center2d_offset=center2d_offset, interpret=interpret,
                 duplicate_capacity=duplicate_capacity,
                 extra_payload=extra, class_gates=gates, binning=binning)

    image = res.render
    if sky_params is not None:
        from ..models.sky import render_sky
        c2w = jnp.linalg.inv(camera.w2c)
        sky_image = render_sky(sky_params, camera.height, camera.width,
                               camera.K, c2w)
    if sky_image is not None:
        image = res.render + sky_image * (1.0 - res.rend_alpha)[..., None]

    ll1 = l1_loss(image, gt_image)
    lssim = ssim(image, gt_image)
    loss = (1.0 - opt.lambda_dssim) * ll1 + opt.lambda_dssim * (1.0 - lssim)

    lambda_normal = jnp.where(iteration > opt.normal_consist_from_iter,
                              opt.lambda_normal, 0.0)
    normal_error = 1.0 - jnp.sum(res.rend_normal * res.surf_normal, axis=-1)
    loss = loss + lambda_normal * jnp.mean(normal_error)

    lambda_dist = jnp.where(iteration > opt.semantic_dist_from_iter,
                            opt.lambda_dist, 0.0)
    loss = loss + lambda_dist * jnp.mean(res.rend_dist)

    lambda_shrink = jnp.where(iteration > opt.shrinking_from_iter,
                              opt.lambda_shrink, 0.0)
    mean_op = jnp.sum(state.get_opacity()) / jnp.maximum(state.num_alive, 1)
    loss = loss + lambda_shrink * mean_op

    sem_loss = jnp.float32(0.0)
    if want_sem:
        from ..renderer import semantic_class_mask
        from ..utils.semantics import CONCERNED_IND as _CI
        sky_prior = jax.nn.one_hot(_CI["sky"], 6, dtype=jnp.float32)
        probs = res.extra + sky_prior * (1.0 - res.rend_alpha)[..., None]
        sem_loss = semantic_ce_loss(probs, gt_semantic)
        loss = loss + opt.semantic_loss_ratio * sem_loss

        # per-class distortion, sky excluded (train.py:94-105).
        # ``class_dist`` is a *static* gate the training loop flips at
        # semantic_dist_from_iter so the extra blend only exists in the
        # late-phase executable.
        if class_dist:
            loss = loss + opt.lambda_dist * jnp.sum(
                jnp.mean(res.class_dist, axis=(0, 1)))

    aux = dict(image=image, l1=ll1, ssim=lssim, radii=res.radii,
               psnr=psnr(jnp.clip(image, 0, 1), gt_image),
               semantic=sem_loss, overflow=res.overflow,
               demand=(res.demand if res.demand is not None
                       else jnp.int32(0)))
    return loss, aux


@partial(jax.jit, static_argnames=("interpret", "duplicate_capacity"))
def bin_step(state: SurfelState, camera: Camera,
             interpret: bool | None = None,
             duplicate_capacity: int | None = None):
    """Phase 1 of the two-phase training step: tile binning alone.

    Call before ``train_step(..., binning=...)``. A separate executable
    so the blend kernels' scalar-prefetch visit arrays cross a jit
    boundary as top-level arguments — the single-jit step pays a ~13
    ms/direction Mosaic dynamic-scalar-prefetch tax at 1920×1280
    (docs/profile.md, tools/probe_split.py)."""
    from ..renderer import bin_camera
    return bin_camera(camera, state, interpret=interpret,
                      duplicate_capacity=duplicate_capacity)


@partial(jax.jit, static_argnames=("opt", "class_dist", "interpret",
                                   "duplicate_capacity"))
def train_step(state: SurfelState, opt_state: AdamState, camera: Camera,
               gt_image, bg, iteration, opt: OptimizationParams,
               sky_params=None, sky_opt_state=None, sky_image=None,
               gt_semantic=None, class_dist: bool = False,
               interpret: bool | None = None,
               duplicate_capacity: int | None = None,
               sky_lr: float = 1e-4, binning=None):
    """One optimization step (surfels + optional joint sky model).

    Returns (state, opt_state, sky_params, sky_opt_state, metrics); the sky
    pair passes through as None when no sky model is trained.

    ``binning``: precomputed ``bin_step`` result for this (state, camera)
    — the two-phase step (the training loop's default on TPU).
    """
    zeros2d = jnp.zeros((state.capacity, 2))

    def loss_fn(params, c2d_off, sky_p):
        st = dataclasses.replace(state, params=params)
        return stage1_loss(st, camera, gt_image, bg, iteration, opt,
                           sky_params=sky_p, sky_image=sky_image,
                           gt_semantic=gt_semantic, class_dist=class_dist,
                           center2d_offset=c2d_off, interpret=interpret,
                           duplicate_capacity=duplicate_capacity,
                           binning=binning)

    argnums = (0, 1, 2) if sky_params is not None else (0, 1)
    out = jax.value_and_grad(loss_fn, argnums=argnums, has_aux=True)(
        state.params, zeros2d, sky_params)
    (loss, aux) = out[0]
    grads, screen_grads = out[1][0], out[1][1]

    lrs = make_lrs(opt, iteration, state.spatial_scale)
    new_params, opt_state = adam_update(grads, opt_state, state.params, lrs)
    state = dataclasses.replace(state, params=new_params)

    if sky_params is not None:
        sky_grads = out[1][2]
        sky_lrs = jax.tree.map(lambda _: jnp.float32(sky_lr), sky_params)
        sky_params, sky_opt_state = adam_update(
            sky_grads, sky_opt_state, sky_params, sky_lrs,
            eps=1e-8)  # reference sky Adam uses default torch eps

    # densification statistics (train.py:166-169); gated off after
    # densify_until_iter to match the reference bookkeeping
    track = iteration < opt.densify_until_iter
    visible = (aux["radii"] > 0) & track
    state = add_densification_stats(state, screen_grads, aux["radii"], visible)

    metrics = dict(loss=loss, l1=aux["l1"], ssim=aux["ssim"],
                   psnr=aux["psnr"], n_alive=state.num_alive,
                   semantic=aux["semantic"], overflow=aux["overflow"],
                   demand=aux["demand"])
    return state, opt_state, sky_params, sky_opt_state, metrics


def init_optimizer(state: SurfelState) -> AdamState:
    return adam_init(state.params)
