"""Stage-1 reconstruction training loop — reference ``train.py:32-212``.

Host-side orchestration around the jitted ``train_step``: random camera
order without replacement, the densify/prune/opacity-reset schedule, the
late semantic-aware prune phase, checkpointing, and throughput metering.
All array work stays on device; the loop only shuffles indices and fires
jitted functions.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import OptimizationParams
from ..models.gaussians import (SurfelState, densify_and_prune, prune_mask,
                                reset_opacity)
from ..utils.semantics import SKY_BIT, VEGETATION_BIT
from .optim import AdamState, adam_init
from .step import init_optimizer, train_step


@dataclasses.dataclass
class TrainReport:
    iteration: int
    loss: float
    psnr: float
    n_alive: int
    iters_per_s: float


def train_scene(scene, state: SurfelState, opt: OptimizationParams,
                sky_params=None, bg=None, start_iteration: int = 0,
                iterations: Optional[int] = None,
                save_iterations=(), log_every: int = 200,
                duplicate_capacity: Optional[int] = None,
                use_semantics: bool = False,
                seed: int = 0, callback=None, logger=None,
                panel_every: int = 0):
    """Run the stage-1 loop. Returns (state, sky_params, reports)."""
    iterations = iterations or opt.iterations
    cams = scene.train_cameras
    images = [jnp.asarray(img) for img in scene.train_images]
    semantics = None
    if use_semantics and opt.enable_semantic_loss:
        semantics = [None if s is None else jnp.asarray(s)
                     for s in scene.train_semantics]
    n_cams = len(cams)
    # reference sets the densify interval dynamically (train.py:56)
    densification_interval = max(1, int(1.15 * n_cams))

    bg = jnp.zeros(3) if bg is None else jnp.asarray(bg)
    opt_state = init_optimizer(state)
    sky_opt_state = adam_init(sky_params) if sky_params is not None else None

    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    order: list[int] = []
    reports: list[TrainReport] = []
    t_window = time.perf_counter()
    window_iters = 0

    for iteration in range(start_iteration + 1, iterations + 1):
        if not order:
            order = list(rng.permutation(n_cams))
        idx = int(order.pop())
        it = jnp.asarray(iteration)

        gt_sem = semantics[idx] if semantics is not None else None
        state, opt_state, sky_params, sky_opt_state, metrics = train_step(
            state, opt_state, cams[idx], images[idx], bg, it, opt,
            sky_params=sky_params, sky_opt_state=sky_opt_state,
            gt_semantic=gt_sem,
            class_dist=iteration > opt.semantic_dist_from_iter,
            duplicate_capacity=duplicate_capacity)
        window_iters += 1

        # densification (train.py:171-176)
        if iteration < opt.densify_until_iter:
            if (iteration > opt.densify_from_iter
                    and iteration % densification_interval == 0):
                size_threshold = (20.0 if iteration > opt.opacity_reset_interval
                                  else None)
                key, sub = jax.random.split(key)
                state, mu, nu = densify_and_prune(
                    state, opt_state.mu, opt_state.nu,
                    opt.densify_grad_threshold, opt.opacity_cull,
                    size_threshold, sub, percent_dense=opt.percent_dense)
                opt_state = opt_state._replace(mu=mu, nu=nu)
            if iteration % opt.opacity_reset_interval == 0:
                state, mu, nu = reset_opacity(state, opt_state.mu,
                                              opt_state.nu)
                opt_state = opt_state._replace(mu=mu, nu=nu)

        # late semantic-aware prune (train.py:178-193): drop low-opacity
        # surfels except sky|vegetation classes
        if (opt.prune_from_iter < iteration < opt.prune_until_iter
                and iteration % opt.prune_interval == 0):
            low = state.get_opacity()[:, 0] < 0.5
            protected = state.semantic_mask(SKY_BIT | VEGETATION_BIT)
            state = prune_mask(state, low & ~protected)

        if iteration in save_iterations and scene.model_path:
            scene.save(state, iteration)

        if iteration % log_every == 0 or iteration == iterations:
            dt = time.perf_counter() - t_window
            rep = TrainReport(iteration=iteration,
                              loss=float(metrics["loss"]),
                              psnr=float(metrics["psnr"]),
                              n_alive=int(metrics["n_alive"]),
                              iters_per_s=window_iters / max(dt, 1e-9))
            reports.append(rep)
            if callback:
                callback(rep)
            if logger is not None:
                cam = cams[idx]
                logger.scalars(iteration, {
                    "train/loss": rep.loss, "train/psnr": rep.psnr,
                    "train/l1": float(metrics["l1"]),
                    "train/ssim": float(metrics["ssim"]),
                    "train/semantic": float(metrics["semantic"]),
                    "model/n_alive": rep.n_alive,
                    "perf/iters_per_s": rep.iters_per_s,
                    "perf/rays_per_s": rep.iters_per_s * cam.width
                    * cam.height})
                if panel_every and iteration % panel_every == 0:
                    from ..renderer import render as _render
                    res = _render(cams[0], state, bg)
                    logger.image(iteration, "panels/render",
                                 np.clip(np.asarray(res.render), 0, 1))
            t_window = time.perf_counter()
            window_iters = 0

    return state, sky_params, reports
