"""Semantic rendering + CE loss + semantic-aware training (stage-1 parity)."""

import jax.numpy as jnp
import numpy as np

from streetunveiler_tpu.config import OptimizationParams
from streetunveiler_tpu.renderer import render_semantic, semantic_class_mask
from streetunveiler_tpu.scene.readers import make_synthetic_street
from streetunveiler_tpu.scene.scene import Scene
from streetunveiler_tpu.train.loop import train_scene
from streetunveiler_tpu.train.step import semantic_ce_loss
from streetunveiler_tpu.utils.semantics import CONCERNED_IND, VEHICLE_BIT


def test_render_semantic_probs():
    import dataclasses

    info = make_synthetic_street(n_points=400, n_cameras=2, width=64,
                                 height=48, focal=45.0, seed=4)
    scene = Scene(info)
    state = scene.create_state(capacity=512)
    # at init opacity (0.1) the sky prior dominates; evaluate agreement at
    # solid opacity like a converged model
    state = dataclasses.replace(
        state, params=dataclasses.replace(
            state.params,
            opacity=jnp.where(state.alive[:, None], 3.0,
                              state.params.opacity)))
    probs = render_semantic(scene.train_cameras[0], state)
    assert probs.shape == (48, 64, 6)
    p = np.array(probs)
    assert p.min() >= -1e-5 and p.max() <= 1.0 + 1e-5
    # compositing against the sky prior keeps probabilities normalized
    total = p.sum(-1)
    assert np.all(total > 0.5)
    gt = np.array(scene.train_semantics[0])
    pred = p.argmax(-1)
    splat = p[..., 4] < 0.5          # pixels actually covered by surfels
    agree = (pred == gt)[splat].mean()
    # the model's init state (round surfels, default scales) against GT
    # maps rendered from surface-ALIGNED GT surfels: grazing-angle ground
    # splats flip class at boundaries, so agreement at 400-point density
    # sits ~0.57 — well above chance (6 classes) and the argmax machinery
    # is what's under test
    assert agree > 0.5, agree


def test_semantic_ce_loss_decreases_with_correct_probs():
    gt = jnp.zeros((8, 8), jnp.int32).at[:, 4:].set(3)
    good = jnp.stack([(gt == c).astype(jnp.float32) * 5 for c in range(6)],
                     axis=-1)
    bad = jnp.roll(good, 1, axis=-1)
    assert float(semantic_ce_loss(good, gt)) < float(semantic_ce_loss(bad, gt))


def test_class_mask_filtering():
    info = make_synthetic_street(n_points=300, n_cameras=2, width=48,
                                 height=32, focal=35.0, seed=5,
                                 render_gt=False)
    scene = Scene(info)
    state = scene.create_state(capacity=512)
    keep = semantic_class_mask(state, VEHICLE_BIT, reverse=True)
    inv = semantic_class_mask(state, VEHICLE_BIT, reverse=False)
    assert not np.any(np.array(keep) & np.array(inv))


def test_semantic_training_step_runs():
    info = make_synthetic_street(n_points=300, n_cameras=2, width=48,
                                 height=32, focal=35.0, seed=6)
    scene = Scene(info)
    state = scene.create_state(capacity=512)
    opt = OptimizationParams(densify_from_iter=10**9, prune_from_iter=10**9,
                             opacity_reset_interval=10**9,
                             semantic_dist_from_iter=3)
    state, _, reports = train_scene(scene, state, opt, iterations=6,
                                    log_every=3, use_semantics=True)
    assert np.isfinite(reports[-1].loss)