"""Sharded training loop over the virtual 8-device mesh (BASELINE
configs 3/5 in miniature): the product path the CLI drives with
--tile_devices/--data_devices."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_train_scene_sharded_runs_and_improves():
    from streetunveiler_tpu.config import OptimizationParams
    from streetunveiler_tpu.scene.readers import make_synthetic_street
    from streetunveiler_tpu.scene.scene import Scene
    from streetunveiler_tpu.train.loop import train_scene_sharded

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    info = make_synthetic_street(n_points=500, n_cameras=4, width=64,
                                 height=64, focal=50.0, seed=1)
    scene = Scene(info)
    state = scene.create_state(capacity=1024)
    opt = OptimizationParams(densify_from_iter=10_000)  # no densify here

    reports = []
    state2, _, reps = train_scene_sharded(
        scene, state, opt, n_tile=4, n_data=2, iterations=12,
        log_every=4, callback=reports.append)
    assert len(reps) == 3
    losses = [r.loss for r in reps]
    assert np.isfinite(losses).all()
    # optimization must reduce the loss on this tiny scene
    assert losses[-1] < losses[0]
    # surfels moved
    assert not np.allclose(np.asarray(state2.params.xyz),
                           np.asarray(state.params.xyz))


def test_make_global_batch_single_process():
    from streetunveiler_tpu.parallel.multihost import (local_camera_indices,
                                                       make_global_batch)
    from streetunveiler_tpu.parallel.shard import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(2, 4)
    w2c = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    K = np.tile(np.eye(3, dtype=np.float32), (2, 1, 1))
    gt = np.zeros((2, 64, 64, 3), np.float32)
    wb, kb, gb = make_global_batch(mesh, w2c, K, gt)
    assert wb.shape == (2, 4, 4) and gb.shape == (2, 64, 64, 3)
    # data axis sharded over 'data', image rows over 'tile'
    assert len(local_camera_indices(10, mesh)) == 10  # single process


def test_train_scene_sharded_full_executable():
    """Sharded loop with the complete stage-1 loss set: semantic CE +
    fused per-class distortion (late phase) + joint sky training."""
    from streetunveiler_tpu.config import OptimizationParams
    from streetunveiler_tpu.models.sky import init_sky
    from streetunveiler_tpu.scene.readers import make_synthetic_street
    from streetunveiler_tpu.scene.scene import Scene
    from streetunveiler_tpu.train.loop import train_scene_sharded

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")

    info = make_synthetic_street(n_points=400, n_cameras=4, width=64,
                                 height=32, focal=40.0, seed=2)
    scene = Scene(info)
    state = scene.create_state(capacity=512)
    # flip to the late phase immediately so class_dist compiles + runs
    opt = OptimizationParams(densify_from_iter=10_000,
                             semantic_dist_from_iter=2)
    sky = init_sky(jax.random.PRNGKey(0))

    reports = []
    state2, sky2, reps = train_scene_sharded(
        scene, state, opt, n_tile=2, n_data=2, iterations=6, log_every=3,
        sky_params=sky, use_semantics=True, callback=reports.append)
    losses = [r.loss for r in reps]
    assert np.isfinite(losses).all()
    # sky params trained jointly
    moved = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()) > 0, sky, sky2)
    assert any(jax.tree.leaves(moved))
