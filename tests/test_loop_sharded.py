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


def test_sharded_metrics_match_single_chip():
    """VERDICT r2 #4: the sharded loop reports the same metric set as the
    single-chip step, with matching values on a 1-tile mesh (ssim/psnr
    are exact when no slab split is involved)."""
    import dataclasses
    from streetunveiler_tpu.config import OptimizationParams
    from streetunveiler_tpu.parallel.shard import (make_mesh,
                                                   make_sharded_train_step)
    from streetunveiler_tpu.scene.readers import make_synthetic_street
    from streetunveiler_tpu.scene.scene import Scene
    from streetunveiler_tpu.train.step import init_optimizer, train_step

    info = make_synthetic_street(n_points=300, n_cameras=2, width=64,
                                 height=64, focal=40.0, seed=3)
    scene = Scene(info)
    state = scene.create_state(capacity=512)
    opt = OptimizationParams()
    opt_state = init_optimizer(state)
    cam = scene.train_cameras[0]
    gt = jnp.asarray(scene.train_images[0])
    bg = jnp.zeros(3)

    _, _, _, _, m1 = train_step(state, opt_state, cam, gt, bg,
                                jnp.asarray(1), opt)

    mesh = make_mesh(1, 1)
    step = make_sharded_train_step(mesh, opt, 64, 64)
    _, _, m2 = step(state, opt_state, cam.w2c[None], cam.K[None],
                    gt[None], bg, jnp.asarray(1))

    for k in ("loss", "l1", "ssim", "psnr", "semantic"):
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=1e-5,
                                   err_msg=f"metric {k}")
    assert bool(m1["overflow"]) == bool(m2["overflow"]) is False
    assert int(m1["n_alive"]) == int(m2["n_alive"])

    # VERDICT r3 #5: the same parity on a REAL multi-slab mesh — l1/psnr/
    # semantic are slab means that reduce exactly over equal slabs; ssim
    # (and the loss through it) differs only by the per-slab windowing,
    # O(window/slab_h) (test_slab_ssim_approximation_bound). Here the
    # slabs are a mere 16 rows against the 11-px window — window/slab
    # ≈ 0.7, so allow 5%; production slabs are ≥160 rows (<1%).
    if len(jax.devices()) >= 4:
        mesh4 = make_mesh(1, 4)
        step4 = make_sharded_train_step(mesh4, opt, 64, 64)
        _, _, m4 = step4(state, opt_state, cam.w2c[None], cam.K[None],
                         gt[None], bg, jnp.asarray(1))
        for k in ("l1", "psnr", "semantic"):
            np.testing.assert_allclose(float(m1[k]), float(m4[k]),
                                       rtol=1e-4, err_msg=f"metric {k}")
        assert abs(float(m1["ssim"]) - float(m4["ssim"])) < 0.05
        assert abs(float(m1["loss"]) - float(m4["loss"])) < 0.05
        assert bool(m4["overflow"]) is False
        assert int(m1["n_alive"]) == int(m4["n_alive"])


def test_zero_sharded_with_sky():
    """Sky x shard_surfels (VERDICT r2 missing #5): the ZeRO step trains
    the replicated sky jointly with surfel-sharded parameters."""
    from streetunveiler_tpu.config import OptimizationParams
    from streetunveiler_tpu.models.gaussians import create_from_pcd
    from streetunveiler_tpu.models.sky import init_sky
    from streetunveiler_tpu.parallel.shard import (make_mesh,
                                                   make_sharded_train_step)
    from streetunveiler_tpu.train.optim import adam_init
    from streetunveiler_tpu.train.step import init_optimizer

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(0)
    n = 48
    pts = np.stack([rng.uniform(-2, 2, n), rng.uniform(-2, 2, n),
                    rng.uniform(3, 8, n)], 1).astype(np.float32)
    cols = rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)
    state = create_from_pcd(pts, cols, rng.integers(0, 6, n),
                            spatial_scale=4.0, capacity=64)
    opt_state = init_optimizer(state)
    opt = OptimizationParams()
    W, H, f = 32, 64, 30.0
    K = jnp.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], jnp.float32)
    mesh = make_mesh(2, 4)
    sky = init_sky(jax.random.PRNGKey(1))
    sky_opt = adam_init(sky)

    B = 2
    w2c = jnp.broadcast_to(jnp.eye(4), (B, 4, 4))
    Kb = jnp.broadcast_to(K, (B, 3, 3))
    gt = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)), jnp.float32)

    step_z = make_sharded_train_step(mesh, opt, W, H, shard_surfels=True,
                                     sky=True)
    s2, o2, sky2, sky_opt2, m2 = step_z(
        state, opt_state, w2c, Kb, gt, jnp.zeros(3), jnp.asarray(1),
        None, sky, sky_opt)
    assert np.isfinite(float(m2["loss"]))
    assert np.isfinite(float(m2["psnr"]))
    moved = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()) > 0, sky, sky2)
    assert any(jax.tree.leaves(moved))


def test_sharded_loop_buckets_mixed_camera_sizes():
    """Mixed (width, height) cameras train via per-bucket sharded steps
    instead of the former equal-size assert."""
    from types import SimpleNamespace
    from streetunveiler_tpu.config import OptimizationParams
    from streetunveiler_tpu.scene.readers import make_synthetic_street
    from streetunveiler_tpu.scene.scene import Scene
    from streetunveiler_tpu.train.loop import train_scene_sharded

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    s1 = Scene(make_synthetic_street(n_points=300, n_cameras=2, width=64,
                                     height=32, focal=40.0, seed=4))
    s2 = Scene(make_synthetic_street(n_points=300, n_cameras=2, width=48,
                                     height=64, focal=40.0, seed=5))
    mixed = SimpleNamespace(
        train_cameras=s1.train_cameras + s2.train_cameras,
        train_images=s1.train_images + s2.train_images,
        train_semantics=s1.train_semantics + s2.train_semantics,
        test_cameras=[], test_images=[], model_path=None)
    state = s1.create_state(capacity=512)
    opt = OptimizationParams(densify_from_iter=10_000)

    state2, _, reps = train_scene_sharded(
        mixed, state, opt, n_tile=2, n_data=2, iterations=8, log_every=4)
    assert len(reps) == 2
    assert np.isfinite([r.loss for r in reps]).all()
    assert np.isfinite([r.psnr for r in reps]).all()


def test_shard_preprocess_matches_replicated():
    """VERDICT r3 #3: the tile-sharded-preprocess path (per-surfel
    preprocess/pack sharded over 'tile', all-gathered, slab-shifted)
    must reproduce the replicated-preprocess step — same forward
    metrics AND same updated parameters (gradients flow through the
    all_gather's psum-scatter VJP)."""
    from streetunveiler_tpu.config import OptimizationParams
    from streetunveiler_tpu.parallel.shard import (make_mesh,
                                                   make_sharded_train_step)
    from streetunveiler_tpu.scene.readers import make_synthetic_street
    from streetunveiler_tpu.scene.scene import Scene
    from streetunveiler_tpu.train.step import init_optimizer

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    info = make_synthetic_street(n_points=300, n_cameras=2, width=64,
                                 height=64, focal=40.0, seed=6)
    scene = Scene(info)
    state = scene.create_state(capacity=512)   # 512 % 4 == 0
    opt = OptimizationParams(semantic_dist_from_iter=2)  # late phase on
    opt_state = init_optimizer(state)
    cam = scene.train_cameras[0]
    gt = jnp.asarray(scene.train_images[0])
    gt_sem = jnp.asarray(scene.train_semantics[0])[None]
    bg = jnp.zeros(3)
    mesh = make_mesh(1, 4)

    outs = {}
    for flag in (False, True):
        step = make_sharded_train_step(mesh, opt, 64, 64, semantics=True,
                                       class_dist=True,
                                       shard_preprocess=flag)
        s2, _, m = step(state, opt_state, cam.w2c[None], cam.K[None],
                        gt[None], bg, jnp.asarray(3), gt_sem)
        outs[flag] = (s2, m)

    (s_rep, m_rep), (s_shd, m_shd) = outs[False], outs[True]
    for k in ("loss", "l1", "ssim", "psnr", "semantic"):
        np.testing.assert_allclose(float(m_rep[k]), float(m_shd[k]),
                                   rtol=2e-4, atol=1e-6,
                                   err_msg=f"metric {k}")
    # parameters after one update must agree (grad path parity)
    for name in ("xyz", "scaling", "rotation", "opacity", "features_dc"):
        a = np.asarray(getattr(s_rep.params, name))
        b = np.asarray(getattr(s_shd.params, name))
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-6,
                                   err_msg=f"param {name}")
    # densification stats ride the same grads
    np.testing.assert_allclose(np.asarray(s_rep.grad_accum),
                               np.asarray(s_shd.grad_accum),
                               rtol=5e-3, atol=1e-7)


def test_sharded_capacity_auto_bump():
    """VERDICT r4 #5 for the sharded loop: an overflowing slab duplicate
    stream trips the in-loop demand-driven bump (the compiled steps are
    rebuilt at the new per-slab capacity) instead of silently truncating
    for the rest of the run."""
    from streetunveiler_tpu.config import OptimizationParams
    from streetunveiler_tpu.scene.readers import make_synthetic_street
    from streetunveiler_tpu.scene.scene import Scene
    from streetunveiler_tpu.train.loop import train_scene_sharded

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    info = make_synthetic_street(n_points=400, n_cameras=2, width=64,
                                 height=64, focal=45.0, seed=4)
    scene = Scene(info)
    state = scene.create_state(capacity=512)
    opt = OptimizationParams(densify_from_iter=10**9,
                             prune_from_iter=10**9)
    # absurd per-slab capacity: one 128-duplicate chunk for 400 surfels
    reps = train_scene_sharded(scene, state, opt, n_tile=2, n_data=1,
                               iterations=4, log_every=1,
                               duplicate_capacity=128)[2]
    assert reps[0].overflow_frac == 1.0, "the first window must overflow"
    assert reps[-1].dup_capacity > 128, "the loop must bump the capacity"
    assert reps[-1].overflow_frac == 0.0, (
        "post-bump steps must not run truncated")


def test_production_slab_metric_parity():
    """VERDICT r4 #6: sharded metric parity at PRODUCTION slab size.
    The 16-row-slab parity test allows 5% on ssim/loss (window/slab
    ~ 0.7); at >=160-row slabs the per-slab SSIM windowing error is
    O(window/slab_h) < 1% — assert that bound on a 320x320 frame over a
    1x2 mesh (160-row slabs, BASELINE configs 3/5 slab shape)."""
    from streetunveiler_tpu.config import OptimizationParams
    from streetunveiler_tpu.parallel.shard import (make_mesh,
                                                   make_sharded_train_step)
    from streetunveiler_tpu.scene.readers import make_synthetic_street
    from streetunveiler_tpu.scene.scene import Scene
    from streetunveiler_tpu.train.step import init_optimizer, train_step

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    # dense enough that splats stay well under the 64-tile cap (sparse
    # toy scenes make every splat huge, and the max_tiles_per_surfel
    # truncation then binds differently per slab — not what production
    # scenes or this parity bound are about); GT rendering skipped, the
    # parity target is any fixed image
    info = make_synthetic_street(n_points=6000, n_cameras=1, width=320,
                                 height=320, focal=260.0, seed=11,
                                 render_gt=False)
    scene = Scene(info)
    state = scene.create_state(capacity=6144)
    opt = OptimizationParams()
    opt_state = init_optimizer(state)
    cam = scene.train_cameras[0]
    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.uniform(0, 1, (320, 320, 3)).astype(np.float32))
    bg = jnp.zeros(3)

    # demand-sized capacity so both paths run overflow-free (else the
    # comparison measures truncation, not windowing)
    from streetunveiler_tpu.renderer import measure_duplicate_capacity
    cap = measure_duplicate_capacity([cam], state, headroom=1.3)

    _, _, _, _, m1 = train_step(state, opt_state, cam, gt, bg,
                                jnp.asarray(1), opt,
                                duplicate_capacity=cap)
    assert bool(m1["overflow"]) is False

    mesh = make_mesh(1, 2)
    step = make_sharded_train_step(mesh, opt, 320, 320,
                                   duplicate_capacity=cap)
    _, _, m2 = step(state, opt_state, cam.w2c[None], cam.K[None],
                    gt[None], bg, jnp.asarray(1))

    # exact-reduction metrics tight; ssim/loss within the <1%-of-range
    # windowing bound the slab analysis promises at 160-row slabs (SSIM
    # range is [−1, 1], so <1% means absolute error < 0.01; the loss
    # inherits it scaled by λ_dssim)
    for k in ("l1", "psnr", "semantic"):
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=1e-4,
                                   err_msg=f"metric {k}")
    assert abs(float(m1["ssim"]) - float(m2["ssim"])) < 0.01
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 0.01
    assert bool(m2["overflow"]) is False
