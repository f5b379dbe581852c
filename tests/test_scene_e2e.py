"""Scene + synthetic reader + full training-loop slice (BASELINE config 2
in miniature, hermetic)."""

import jax.numpy as jnp
import numpy as np

from streetunveiler_tpu.config import OptimizationParams
from streetunveiler_tpu.renderer import render
from streetunveiler_tpu.scene.readers import make_synthetic_street
from streetunveiler_tpu.scene.scene import Scene
from streetunveiler_tpu.train.loop import train_scene
from streetunveiler_tpu.train.losses import psnr


def test_synthetic_scene_pipeline(tmp_path):
    info = make_synthetic_street(n_points=500, n_cameras=4, width=64,
                                 height=48, focal=45.0, seed=1)
    scene = Scene(info, model_path=str(tmp_path))
    assert len(scene.train_cameras) == 4
    assert scene.train_images[0].shape == (48, 64, 3)
    assert scene.train_semantics[0].shape == (48, 64)
    assert scene.cameras_extent > 0

    state = scene.create_state(capacity=1024)
    # sky points are pruned at init (train.py:61) — synthetic has none
    n0 = int(state.num_alive)
    assert n0 > 0

    opt = OptimizationParams(
        densify_from_iter=10, densify_until_iter=40,
        opacity_reset_interval=10**9, normal_consist_from_iter=10**9,
        semantic_dist_from_iter=10**9, shrinking_from_iter=10**9,
        prune_from_iter=10**9)
    bg = jnp.zeros(3)

    def eval_psnr(st):
        vals = []
        for cam, img in zip(scene.train_cameras, scene.train_images):
            r = render(cam, st, bg).render
            vals.append(float(psnr(jnp.clip(r, 0, 1), jnp.asarray(img))))
        return float(np.mean(vals))

    p0 = eval_psnr(state)
    state, _, reports = train_scene(scene, state, opt, iterations=50,
                                    log_every=25, save_iterations=(50,))
    p1 = eval_psnr(state)
    assert p1 > p0 + 0.5, (p0, p1)
    assert reports and np.isfinite(reports[-1].loss)

    # artifact layout + reload (reference point_cloud/iteration_N/…)
    reloaded = scene.load(50)
    assert int(reloaded.num_alive) > 0
    r1 = render(scene.train_cameras[0], reloaded, bg).render
    r2 = render(scene.train_cameras[0], state, bg).render
    np.testing.assert_allclose(np.array(r1), np.array(r2), atol=1e-4)


def test_projection_queries():
    info = make_synthetic_street(n_points=300, n_cameras=3, width=64,
                                 height=48, focal=45.0, seed=2,
                                 render_gt=False)
    scene = Scene(info)
    xyz = jnp.asarray(info.point_cloud.points)
    mask = scene.pcd_in_frame_mask(xyz, 0)
    assert 0 < int(mask.sum()) <= xyz.shape[0]
    coords, depth = scene.pcd_pixel_coords(xyz, 0)
    inm = np.array(mask)
    assert np.all(np.array(coords)[inm][:, 0] >= 0)
    assert np.all(np.array(coords)[inm][:, 0] < 64)
    assert np.all(np.array(depth)[inm] > 0)
