"""Procedural synthetic street scene — hermetic stand-in for driving logs.

Generates a street-like ground-truth surfel soup (ground, facades, boxes
as "vehicles", semantic labels) plus a camera path, and renders ground
truth images with the oracle renderer. Serves the roles the reference
fills with Waymo/Pandaset clips in tests and benches (BASELINE configs
1-2) without any dataset download.
"""

from __future__ import annotations

import numpy as np

from ...utils.semantics import CONCERNED_IND
from .basic import CameraInfo, PointCloud, SceneInfo, nerf_normalization


def _street_points(n, rng):
    """Returns (points, colors, semantics) with street-scene structure."""
    n_g = n // 3
    n_w = n // 3
    n_v = n // 6
    n_veg = n - n_g - n_w - n_v

    ground = np.stack([rng.uniform(-8, 8, n_g), np.full(n_g, 1.6),
                       rng.uniform(2, 40, n_g)], 1)
    g_col = np.tile([[0.42, 0.42, 0.45]], (n_g, 1)) + rng.normal(0, 0.03, (n_g, 3))
    g_sem = np.full(n_g, CONCERNED_IND["road"])

    side = np.where(rng.random(n_w) < 0.5, -6.0, 6.0)
    walls = np.stack([side + rng.normal(0, 0.1, n_w),
                      rng.uniform(-4, 1.6, n_w), rng.uniform(2, 40, n_w)], 1)
    w_col = np.tile([[0.6, 0.55, 0.5]], (n_w, 1)) + rng.normal(0, 0.08, (n_w, 3))
    w_sem = np.full(n_w, CONCERNED_IND["building"])

    # box "vehicles" parked on the right
    centers = np.stack([np.full(n_v, 3.5), np.full(n_v, 1.1),
                        rng.uniform(6, 30, n_v)], 1)
    veh = centers + rng.normal(0, 0.6, (n_v, 3)) * [0.8, 0.35, 1.5]
    v_col = np.tile([[0.7, 0.15, 0.12]], (n_v, 1)) + rng.normal(0, 0.05, (n_v, 3))
    v_sem = np.full(n_v, CONCERNED_IND["vehicle"])

    veg = np.stack([np.where(rng.random(n_veg) < 0.5, -5.0, 5.0)
                    + rng.normal(0, 0.4, n_veg),
                    rng.uniform(-2.5, 0.0, n_veg),
                    rng.uniform(4, 38, n_veg)], 1)
    veg_col = np.tile([[0.2, 0.45, 0.15]], (n_veg, 1)) + rng.normal(0, 0.05, (n_veg, 3))
    veg_sem = np.full(n_veg, CONCERNED_IND["vegetation"])

    pts = np.concatenate([ground, walls, veh, veg]).astype(np.float32)
    cols = np.clip(np.concatenate([g_col, w_col, v_col, veg_col]), 0, 1)
    sems = np.concatenate([g_sem, w_sem, v_sem, veg_sem]).astype(np.int32)
    return pts, cols.astype(np.float32), sems


def make_synthetic_street(n_points: int = 4000, n_cameras: int = 12,
                          width: int = 160, height: int = 112,
                          focal: float = 110.0, seed: int = 0,
                          render_gt: bool = True,
                          gt_opacity: float = 0.85,
                          eval_split: bool = False, llffhold: int = 8):
    """Build SceneInfo; GT images come from an oracle render of a hidden
    GT surfel set (consistent multi-view supervision).

    ``eval_split`` holds out every ``llffhold``-th camera as a test view
    (the reference's COLMAP-reader convention,
    scene/dataset_readers/colmap.py ``eval``/``llffhold``)."""
    rng = np.random.default_rng(seed)
    pts, cols, sems = _street_points(n_points, rng)
    K = np.array([[focal, 0, width / 2], [0, focal, height / 2], [0, 0, 1]],
                 np.float32)

    cam_infos = []
    for i in range(n_cameras):
        # drive forward along +z with slight lateral sway
        t_world = np.array([0.35 * np.sin(i * 0.7), 0.0, i * 1.2], np.float64)
        R = np.eye(3)
        T = -R.T @ t_world               # w2c translation for identity R
        cam_infos.append(CameraInfo(
            uid=i, R=R, T=T, K=K, width=width, height=height,
            image_name=f"synth_{i:03d}"))

    images = None
    if render_gt:
        images = _render_gt_images(pts, cols, sems, cam_infos, gt_opacity,
                                   rng)
        cam_infos = [c._replace(image=img, semantics=sem)
                     for c, (img, sem) in zip(cam_infos, images)]

    pc = PointCloud(points=pts, colors=cols, semantics=sems)
    train_infos, test_infos = cam_infos, []
    if eval_split:
        # the reference's LLFF convention holds out i % llffhold == 0
        # (scene/dataset_readers/colmap.py:89-90), same as this repo's
        # colmap reader
        test_infos = [c for i, c in enumerate(cam_infos)
                      if i % llffhold == 0]
        train_infos = [c for i, c in enumerate(cam_infos)
                       if i % llffhold != 0]
    frame_dict = {"front_start": 0, "front_end": len(train_infos)}
    return SceneInfo(point_cloud=pc, reference_cloud=pc,
                     train_cameras=train_infos, test_cameras=test_infos,
                     nerf_normalization=nerf_normalization(train_infos),
                     camera_frame_dict=frame_dict)


def _render_gt_images(pts, cols, sems, cam_infos, gt_opacity, rng):
    import jax
    import jax.numpy as jnp
    from ...ops.knn import mean_sq_dist_to_3nn
    from ...ops.rasterizer import RasterizeSettings, rasterize_oracle
    from ...ops.transforms import quat_to_rotmat  # noqa: F401 (parity)
    from ...utils.semantics import CONCERNED_IND

    n = pts.shape[0]
    dist = np.sqrt(np.maximum(mean_sq_dist_to_3nn(pts), 1e-7))
    scales = jnp.asarray(np.repeat(dist[:, None] * 1.3, 2, 1))
    quats = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    opac = jnp.full((n,), gt_opacity)
    cj = jnp.asarray(cols)
    pj = jnp.asarray(pts)

    # On an accelerator backend the O(N·pixels) jnp oracle is replaced by
    # the tiled Pallas path (parity-tested against the oracle) with the
    # semantic one-hot fused as extra payload channels — this is what
    # makes config-2-scale synthetic scenes (100k pts, 800x600) loadable
    # in seconds instead of hours; CPU keeps the hermetic oracle.
    fast = jax.default_backend() != "cpu"

    out = []
    for ci in cam_infos:
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = ci.R.T
        w2c[:3, 3] = ci.T
        st = RasterizeSettings(width=ci.width, height=ci.height,
                               znear=0.2, zfar=100.0)
        if fast:
            img, sem_img = _render_gt_fast(pj, scales, quats, opac, cj,
                                           sems, jnp.asarray(w2c),
                                           jnp.asarray(ci.K), st)
        else:
            res = rasterize_oracle(pj, scales, quats, opac, cj,
                                   jnp.asarray(w2c), jnp.asarray(ci.K), st,
                                   bg=jnp.array([0.25, 0.45, 0.7]),
                                   chunk_surfels=256, pixel_block=4096)
            img = np.clip(np.array(res.color), 0, 1).astype(np.float32)
            # semantic GT: per-pixel argmax over per-class alpha via
            # one-hot renders
            sem_img = _render_gt_semantics(pj, scales, quats, opac, sems,
                                           jnp.asarray(w2c),
                                           jnp.asarray(ci.K), st)
        out.append((img, sem_img))
    return out


def _render_gt_fast(pj, scales, quats, opac, cj, sems, w2c, K, st):
    """GT color + semantic argmax in ONE tiled Pallas pass (TPU path)."""
    import jax
    import jax.numpy as jnp
    from ...ops.rasterizer import rasterize
    from ...utils.semantics import CONCERNED_IND, NUM_CONCERNED

    onehot = np.zeros((sems.shape[0], NUM_CONCERNED), np.float32)
    onehot[np.arange(sems.shape[0]), sems] = 1.0

    @jax.jit
    def render_one(w2c_, K_):
        res = rasterize(pj, scales, quats, opac, cj, w2c_, K_, st,
                        bg=jnp.array([0.25, 0.45, 0.7]),
                        extra_payload=jnp.asarray(onehot))
        prob = res.extra
        sky = jax.nn.one_hot(CONCERNED_IND["sky"], NUM_CONCERNED)
        empty = jnp.sum(prob, -1, keepdims=True) < 0.2
        prob = jnp.where(empty, sky, prob)
        return (jnp.clip(res.color, 0.0, 1.0),
                jnp.argmax(prob, -1).astype(jnp.int32))

    img, sem_img = render_one(w2c, K)
    return (np.asarray(img, np.float32), np.asarray(sem_img))


def _render_gt_semantics(pj, scales, quats, opac, sems, w2c, K, st):
    import jax.numpy as jnp
    from ...ops.rasterizer import rasterize_oracle
    from ...utils.semantics import NUM_CONCERNED

    probs = []
    onehot = np.zeros((sems.shape[0], NUM_CONCERNED), np.float32)
    onehot[np.arange(sems.shape[0]), sems] = 1.0
    for c0 in range(0, NUM_CONCERNED, 3):
        chunk = np.zeros((sems.shape[0], 3), np.float32)
        chunk[:, :min(3, NUM_CONCERNED - c0)] = onehot[:, c0:c0 + 3]
        res = rasterize_oracle(pj, scales, quats, opac, jnp.asarray(chunk),
                               w2c, K, st, bg=None,
                               chunk_surfels=256, pixel_block=4096)
        probs.append(np.array(res.color))
    prob = np.concatenate(probs, axis=-1)[..., :NUM_CONCERNED]
    # empty pixels → sky
    alpha_sum = prob.sum(-1, keepdims=True)
    from ...utils.semantics import CONCERNED_IND
    sky = np.zeros_like(prob)
    sky[..., CONCERNED_IND["sky"]] = 1.0
    prob = np.where(alpha_sum < 0.2, sky, prob)
    return prob.argmax(-1).astype(np.int32)
