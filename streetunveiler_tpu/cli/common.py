"""Shared CLI helpers: dataset dispatch from persisted ModelParams.

The reference dispatches readers by sniffing sentinel files in the source
dir (``scene/__init__.py:41-67``); here the scene kind and its selectors
are explicit ``ModelParams`` fields persisted in ``cfg_args.json``, so
``render``/``unveil``/``evaluate`` reload exactly the scene ``train``
used — the same filesystem-IPC contract, made explicit.
"""

from __future__ import annotations

from ..config import ModelParams

SCENE_KINDS = ("synthetic", "colmap", "blender", "waymo", "kitti",
               "pandaset", "nuscenes")


def load_scene_info(model: ModelParams, seed: int = 0):
    """Build SceneInfo for the configured dataset kind."""
    kind = model.scene or ("colmap" if model.source_path else "synthetic")
    frames = dict(start_frame=model.start_frame or 0,
                  end_frame=model.end_frame)
    if kind == "synthetic":
        from ..scene.readers import make_synthetic_street
        kw = dict(seed=seed, eval_split=model.eval)
        if model.synthetic_points:
            kw["n_points"] = model.synthetic_points
        if model.synthetic_cameras:
            kw["n_cameras"] = model.synthetic_cameras
        if model.synthetic_width:
            kw["width"] = model.synthetic_width
        if model.synthetic_height:
            kw["height"] = model.synthetic_height
        if model.synthetic_focal:
            kw["focal"] = model.synthetic_focal
        return make_synthetic_street(**kw)
    if kind == "colmap":
        from ..scene.readers import read_colmap_scene
        return read_colmap_scene(model.source_path, model.colmap_path,
                                 images=model.images,
                                 eval_split=model.eval)
    if kind == "blender":
        from ..scene.readers import read_blender_info
        return read_blender_info(model.source_path,
                                 white_background=model.white_background)
    if kind == "waymo":
        from ..scene.readers import read_waymo_info
        return read_waymo_info(model.source_path, model.colmap_path,
                               **frames)
    if kind == "kitti":
        from ..scene.readers import read_kitti_info
        return read_kitti_info(model.source_path, model.date, model.drive,
                               model.colmap_path, **frames)
    if kind == "pandaset":
        from ..scene.readers import read_pandaset_info
        return read_pandaset_info(model.source_path, model.sequence,
                                  model.colmap_path, **frames)
    if kind == "nuscenes":
        from ..scene.readers import read_nuscenes_info
        return read_nuscenes_info(model.source_path, model.scene_name,
                                  version=model.version,
                                  colmap_path=model.colmap_path, **frames)
    raise ValueError(f"unknown scene kind {kind!r}; expected one of "
                     f"{SCENE_KINDS}")


def scene_background(scene, white_background: bool = False):
    """The background color every driver must composite on: white when the
    reference's -w flag is set, else the background GT images were built
    on when the reader knows it (SceneInfo.background — the synthetic
    reader's sky color), else black.

    Training/eval on a DIFFERENT background than the GT's makes every
    empty-sky pixel unfittable — at config-2 scale that is ~25% of each
    frame and a hard ~12-PSNR ceiling (the round-4 plateau)."""
    import jax.numpy as jnp
    if white_background:
        return jnp.ones(3)
    if getattr(scene, "background", None) is not None:
        return jnp.asarray(scene.background, jnp.float32)
    return jnp.zeros(3)
