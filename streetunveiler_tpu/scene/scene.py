"""Scene container — reference ``scene/__init__.py:21-314``.

Owns the camera list, the surfel state, the model-dir artifact layout
(``point_cloud/iteration_N/point_cloud.ply``), and the point↔frame
projection queries the unveiling pipeline uses. Dataset dispatch follows
the reference's sentinel-file scheme where applicable; the synthetic
reader needs no files.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..models.gaussians import SurfelState, create_from_pcd
from ..utils.ply import state_from_ply, state_to_ply
from .cameras import Camera, make_camera
from .readers import SCENE_READERS
from .readers.basic import SceneInfo


def resolution_scale_size(width, height, resolution: int = -1):
    """Reference resolution policy (``utils/camera_utils.py:25-48``):
    -1 → clamp width to 1600; k ∈ {1,2,4,8} → divide."""
    if resolution in (1, 2, 4, 8):
        return round(width / resolution), round(height / resolution)
    if width > 1600:
        scale = width / 1600.0
        return round(width / scale), round(height / scale)
    return width, height


class Scene:
    def __init__(self, scene_info: SceneInfo, model_path: str = "",
                 resolution: int = -1, capacity: int = 0, sh_degree: int = 3,
                 only_pose: bool = False):
        """``only_pose``: skip image/semantic payloads — the reference's
        fast path for render-only stages (``utils/camera_utils.py:50-53``).
        Additional resolution scales are materialized lazily through
        ``at_scale`` (reference multi-scale camera lists,
        ``scene/__init__.py:119-164``)."""
        self.info = scene_info
        self.model_path = model_path
        self.resolution = resolution
        self.only_pose = only_pose
        self.cameras_extent = float(scene_info.nerf_normalization["radius"])
        self.camera_frame_dict = scene_info.camera_frame_dict or {}
        # the background GT images were composited on, when the reader
        # knows it (readers/basic.py SceneInfo.background) — training and
        # render drivers composite on the SAME color or empty-sky pixels
        # become unfittable
        self.background = getattr(scene_info, "background", None)

        def load_split(cam_infos, scale=1.0):
            cams, images, semantics = [], [], []
            for ci in cam_infos:
                w, h = resolution_scale_size(ci.width, ci.height, resolution)
                w, h = round(w / scale), round(h / scale)
                K = ci.K.copy()
                K[0, :] *= w / ci.width
                K[1, :] *= h / ci.height
                cams.append(make_camera(ci.R, ci.T, K, w, h))
                img = None if only_pose else ci.image
                if img is not None and img.shape[:2] != (h, w):
                    img = _resize(img, w, h)
                sem = None if only_pose else ci.semantics
                if sem is not None and sem.shape[:2] != (h, w):
                    sem = _resize_nearest(sem, w, h)
                images.append(img)
                semantics.append(sem)
            return cams, images, semantics

        self._load_split = load_split
        self._scaled: dict = {}
        self.train_cameras, self.train_images, self.train_semantics = \
            load_split(scene_info.train_cameras)
        # the held-out split keeps its images so training can evaluate on
        # it (reference ``training_report``, train.py:244-301)
        self.test_cameras, self.test_images, self.test_semantics = \
            load_split(scene_info.test_cameras)

    def at_scale(self, scale: float):
        """(cameras, images, semantics) of the train split downscaled by
        ``scale`` (reference ``getTrainCameras(scale)``), cached."""
        if scale == 1.0:
            return self.train_cameras, self.train_images, self.train_semantics
        if scale not in self._scaled:
            self._scaled[scale] = self._load_split(self.info.train_cameras,
                                                   scale)
        return self._scaled[scale]

    # ----------------------------------------------------------- state
    def create_state(self, capacity: int = 0, sh_degree: int = 3,
                     prune_sky: bool = True) -> SurfelState:
        """Init surfels from the scene point cloud. ``prune_sky``: the
        reference removes sky-class splats at training start (train.py:61)
        — sky is represented only by the env map."""
        from ..utils.semantics import CONCERNED_IND
        pc = self.info.point_cloud
        pts, cols, sems = pc.points, pc.colors, pc.semantics
        if prune_sky:
            keep = sems != CONCERNED_IND["sky"]
            pts, cols, sems = pts[keep], cols[keep], sems[keep]
        cap = capacity or int(pts.shape[0] * 2.5)
        return create_from_pcd(pts, cols, sems, self.cameras_extent,
                               capacity=cap, sh_degree=sh_degree)

    # ------------------------------------------------------- artifacts
    def save_cameras_json(self, path: str = "") -> str:
        """Write ``cameras.json`` in the reference's SIBR-viewer format
        (``utils/camera_utils.py:86-106``, ``scene/__init__.py:79-83``:
        c2w position + rotation rows + focal lengths per view)."""
        import json
        entries = []
        for i, cam in enumerate(self.train_cameras):
            c2w = np.linalg.inv(np.asarray(cam.w2c))
            entries.append({
                "id": i,
                "img_name": f"{i:05d}",
                "width": int(cam.width),
                "height": int(cam.height),
                "position": c2w[:3, 3].tolist(),
                "rotation": [row.tolist() for row in c2w[:3, :3]],
                "fx": float(cam.K[0, 0]),
                "fy": float(cam.K[1, 1]),
            })
        out = path or os.path.join(self.model_path, "cameras.json")
        with open(out, "w") as f:
            json.dump(entries, f)
        return out

    def ply_dir(self, iteration: int) -> str:
        return os.path.join(self.model_path, "point_cloud",
                            f"iteration_{iteration}")

    def save(self, state: SurfelState, iteration: int) -> None:
        state_to_ply(os.path.join(self.ply_dir(iteration), "point_cloud.ply"),
                     state)

    def load(self, iteration: int, capacity: int = 0) -> SurfelState:
        path = os.path.join(self.ply_dir(iteration), "point_cloud.ply")
        return state_from_ply(path, spatial_scale=self.cameras_extent,
                              capacity=capacity or None)

    # ------------------------------------------- projection queries
    def pcd_in_frame_mask(self, xyz, frame_idx: int, margin: float = 0.0):
        """Frustum-membership mask of points in a train frame (reference
        ``getPcdInTrainFrame`` :217 / projection_utils culling)."""
        cam = self.train_cameras[frame_idx]
        v = xyz @ jnp.asarray(cam.w2c[:3, :3]).T + jnp.asarray(cam.w2c[:3, 3])
        z = v[:, 2]
        x = v[:, 0] / jnp.maximum(z, 1e-8) * cam.K[0, 0] + cam.K[0, 2]
        y = v[:, 1] / jnp.maximum(z, 1e-8) * cam.K[1, 1] + cam.K[1, 2]
        return ((z > 0.01) & (x >= -margin) & (x < cam.width + margin)
                & (y >= -margin) & (y < cam.height + margin))

    def pcd_pixel_coords(self, xyz, frame_idx: int):
        """Pixel coordinates + depth of points in a frame (reference
        ``getPcdPixelCoordsInTrainFrameWithDepth`` :259)."""
        cam = self.train_cameras[frame_idx]
        v = xyz @ jnp.asarray(cam.w2c[:3, :3]).T + jnp.asarray(cam.w2c[:3, 3])
        z = jnp.maximum(v[:, 2], 1e-8)
        x = v[:, 0] / z * cam.K[0, 0] + cam.K[0, 2]
        y = v[:, 1] / z * cam.K[1, 1] + cam.K[1, 2]
        return jnp.stack([x, y], axis=-1), v[:, 2]

    def semantic_mask_of_splatting(self, xyz, semantic_remain_bit: int):
        """Per-point mask: True where the point projects (in any train
        frame) onto a pixel whose GT semantic class is in the bit set
        (reference ``getSemanticMaskOfSplatting`` :287)."""
        xyz = jnp.asarray(xyz)
        final = np.zeros(xyz.shape[0], bool)
        for fid, sem in enumerate(self.train_semantics):
            if sem is None:
                continue
            cam = self.train_cameras[fid]
            pix, _ = self.pcd_pixel_coords(xyz, fid)
            inm = np.asarray(self.pcd_in_frame_mask(xyz, fid))
            px = np.clip(np.asarray(pix[:, 0]).astype(np.int64), 0,
                         cam.width - 1)
            py = np.clip(np.asarray(pix[:, 1]).astype(np.int64), 0,
                         cam.height - 1)
            hit = ((1 << np.asarray(sem)[py, px].astype(np.int64))
                   & semantic_remain_bit) > 0
            final |= inm & hit
        return final


def load_scene(kind: str, model_path: str = "", **kwargs) -> Scene:
    reader = SCENE_READERS[kind]
    resolution = kwargs.pop("resolution", -1)
    info = reader(**kwargs)
    return Scene(info, model_path=model_path, resolution=resolution)


def _resize(img, w, h):
    from PIL import Image
    pil = Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8))
    return np.asarray(pil.resize((w, h)), np.float32) / 255.0


def _resize_nearest(arr, w, h):
    from PIL import Image
    pil = Image.fromarray(arr.astype(np.int32), mode="I")
    return np.asarray(pil.resize((w, h), Image.NEAREST), np.int32)
