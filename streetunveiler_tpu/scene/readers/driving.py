"""Shared driving-log scene assembly.

Every driving reader (Waymo/Pandaset/KITTI/nuScenes) reduces to the same
steps the reference implements per-dataset (SURVEY.md §1 data layer):

1. per-frame cameras (pose, intrinsics, image path, semantic .npz mask),
2. lidar sweeps in world coordinates,
3. colorize + label lidar points by projecting into the frames
   (projection.colorize_points_from_frames),
4. voxel-downsample with semantic majority vote (utils.pcd),
5. optionally align COLMAP poses/points into the dataset frame with a
   similarity transform over camera centers (ops.umeyama — the
   superpose3d replacement), adding labeled COLMAP sparse points,
6. emit SceneInfo with the front-camera frame range dict.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from ...ops.umeyama import apply_similarity, umeyama
from ...utils.pcd import SemanticPointCloud, voxel_down_sample
from ...utils.semantics import CONCERNED_IND, cityscapes_to_concerned
from ..colmap import load_colmap_model, qvec2rotmat
from .basic import CameraInfo, PointCloud, SceneInfo, nerf_normalization
from .projection import colorize_points_from_frames


def load_semantic_npz(path: str):
    if not os.path.exists(path):
        return None
    return cityscapes_to_concerned(np.load(path)["arr_0"]).astype(np.int32)


def assemble_driving_scene(cam_infos: Sequence[CameraInfo],
                           lidar_points_world: np.ndarray,
                           colmap_path: str = "",
                           voxel_size: float = 0.15,
                           camera_frame_dict: Optional[dict] = None,
                           max_points: int = 5_000_000) -> SceneInfo:
    """Steps 3-6 given cameras (with loaded images/semantics) + lidar."""
    pts = np.asarray(lidar_points_world, np.float32)
    if pts.shape[0] > max_points:
        sel = np.random.default_rng(0).choice(pts.shape[0], max_points,
                                              replace=False)
        pts = pts[sel]

    frames = []
    for ci in cam_infos:
        if ci.image is None:
            continue
        w2c = np.eye(4)
        w2c[:3, :3] = ci.R.T
        w2c[:3, 3] = ci.T
        frames.append(dict(w2c=w2c, K=ci.K, image=ci.image,
                           semantic=ci.semantics))

    colors, sems, seen = colorize_points_from_frames(pts, frames)
    keep = seen & (sems >= 0)
    pc = SemanticPointCloud(points=pts[keep], colors=colors[keep],
                            semantics=sems[keep])
    pc = voxel_down_sample(pc, voxel_size)

    # optional COLMAP sparse points aligned into the dataset frame
    if colmap_path and os.path.isdir(colmap_path):
        pc = _merge_colmap_points(pc, cam_infos, colmap_path, frames)

    cloud = PointCloud(points=pc.points, colors=pc.colors,
                       semantics=pc.semantics)
    return SceneInfo(point_cloud=cloud, reference_cloud=cloud,
                     train_cameras=list(cam_infos), test_cameras=[],
                     nerf_normalization=nerf_normalization(cam_infos),
                     camera_frame_dict=camera_frame_dict)


def _merge_colmap_points(pc, cam_infos, colmap_path, frames):
    """Align COLMAP model to the dataset frame by camera centers and add
    its sparse points, labeled by projection (reference
    ``readWaymoInfo``'s Superpose3D + sparse labeling, waymo.py:411-441)."""
    sparse = os.path.join(colmap_path, "sparse", "0")
    if not os.path.isdir(sparse):
        sparse = os.path.join(colmap_path, "sparse")
    if not os.path.isdir(sparse):
        return pc
    cams, images, (xyz, rgb, _err) = load_colmap_model(sparse)

    # match COLMAP images to dataset cameras by sorted name order
    col_centers = []
    data_centers = []
    by_name = {ci.image_name: ci for ci in cam_infos}
    for _, im in sorted(images.items()):
        ci = by_name.get(im.name) or by_name.get(os.path.splitext(im.name)[0])
        if ci is None:
            continue
        R = qvec2rotmat(im.qvec)
        col_centers.append(-R.T @ im.tvec)
        w2c = np.eye(4)
        w2c[:3, :3] = ci.R.T
        w2c[:3, 3] = ci.T
        data_centers.append(np.linalg.inv(w2c)[:3, 3])
    if len(col_centers) < 3:
        return pc
    _, R, t, c = umeyama(np.asarray(data_centers), np.asarray(col_centers))
    xyz_d = apply_similarity(xyz, R, t, c).astype(np.float32)

    colors, sems, seen = colorize_points_from_frames(xyz_d, frames)
    keep = seen & (sems >= 0)
    extra = SemanticPointCloud(points=xyz_d[keep], colors=colors[keep],
                               semantics=sems[keep])
    return pc.concat(extra)
