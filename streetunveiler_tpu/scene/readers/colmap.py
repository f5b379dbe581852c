"""COLMAP scene reader (reference ``scene/dataset_readers/colmap.py:72``).

Builds SceneInfo from a COLMAP sparse reconstruction + image directory.
Semantic maps (.npz, cityscapes ids — the SegFormer offline contract of
SURVEY.md §2.3 N7) are read when a ``semantic`` sibling dir exists,
otherwise semantics default to 'building'.
"""

from __future__ import annotations

import os

import numpy as np

from ...utils.semantics import CONCERNED_IND, cityscapes_to_concerned
from ..colmap import load_colmap_model, qvec2rotmat
from .basic import CameraInfo, PointCloud, SceneInfo, nerf_normalization


def _intrinsics(cam):
    if cam.model == "SIMPLE_PINHOLE":
        f, cx, cy = cam.params[:3]
        fx = fy = f
    elif cam.model == "PINHOLE":
        fx, fy, cx, cy = cam.params[:4]
    elif cam.model in ("SIMPLE_RADIAL", "RADIAL"):
        f, cx, cy = cam.params[:3]
        fx = fy = f
    elif cam.model == "OPENCV":
        fx, fy, cx, cy = cam.params[:4]
    else:
        raise ValueError(f"unsupported COLMAP camera model {cam.model}")
    return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)


def _load_image(path):
    from PIL import Image
    img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    return img


def read_colmap_scene(source_path: str, colmap_path: str = "",
                      images: str = "images", eval_split: bool = False,
                      llffhold: int = 8, load_images: bool = True):
    sparse = colmap_path or os.path.join(source_path, "sparse", "0")
    if not os.path.isdir(sparse):
        sparse = os.path.join(source_path, "sparse")
    cams, imgs, (xyz, rgb, _err) = load_colmap_model(sparse)

    cam_infos = []
    img_dir = os.path.join(source_path, images)
    sem_dir = os.path.join(source_path, "semantic")
    for idx, (img_id, im) in enumerate(sorted(imgs.items())):
        cam = cams[im.camera_id]
        R = qvec2rotmat(im.qvec).T        # readers store transposed rotation
        image = None
        semantics = None
        ipath = os.path.join(img_dir, im.name)
        spath = os.path.join(sem_dir, os.path.splitext(im.name)[0] + ".npz")
        if load_images and os.path.exists(ipath):
            image = _load_image(ipath)
        if os.path.exists(spath):
            semantics = cityscapes_to_concerned(
                np.load(spath)["arr_0"]).astype(np.int32)
        cam_infos.append(CameraInfo(
            uid=idx, R=R, T=im.tvec.astype(np.float64), K=_intrinsics(cam),
            width=cam.width, height=cam.height, image_path=ipath,
            image_name=im.name, semantic_path=spath, image=image,
            semantics=semantics))

    if eval_split:
        train = [c for i, c in enumerate(cam_infos) if i % llffhold != 0]
        test = [c for i, c in enumerate(cam_infos) if i % llffhold == 0]
    else:
        train, test = cam_infos, []

    pc = PointCloud(points=xyz.astype(np.float32),
                    colors=(rgb.astype(np.float32) / 255.0),
                    semantics=np.full(xyz.shape[0],
                                      CONCERNED_IND["building"], np.int32))
    return SceneInfo(point_cloud=pc, reference_cloud=pc,
                     train_cameras=train, test_cameras=test,
                     nerf_normalization=nerf_normalization(train),
                     ply_path=os.path.join(sparse, "points3D.ply"))
