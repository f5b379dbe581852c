"""Hermetic Waymo + KITTI reader tests against synthetic on-disk layouts
(reference ``scene/dataset_readers/waymo.py:360`` / ``kitti.py:361``) —
the pose/rectification math is where silent errors live, so the checks
are geometric: known lidar points must project where the poses say."""

import os

import numpy as np
import pytest


def _write_png(path, arr):
    from PIL import Image
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


def _project(ci, pts):
    """Project world points through a CameraInfo (R is transposed w2c)."""
    w2c = np.eye(4)
    w2c[:3, :3] = ci.R.T
    w2c[:3, 3] = ci.T
    v = pts @ w2c[:3, :3].T + w2c[:3, 3]
    z = v[:, 2]
    x = v[:, 0] / z * ci.K[0, 0] + ci.K[0, 2]
    y = v[:, 1] / z * ci.K[1, 1] + ci.K[1, 2]
    return np.stack([x, y], -1), z


# --------------------------------------------------------------- waymo

def _fake_waymo(tmp_path, n_frames=2, w=64, h=48, f=50.0):
    import torch
    root = tmp_path / "seg"
    colmap = tmp_path / "colmap"
    (root / "images" / "camera_FRONT").mkdir(parents=True)
    (root / "lidars" / "lidar_TOP").mkdir(parents=True)
    (colmap / "input_masks").mkdir(parents=True)

    # camera looks down +z (OpenCV c2w), moving 2m forward per frame
    c2ws, intrs, hws = [], [], []
    for i in range(n_frames):
        c2w = np.eye(4)
        c2w[2, 3] = 2.0 * i
        c2ws.append(c2w)
        K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float64)
        intrs.append(K)
        hws.append([h, w])
    scenario = {"observers": {"camera_FRONT": {"data": {
        "c2w": np.asarray(c2ws), "intr": np.asarray(intrs),
        "hw": np.asarray(hws)}}}}
    torch.save(scenario, root / "scenario.pt")

    img = np.full((h, w, 3), 128, np.uint8)
    for i in range(n_frames):
        _write_png(str(root / "images" / "camera_FRONT" / f"{i:08d}.jpg"),
                   img)
        # cityscapes train-id 0 = road → concerned 'road'
        np.savez(colmap / "input_masks" / f"{i:05d}.npz",
                 np.zeros((h, w), np.uint8))

    # lidar: a grid of points 8m ahead of frame 0, slight spread
    gy, gx = np.meshgrid(np.linspace(-1.5, 1.5, 8),
                         np.linspace(-2, 2, 8), indexing="ij")
    pts = np.stack([gx.ravel(), gy.ravel(), np.full(64, 8.0)], 1)
    rays_o = np.zeros_like(pts)
    rng = np.linalg.norm(pts, axis=1)
    rays_d = pts / rng[:, None]
    np.savez(root / "lidars" / "lidar_TOP" / "00000000.npz",
             rays_o=rays_o.astype(np.float32),
             rays_d=rays_d.astype(np.float32),
             ranges=rng.astype(np.float32))
    return str(root), str(colmap)


def test_waymo_reader_geometry(tmp_path):
    from streetunveiler_tpu.scene.readers import read_waymo_info
    root, colmap = _fake_waymo(tmp_path)
    info = read_waymo_info(root, colmap, voxel_size=0.05)

    assert len(info.train_cameras) == 2
    assert info.camera_frame_dict == {"front_start": 0, "front_end": 2}
    pc = info.point_cloud
    assert pc.points.shape[0] > 0
    # all points labeled road (mask is all zeros) and near z≈8
    assert set(np.unique(pc.semantics)) == {0}
    np.testing.assert_allclose(pc.points[:, 2], 8.0, atol=0.2)

    # geometric check: the lidar points sit 8m ahead of frame 0 and 6m
    # ahead of frame 1 (the rig moved 2m forward)
    pix0, z0 = _project(info.train_cameras[0], pc.points)
    pix1, z1 = _project(info.train_cameras[1], pc.points)
    np.testing.assert_allclose(z0, 8.0, atol=0.2)
    np.testing.assert_allclose(z1, 6.0, atol=0.2)
    assert (pix0 >= 0).all() and (pix0[:, 0] < 64).all() \
        and (pix0[:, 1] < 48).all()


# --------------------------------------------------------------- kitti

def _fake_kitti(tmp_path, n_frames=2, w=128, h=96, f=60.0):
    date = "2011_09_26"
    drive = "0001"
    base = tmp_path / "kitti"
    date_dir = base / date
    drive_dir = date_dir / f"{date}_drive_{drive}_sync"
    (drive_dir / "oxts" / "data").mkdir(parents=True)
    (drive_dir / "velodyne_points" / "data").mkdir(parents=True)
    (drive_dir / "image_02" / "data").mkdir(parents=True)
    (drive_dir / "image_03" / "data").mkdir(parents=True)

    # velo (x fwd, y left, z up) → cam (x right, y down, z fwd)
    R_vc = np.array([[0.0, -1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])
    with open(date_dir / "calib_velo_to_cam.txt", "w") as fo:
        fo.write("R: " + " ".join(map(str, R_vc.ravel())) + "\n")
        fo.write("T: 0 0 0\n")
    with open(date_dir / "calib_imu_to_velo.txt", "w") as fo:
        fo.write("R: 1 0 0 0 1 0 0 0 1\nT: 0 0 0\n")
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]])
    P2 = np.hstack([K, np.zeros((3, 1))])
    # camera 03 offset 0.5m right of cam0: P = K [I | t], t_x = −f·b form
    P3 = np.hstack([K, (K @ np.array([-0.5, 0, 0]))[:, None]])
    with open(date_dir / "calib_cam_to_cam.txt", "w") as fo:
        fo.write("R_rect_00: 1 0 0 0 1 0 0 0 1\n")
        fo.write("P_rect_02: " + " ".join(map(str, P2.ravel())) + "\n")
        fo.write("P_rect_03: " + " ".join(map(str, P3.ravel())) + "\n")

    # two frames driving EAST (yaw=0 means IMU x-axis points east in the
    # Mercator frame) spaced 5 m apart, at lat=0 so the scale is exactly 1
    earth = 6378137.0
    img = np.full((h, w, 3), 90, np.uint8)
    for i in range(n_frames):
        lon = np.degrees(5.0 * i / earth)
        row = np.zeros(30)
        row[0], row[1], row[2] = 0.0, lon, 0.0      # lat lon alt
        row[3], row[4], row[5] = 0.0, 0.0, 0.0      # roll pitch yaw
        np.savetxt(drive_dir / "oxts" / "data" / f"{i:010d}.txt",
                   row[None, :])
        _write_png(str(drive_dir / "image_02" / "data" / f"{i:010d}.png"),
                   img)
        _write_png(str(drive_dir / "image_03" / "data" / f"{i:010d}.png"),
                   img)
        # velodyne: points 10m ahead (velo +x), slight lateral spread
        pts = np.stack([np.full(32, 10.0 - 5.0 * i),
                        np.linspace(-2, 2, 32), np.zeros(32)], 1)
        refl = np.zeros((32, 1))
        np.hstack([pts, refl]).astype(np.float32).tofile(
            drive_dir / "velodyne_points" / "data" / f"{i:010d}.bin")

    colmap = tmp_path / "kcolmap"
    (colmap / "input_masks").mkdir(parents=True)
    for i in range(2 * n_frames):
        np.savez(colmap / "input_masks" / f"{i:05d}.npz",
                 np.zeros((h, w), np.uint8))
    return str(base), date, drive, str(colmap)


def test_kitti_reader_pose_math(tmp_path):
    from streetunveiler_tpu.scene.readers import read_kitti_info
    base, date, drive, colmap = _fake_kitti(tmp_path)
    info = read_kitti_info(base, date, drive, colmap, voxel_size=0.05)

    cams = info.train_cameras
    assert len(cams) == 4          # 2 frames × cameras 02/03
    assert info.camera_frame_dict == {"front_start": 0, "front_end": 2}

    def center(ci):
        w2c = np.eye(4)
        w2c[:3, :3] = ci.R.T
        w2c[:3, 3] = ci.T
        return np.linalg.inv(w2c)[:3, 3]

    # frame spacing: the 5m GPS displacement must survive the
    # Mercator → pose → rectification chain
    c02 = [center(c) for c in cams[:2]]
    np.testing.assert_allclose(np.linalg.norm(c02[1] - c02[0]), 5.0,
                               atol=1e-3)
    # stereo baseline: camera 03 sits 0.5m from camera 02
    c03 = [center(c) for c in cams[2:]]
    np.testing.assert_allclose(np.linalg.norm(c03[0] - c02[0]), 0.5,
                               atol=1e-3)

    # lidar points were 10m ahead of frame 0 (and world-registered via the
    # same oxts chain from frame 1 at 5m): depth from frame-0 cam ≈ 10
    pc = info.point_cloud
    assert pc.points.shape[0] > 0
    _, z0 = _project(cams[0], pc.points)
    assert z0.min() > 4.0 and z0.max() < 11.0
    assert np.isclose(z0.max(), 10.0, atol=0.5)
