"""Data-layer machinery: voxel downsample, Umeyama, projection labeling,
TSDF meshing, checkpointing, hermetic dataset readers."""

import gzip
import json
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from streetunveiler_tpu.ops.umeyama import apply_similarity, umeyama
from streetunveiler_tpu.utils.pcd import SemanticPointCloud, voxel_down_sample


def test_voxel_down_sample_majority_and_agreement():
    # two voxels: one unanimous, one 50/50 split (dropped at 0.8)
    pts = np.array([[0.1, 0.1, 0.1], [0.2, 0.2, 0.2], [0.15, 0.1, 0.2],
                    [5.0, 5.0, 5.0], [5.1, 5.1, 5.1]], np.float32)
    cols = np.ones((5, 3), np.float32) * 0.5
    sems = np.array([2, 2, 2, 1, 3], np.int32)
    pc = voxel_down_sample(SemanticPointCloud(pts, cols, sems), 1.0)
    assert pc.points.shape[0] == 1
    assert pc.semantics[0] == 2
    np.testing.assert_allclose(pc.points[0], pts[:3].mean(0), atol=1e-5)
    # lower agreement keeps the split voxel with an argmax label
    pc2 = voxel_down_sample(SemanticPointCloud(pts, cols, sems), 1.0,
                            agreement=0.4)
    assert pc2.points.shape[0] == 2


def test_umeyama_recovers_similarity():
    rng = np.random.default_rng(0)
    src = rng.normal(size=(20, 3))
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    q *= np.sign(np.linalg.det(q))
    tgt = 2.5 * src @ q.T + np.array([1.0, -2.0, 3.0])
    rmsd, R, t, c = umeyama(tgt, src)
    assert rmsd < 1e-9
    assert abs(c - 2.5) < 1e-9
    np.testing.assert_allclose(apply_similarity(src, R, t, c), tgt,
                               atol=1e-9)


def test_projection_colorize():
    from streetunveiler_tpu.scene.readers.projection import (
        colorize_points_from_frames)
    img = np.zeros((64, 64, 3), np.float32)
    img[:, :32] = [1, 0, 0]
    img[:, 32:] = [0, 1, 0]
    sem = np.zeros((64, 64), np.int32)
    sem[:, 32:] = 5
    f = 40.0
    K = np.array([[f, 0, 32], [0, f, 32], [0, 0, 1]])
    frames = [dict(w2c=np.eye(4), K=K, image=img, semantic=sem)]
    # keep projections ≥10px away from the class boundary at x=32 (the
    # certainty test rejects labels near boundaries by design)
    pts = np.array([[-0.8, 0, 2.0], [0.8, 0, 2.0], [0, 0, -1.0]])
    cols, sems, seen = colorize_points_from_frames(pts, frames)
    assert seen[0] and seen[1] and not seen[2]
    np.testing.assert_allclose(cols[0], [1, 0, 0])
    np.testing.assert_allclose(cols[1], [0, 1, 0])
    assert sems[0] == 0 and sems[1] == 5


def test_tsdf_mesh_sphere():
    from streetunveiler_tpu.ops.tsdf import (TSDFVolume, make_volume,
                                             surface_nets)
    # analytic sphere SDF instead of view integration
    vol = make_volume([-1, -1, -1], [2, 2, 2], 0.1)
    dims = vol.tsdf.shape
    g = np.stack(np.meshgrid(*[np.arange(d) for d in dims],
                             indexing="ij"), -1) * 0.1 - 1.0
    sdf = np.clip((np.linalg.norm(g, axis=-1) - 0.6) / 0.2, -1, 1)
    verts, faces, _ = surface_nets(sdf, np.ones(dims) * 2, [-1, -1, -1],
                                   0.1)
    assert verts.shape[0] > 50 and faces.shape[0] > 50
    r = np.linalg.norm(verts, axis=1)
    assert abs(r.mean() - 0.6) < 0.05


def test_tsdf_integration():
    from streetunveiler_tpu.ops.tsdf import integrate_tsdf, make_volume
    vol = make_volume([-1, -1, 0.5], [2, 2, 2], 0.1)
    f = 30.0
    K = jnp.array([[f, 0, 32], [0, f, 32], [0, 0, 1]], jnp.float32)
    depth = jnp.full((64, 64), 1.5)
    color = jnp.ones((64, 64, 3)) * 0.7
    vol = integrate_tsdf(vol, depth, color, jnp.eye(4), K, trunc=0.3)
    t = np.array(vol.tsdf)
    w = np.array(vol.weight)
    assert w.max() == 1.0
    # voxels in front of the wall are positive, behind negative
    zgrid = np.arange(t.shape[2]) * 0.1 + 0.5
    observed = w > 0
    assert observed.any()
    front = observed & (zgrid[None, None, :] < 1.2)
    back = observed & (zgrid[None, None, :] > 1.8)
    assert t[front].min() > 0
    if back.any():
        assert t[back].max() <= 0 or np.all(w[back] == 0)


def test_checkpoint_roundtrip(tmp_path):
    from streetunveiler_tpu.models.gaussians import create_from_pcd
    from streetunveiler_tpu.models.sky import init_sky
    from streetunveiler_tpu.train.checkpoint import (load_checkpoint,
                                                     save_checkpoint,
                                                     search_max_iteration)
    from streetunveiler_tpu.train.optim import adam_init
    from streetunveiler_tpu.train.step import init_optimizer

    rng = np.random.default_rng(0)
    state = create_from_pcd(rng.normal(size=(20, 3)).astype(np.float32),
                            rng.random((20, 3)).astype(np.float32),
                            rng.integers(0, 6, 20), 2.0, capacity=32)
    opt = init_optimizer(state)
    sky = init_sky(jax.random.PRNGKey(0))
    sky_opt = adam_init(sky)
    p = str(tmp_path / "ck" / "iteration_700")
    save_checkpoint(p, state, opt, 700, sky_params=sky, sky_opt_state=sky_opt)
    s2, o2, it, sky2, sko2 = load_checkpoint(p, state, opt, sky, sky_opt)
    assert it == 700
    np.testing.assert_allclose(np.array(s2.params.xyz),
                               np.array(state.params.xyz))
    np.testing.assert_allclose(np.array(sky2.hash_tables),
                               np.array(sky.hash_tables))
    assert search_max_iteration(str(tmp_path / "ck")) == 700


def _fake_image(path, w=64, h=48):
    from PIL import Image
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arr = np.full((h, w, 3), 128, np.uint8)
    Image.fromarray(arr).save(path)


def test_pandaset_reader(tmp_path):
    from streetunveiler_tpu.scene.readers.pandaset import read_pandaset_info
    seq = tmp_path / "001"
    cam = seq / "camera" / "front_camera"
    os.makedirs(cam)
    poses = [dict(heading=dict(w=1, x=0, y=0, z=0),
                  position=dict(x=0, y=0, z=float(i))) for i in range(3)]
    json.dump(poses, open(cam / "poses.json", "w"))
    json.dump(dict(fx=40, fy=40, cx=32, cy=24),
              open(cam / "intrinsics.json", "w"))
    for i in range(3):
        _fake_image(str(cam / f"{i:02d}.jpg"))
    ldir = seq / "lidar"
    os.makedirs(ldir)
    pts = dict(x=np.random.rand(50) * 4 - 2, y=np.random.rand(50) * 2 - 1,
               z=np.random.rand(50) * 5 + 2)
    with gzip.open(ldir / "00.pkl.gz", "wb") as f:
        pickle.dump(pts, f)

    info = read_pandaset_info(str(tmp_path), "001",
                              cameras=["front_camera"])
    assert len(info.train_cameras) == 3
    assert info.train_cameras[0].image is not None
    assert info.camera_frame_dict["front_end"] == 3


def test_nuscenes_reader(tmp_path):
    from streetunveiler_tpu.scene.readers.nuscenes import read_nuscenes_info
    meta = tmp_path / "v1.0-mini"
    os.makedirs(meta)

    def dump(name, rows):
        json.dump(rows, open(meta / f"{name}.json", "w"))

    dump("scene", [dict(token="sc", name="scene-0001",
                        first_sample_token="s0")])
    dump("sample", [dict(token="s0", next="s1"),
                    dict(token="s1", next="")])
    dump("sensor", [dict(token="senc", channel="CAM_FRONT"),
                    dict(token="senl", channel="LIDAR_TOP")])
    dump("calibrated_sensor", [
        dict(token="csc", sensor_token="senc", rotation=[1, 0, 0, 0],
             translation=[0, 0, 0],
             camera_intrinsic=[[40, 0, 32], [0, 40, 24], [0, 0, 1]]),
        dict(token="csl", sensor_token="senl", rotation=[1, 0, 0, 0],
             translation=[0, 0, 0], camera_intrinsic=[])])
    dump("ego_pose", [dict(token=f"e{i}", rotation=[1, 0, 0, 0],
                           translation=[0, 0, float(i)])
                      for i in range(2)])
    sds = []
    for i in range(2):
        sds.append(dict(token=f"sdc{i}", sample_token=f"s{i}",
                        calibrated_sensor_token="csc",
                        ego_pose_token=f"e{i}", is_key_frame=True,
                        filename=f"samples/CAM_FRONT/{i}.jpg",
                        width=64, height=48))
        sds.append(dict(token=f"sdl{i}", sample_token=f"s{i}",
                        calibrated_sensor_token="csl",
                        ego_pose_token=f"e{i}", is_key_frame=True,
                        filename=f"samples/LIDAR_TOP/{i}.pcd.bin",
                        width=0, height=0))
    dump("sample_data", sds)
    for i in range(2):
        _fake_image(str(tmp_path / "samples" / "CAM_FRONT" / f"{i}.jpg"))
        os.makedirs(tmp_path / "samples" / "LIDAR_TOP", exist_ok=True)
        np.random.rand(30, 5).astype(np.float32).tofile(
            tmp_path / "samples" / "LIDAR_TOP" / f"{i}.pcd.bin")

    info = read_nuscenes_info(str(tmp_path), "scene-0001",
                              cameras=["CAM_FRONT"])
    assert len(info.train_cameras) == 2


def test_blender_reader(tmp_path):
    from streetunveiler_tpu.scene.readers.blender import read_blender_info
    frames = [dict(file_path=f"./train/r_{i}",
                   transform_matrix=np.eye(4).tolist()) for i in range(2)]
    json.dump(dict(camera_angle_x=0.8, frames=frames),
              open(tmp_path / "transforms_train.json", "w"))
    info = read_blender_info(str(tmp_path), n_init_points=500)
    assert len(info.train_cameras) == 2
    assert info.point_cloud.points.shape == (500, 3)


def test_synthetic_eval_split():
    """--eval holds out every llffhold-th camera (reference colmap.py
    eval/llffhold convention, applied to the procedural scene)."""
    from streetunveiler_tpu.scene.readers import make_synthetic_street
    info = make_synthetic_street(n_points=200, n_cameras=16,
                                 render_gt=False, eval_split=True)
    assert len(info.test_cameras) == 2
    assert len(info.train_cameras) == 14
    held = {c.uid for c in info.test_cameras}
    assert held == {0, 8}
    info2 = make_synthetic_street(n_points=200, n_cameras=16,
                                  render_gt=False)
    assert len(info2.test_cameras) == 0 and len(info2.train_cameras) == 16
