import os

import numpy as np

from streetunveiler_tpu.evaluation.metrics import (activation_stats,
                                                   evaluate_dirs,
                                                   frechet_distance)
from streetunveiler_tpu.utils.render_paths import (generate_ellipse_path,
                                                   transform_poses_pca,
                                                   write_video)


def _dump(dirp, imgs):
    from PIL import Image
    os.makedirs(dirp, exist_ok=True)
    for i, im in enumerate(imgs):
        Image.fromarray((im * 255).astype(np.uint8)).save(
            os.path.join(dirp, f"{i:05d}.png"))


def test_evaluate_dirs(tmp_path):
    rng = np.random.default_rng(0)
    gt = [rng.random((32, 32, 3)).astype(np.float32) for _ in range(3)]
    near = [np.clip(g + rng.normal(0, 0.01, g.shape), 0, 1).astype(np.float32)
            for g in gt]
    _dump(str(tmp_path / "gt"), gt)
    _dump(str(tmp_path / "r"), near)
    out = evaluate_dirs(str(tmp_path / "r"), str(tmp_path / "gt"))
    assert out["n"] == 3
    assert out["psnr"] > 35
    assert out["ssim"] > 0.9


def test_frechet_distance():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(500, 8))
    b = rng.normal(size=(500, 8))
    same = frechet_distance(*activation_stats(a), *activation_stats(a))
    diff = frechet_distance(*activation_stats(a),
                            *activation_stats(b + 3.0))
    assert same < 1e-6
    assert diff > 50


def test_ellipse_path():
    rng = np.random.default_rng(2)
    th = np.linspace(0, 2 * np.pi, 20, endpoint=False)
    c2ws = []
    for t in th:
        c2w = np.eye(4)
        c2w[:3, 3] = [3 * np.cos(t), 2 * np.sin(t), 0.1 * rng.random()]
        c2ws.append(c2w)
    path = generate_ellipse_path(np.stack(c2ws), n_frames=24)
    assert path.shape == (24, 4, 4)
    # orthonormal rotations, looking roughly at the center
    for p in path[:4]:
        R = p[:3, :3]
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-6)
    rec, _ = transform_poses_pca(np.stack(c2ws))
    assert rec.shape == (20, 4, 4)


def test_write_video(tmp_path):
    rng = np.random.default_rng(3)
    _dump(str(tmp_path / "fr"), [rng.random((16, 16, 3)) for _ in range(4)])
    out = write_video(str(tmp_path / "fr"), str(tmp_path / "vid"))
    assert os.path.exists(out) and out.endswith(".gif")
