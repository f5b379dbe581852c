import jax.numpy as jnp
import numpy as np

from streetunveiler_tpu.ops.transforms import (
    camera_center_from_w2c, fov2focal, focal2fov, inverse_sigmoid,
    projection_matrix, quat_to_rotmat, world_to_view)


def test_fov_focal_roundtrip():
    assert np.isclose(focal2fov(fov2focal(0.9, 640), 640), 0.9)


def test_world_to_view_identity():
    w2c = world_to_view(np.eye(3), np.zeros(3))
    assert np.allclose(w2c, np.eye(4))


def test_world_to_view_camera_center():
    rng = np.random.default_rng(1)
    # random rotation via QR
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    q *= np.sign(np.linalg.det(q))
    t = rng.normal(size=3)
    # reference convention: R argument is transposed w2c rotation
    w2c = world_to_view(q.T, t)
    center = camera_center_from_w2c(w2c)
    # transforming the center to view space must give the origin
    v = w2c[:3, :3] @ center + w2c[:3, 3]
    assert np.allclose(v, 0.0, atol=1e-5)


def test_projection_matrix_depth_range():
    """Reference convention: NDC z maps to [0, 1], w carries view z."""
    znear, zfar = 0.01, 100.0
    P = np.array(projection_matrix(znear, zfar, 1.0, 0.8))
    for z, expect in [(znear, 0.0), (zfar, 1.0)]:
        p = P @ np.array([0.0, 0.0, z, 1.0])
        assert np.isclose(p[2] / p[3], expect, atol=1e-4)
    # w = view-space z
    p = P @ np.array([0.0, 0.0, 5.0, 1.0])
    assert np.isclose(p[3], 5.0)


def test_projection_matrix_intrinsics_branch_matches_fov():
    """Centered K must reproduce the symmetric-fov frustum."""
    W, H = 640, 480
    fovx, fovy = 1.0, 0.8
    fx, fy = fov2focal(fovx, W), fov2focal(fovy, H)
    K = np.array([[fx, 0, W / 2], [0, fy, H / 2], [0, 0, 1]], np.float32)
    P1 = np.array(projection_matrix(0.01, 100.0, fovx, fovy))
    P2 = np.array(projection_matrix(0.01, 100.0, fovx, fovy, K=K, width=W, height=H))
    assert np.allclose(P1, P2, atol=1e-5)


def test_quat_to_rotmat():
    # identity
    assert np.allclose(quat_to_rotmat(jnp.array([1.0, 0, 0, 0])), np.eye(3))
    # 90° about z: (w,x,y,z) = (cos45, 0, 0, sin45)
    s = np.sqrt(0.5)
    R = np.array(quat_to_rotmat(jnp.array([s, 0.0, 0.0, s])))
    assert np.allclose(R @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6)
    # orthonormality for random (auto-normalized) quats
    rng = np.random.default_rng(0)
    q = rng.normal(size=(10, 4)).astype(np.float32)
    Rs = np.array(quat_to_rotmat(jnp.asarray(q)))
    eye = np.broadcast_to(np.eye(3), (10, 3, 3))
    assert np.allclose(Rs @ np.transpose(Rs, (0, 2, 1)), eye, atol=1e-5)


def test_inverse_sigmoid():
    x = jnp.array([0.1, 0.5, 0.9])
    assert np.allclose(1 / (1 + np.exp(-np.array(inverse_sigmoid(x)))), x, atol=1e-6)
