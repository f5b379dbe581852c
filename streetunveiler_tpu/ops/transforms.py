"""Camera / rigid-body math.

Re-creates the geometric conventions of the reference
(``/root/reference/utils/graphics_utils.py:1-85``,
``/root/reference/utils/general_utils.py:78-110``) in pure jnp so every
function is jit/vmap/grad-compatible:

* world→view matrices built from (R, t) where ``R`` is the camera-to-world
  rotation (COLMAP convention: stored transposed, see
  ``scene/colmap_loader.py`` usage in the reference),
* perspective projection with z mapped to ``[0, zfar]`` (NOT OpenGL's
  [-1, 1]) and an optional intrinsics-driven asymmetric frustum
  (``graphics_utils.py:54-85``),
* the row-vector "transposed matrix" convention of the reference camera
  (``scene/cameras.py:59-70``): points multiply matrices from the left.

All functions take/return float32 jnp arrays and work under vmap.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal2fov(focal: float, pixels: float) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))


def world_to_view(R, t, translate=None, scale: float = 1.0):
    """4x4 world→camera matrix.

    ``R`` is the transposed rotation as stored by the COLMAP readers (i.e.
    ``R = qvec2rotmat(qvec).T``), ``t`` the COLMAP translation. Follows
    reference ``getWorld2View2``: optionally recenters/rescales the camera
    center by ``translate``/``scale`` (used to normalize scene extent).
    """
    R = jnp.asarray(R, jnp.float32)
    t = jnp.asarray(t, jnp.float32)
    Rt = jnp.zeros((4, 4), jnp.float32)
    Rt = Rt.at[:3, :3].set(R.T)
    Rt = Rt.at[:3, 3].set(t)
    Rt = Rt.at[3, 3].set(1.0)
    if translate is not None or scale != 1.0:
        translate = jnp.zeros((3,), jnp.float32) if translate is None else jnp.asarray(translate, jnp.float32)
        C2W = jnp.linalg.inv(Rt)
        center = (C2W[:3, 3] + translate) * scale
        C2W = C2W.at[:3, 3].set(center)
        Rt = jnp.linalg.inv(C2W)
    return Rt


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float,
                      K=None, width: float | None = None, height: float | None = None):
    """Perspective matrix, z∈[0,zfar] clip convention of the reference.

    If ``K`` (3x3 intrinsics) plus ``width``/``height`` are given, builds the
    asymmetric frustum driven by (cx, cy) exactly like the reference's
    intrinsics branch (``graphics_utils.py:54-77``); otherwise the symmetric
    fov-driven frustum (``graphics_utils.py:79-85``).
    """
    if K is not None:
        K = jnp.asarray(K, jnp.float32)
        fx, fy = K[0, 0], K[1, 1]
        cx, cy = K[0, 2], K[1, 2]
        left = -cx / fx * znear
        right = (width - cx) / fx * znear
        top = cy / fy * znear
        bottom = -(height - cy) / fy * znear
    else:
        tan_half_fovy = math.tan(fovy / 2.0)
        tan_half_fovx = math.tan(fovx / 2.0)
        top = tan_half_fovy * znear
        bottom = -top
        right = tan_half_fovx * znear
        left = -right

    P = jnp.zeros((4, 4), jnp.float32)
    z_sign = 1.0
    P = P.at[0, 0].set(2.0 * znear / (right - left))
    P = P.at[1, 1].set(2.0 * znear / (top - bottom))
    P = P.at[0, 2].set((right + left) / (right - left))
    P = P.at[1, 2].set((top + bottom) / (top - bottom))
    P = P.at[3, 2].set(z_sign)
    P = P.at[2, 2].set(z_sign * zfar / (zfar - znear))
    P = P.at[2, 3].set(-(zfar * znear) / (zfar - znear))
    return P


def quat_to_rotmat(q):
    """Normalized quaternion(s) [..., 4] (w, x, y, z) → rotation matrices [..., 3, 3].

    Same layout as reference ``build_rotation`` (``general_utils.py:78-99``).
    """
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ], axis=-1)
    return R.reshape(q.shape[:-1] + (3, 3))


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


def camera_center_from_w2c(w2c):
    """Camera position in world space from a 4x4 world→view matrix."""
    return jnp.linalg.inv(w2c)[:3, 3]
