"""Camera state.

TPU-native redesign of reference ``scene/cameras.py:13-98``. The reference
``Camera`` is an ``nn.Module`` holding image tensors + four derived matrices
(transposed ``world_view_transform``/``full_proj_transform``). Here the camera
is a *pytree dataclass* whose array leaves can cross jit boundaries; static
ints (width/height) are aux data so shape-specializing jit works naturally.

Rendering only ever needs (w2c, K, W, H, znear, zfar); the derived reference
matrices are provided as properties for checkpoint/parity tooling.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.transforms import projection_matrix, focal2fov


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """A pinhole camera. ``w2c``: 4x4 world→view; ``K``: 3x3 intrinsics."""

    w2c: Any
    K: Any
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))
    znear: float = dataclasses.field(default=0.01, metadata=dict(static=True))
    zfar: float = dataclasses.field(default=100.0, metadata=dict(static=True))

    @property
    def fx(self):
        return self.K[0, 0]

    @property
    def fy(self):
        return self.K[1, 1]

    @property
    def cx(self):
        return self.K[0, 2]

    @property
    def cy(self):
        return self.K[1, 2]

    @property
    def fovx(self) -> float:
        return focal2fov(float(self.K[0, 0]), self.width)

    @property
    def fovy(self) -> float:
        return focal2fov(float(self.K[1, 1]), self.height)

    @property
    def camera_center(self):
        c2w = jnp.linalg.inv(self.w2c)
        return c2w[:3, 3]

    @property
    def world_view_transform(self):
        """Transposed w2c — the reference's row-vector convention
        (``scene/cameras.py:59``)."""
        return self.w2c.T

    @property
    def full_proj_transform(self):
        """Transposed (proj @ w2c), reference ``scene/cameras.py:66-70``."""
        proj = projection_matrix(self.znear, self.zfar, self.fovx, self.fovy,
                                 K=self.K, width=self.width, height=self.height)
        return jnp.matmul(proj, self.w2c,
                          precision=jax.lax.Precision.HIGHEST).T

    def resize(self, scale: float) -> "Camera":
        """Camera for an image downscaled by ``scale`` (reference resolution
        policy divides by 1/2/4/8, ``utils/camera_utils.py:25-48``)."""
        K = np.array(self.K, np.float32).copy()
        K[:2, :] /= scale
        return dataclasses.replace(
            self, K=jnp.asarray(K),
            width=int(round(self.width / scale)),
            height=int(round(self.height / scale)))


def make_camera(R, t, K, width, height, znear=0.01, zfar=100.0) -> Camera:
    """Build a Camera from COLMAP-style (R, t) — R is the transposed
    world→cam rotation exactly as the reference readers store it."""
    R = np.asarray(R, np.float32)
    t = np.asarray(t, np.float32)
    w2c = np.eye(4, dtype=np.float32)
    w2c[:3, :3] = R.T
    w2c[:3, 3] = t
    return Camera(w2c=jnp.asarray(w2c), K=jnp.asarray(K, jnp.float32),
                  width=int(width), height=int(height), znear=znear, zfar=zfar)
