"""Depth map → pseudo surface normal (reference ``utils/point_utils.py``).

Back-projects the depth map through K⁻¹ into *view space* and takes the
cross product of screen-space finite differences. The reference computes
this in world space; a rotation applied to both normals cancels in the
``1 − n·n`` regularizer, so view space is used consistently here (the
renderer returns world-space copies for visualization parity).
"""

from __future__ import annotations

import jax.numpy as jnp


def depth_to_points_view(depth, K):
    """depth [H,W] → view-space points [H,W,3]."""
    h, w = depth.shape
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32) + 0.5,
                          jnp.arange(w, dtype=jnp.float32) + 0.5,
                          indexing="ij")
    x = (xs - cx) / fx
    y = (ys - cy) / fy
    return jnp.stack([x * depth, y * depth, depth], axis=-1)


def depth_to_normal(depth, K):
    """depth [H,W] → unit normals [H,W,3] (zero on the 1px border)."""
    pts = depth_to_points_view(depth, K)
    d_horiz = pts[1:-1, 2:] - pts[1:-1, :-2]
    d_vert = pts[2:, 1:-1] - pts[:-2, 1:-1]
    # cross(vertical, horizontal): camera-facing (−z) for front-parallel
    # surfaces, matching the rasterizer's flipped surfel normals
    # (reference point_utils.py:26-37 does the same in world space).
    n = jnp.cross(d_vert, d_horiz)
    # NaN-safe normalize: linalg.norm has a 0/0 Jacobian at zero vectors
    # (empty pixels), which poisons gradients even under a zero loss weight.
    n = n / jnp.sqrt(jnp.maximum(jnp.sum(n * n, axis=-1, keepdims=True),
                                 1e-12))
    out = jnp.zeros_like(pts)
    return out.at[1:-1, 1:-1].set(n)
