"""Per-surfel preprocess: world space → screen-space ray-intersection form.

This is the "preprocessCUDA" stage of the reference rasterizer re-derived for
JAX (SURVEY.md §3.5). A 2D surfel is the plane patch

    P(u, v) = p + s_u * t_u * u + s_v * t_v * v          (world space)

with tangent frame (t_u, t_v) from the quaternion and 2D scales (s_u, s_v)
(reference stores 2-axis log-scales, ``scene/gaussian_model.py:152``).

In view space the patch is ``a u + b v + c``. Composing with the pinhole
intrinsics K' gives a single 3x3 matrix M mapping splat coordinates
(u, v, 1) to homogeneous screen coordinates (x·z, y·z, z):

    M = K' @ [a | b | c],  K' = [[fx, 0, cx], [0, fy, cy], [0, 0, 1]]

Every per-pixel quantity the blend kernel needs is derivable from M's rows
plus the projected center and the view-space normal, so the packed surfel
record is what flows into the Pallas kernel and the oracle alike.

All math is autodiff-friendly; gradients to (means3d, scales, quats) flow
through this preprocess by construction, which replaces the hand-written
CUDA backward for the preprocess stage.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..transforms import quat_to_rotmat
from .types import RasterizeSettings


class SurfelScreen(NamedTuple):
    """Screen-space surfel representation consumed by blend kernels.

    All arrays have leading dim N (surfel count).
    """

    M: jnp.ndarray        # [N, 3, 3] splat(u,v,1) → homogeneous screen
    center2d: jnp.ndarray  # [N, 2] projected center (pixels)
    depth: jnp.ndarray    # [N] view-space center depth (sort key)
    normal: jnp.ndarray   # [N, 3] camera-facing view-space unit normal
    opacity: jnp.ndarray  # [N] activated opacity
    color: jnp.ndarray    # [N, C] per-view color (SH decoded or precomputed)
    radius: jnp.ndarray   # [N] conservative screen-space radius (pixels)
    ext: jnp.ndarray      # [N, 2] exact per-axis screen extents (pixels) —
    #                       rectangular AABB for tile binning (lossless, and
    #                       ~30% fewer tile duplicates than the square radius)
    valid: jnp.ndarray    # [N] bool — in frustum and non-degenerate


def preprocess_surfels(means3d, scales, quats, opacities, colors,
                       w2c, K, settings: RasterizeSettings,
                       center2d_offset=None) -> SurfelScreen:
    """Vectorized over N. ``scales``/``opacities`` are pre-activated.

    ``center2d_offset`` [N,2] is an always-zero tap: the projected center is
    reparameterized as ``project(mean) + offset`` and M's third column is
    rebuilt from it, so ∂L/∂offset is the exact screen-space position
    gradient — the densification statistic the reference extracts through
    its zero ``means2D`` proxy tensor (SURVEY.md §7.4,
    ``gaussian_renderer/__init__.py:28-33``).
    """
    R = w2c[:3, :3]
    t = w2c[:3, 3]
    c_view = means3d @ R.T + t                       # [N,3]
    depth = c_view[:, 2]

    rot = quat_to_rotmat(quats)                      # [N,3,3]
    s = scales * settings.scale_modifier
    a = (rot[:, :, 0] @ R.T) * s[:, 0:1]             # [N,3] view-space u-axis
    b = (rot[:, :, 1] @ R.T) * s[:, 1:2]             # [N,3] view-space v-axis
    n = rot[:, :, 2] @ R.T                           # [N,3] view-space normal

    # Flip normals toward the camera (ray dir ≈ center dir in view space).
    facing = jnp.sum(n * c_view, axis=-1)
    n = jnp.where(facing[:, None] > 0, -n, n)

    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    Kp = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    Kp = Kp.at[0, 0].set(fx).at[0, 2].set(cx).at[1, 1].set(fy).at[1, 2].set(cy)

    zsafe = jnp.where(jnp.abs(depth) < 1e-8, 1e-8, depth)
    center2d = jnp.stack([(fx * c_view[:, 0] + cx * zsafe) / zsafe,
                          (fy * c_view[:, 1] + cy * zsafe) / zsafe], axis=-1)
    if center2d_offset is not None:
        center2d = center2d + center2d_offset

    # M columns: K'a | K'b | (x2d·z, y2d·z, z) — the third column rebuilt
    # from the (tapped) screen center; identical values, exact gradients.
    col_a = a @ Kp.T
    col_b = b @ Kp.T
    col_c = jnp.stack([center2d[:, 0] * zsafe, center2d[:, 1] * zsafe,
                       depth], axis=-1)
    M = jnp.stack([col_a, col_b, col_c], axis=-1)    # [N,3,3]

    # Screen-space extent: exact sub-level-set bound of the contribution
    # region. A pair contributes iff α = opacity·exp(−ρ/2) ≥ 1/255, i.e.
    # ρ ≤ ρ_max = 2·ln(255·opacity). The region is the union of the ρ3d
    # ellipse (semi-extents k·‖projected axes‖ with k = √ρ_max) and the
    # low-pass disc (ρ2d = 2d² ≤ ρ_max → r = √(ρ_max/2)). Using the exact
    # bound makes tile-culling lossless: the tiled kernel and the untiled
    # oracle produce bitwise-identical contributing sets.
    inv_z = 1.0 / zsafe
    a2d_x = (a[:, 0] * fx - (center2d[:, 0] - cx) * a[:, 2]) * inv_z
    a2d_y = (a[:, 1] * fy - (center2d[:, 1] - cy) * a[:, 2]) * inv_z
    b2d_x = (b[:, 0] * fx - (center2d[:, 0] - cx) * b[:, 2]) * inv_z
    b2d_y = (b[:, 1] * fy - (center2d[:, 1] - cy) * b[:, 2]) * inv_z
    # The radius/extent only feeds culling and binning (index space) — it is
    # never differentiated, and sqrt-at-zero under the max would leak
    # inf·0 = NaN into the opacity/axis gradients of culled surfels.
    sg = jax.lax.stop_gradient
    op = opacities.reshape(-1)
    rho_max = 2.0 * jnp.log(jnp.maximum(255.0 * sg(op), 1e-6))
    k = jnp.sqrt(jnp.maximum(rho_max, 1e-12))
    r_lowpass = jnp.sqrt(jnp.maximum(rho_max, 1e-12) * 0.5)
    ext_x = sg(jnp.maximum(k * jnp.sqrt(a2d_x**2 + b2d_x**2), r_lowpass)) + 0.51
    ext_y = sg(jnp.maximum(k * jnp.sqrt(a2d_y**2 + b2d_y**2), r_lowpass)) + 0.51
    radius = jnp.maximum(ext_x, ext_y)
    visible = rho_max > 0.0  # opacity below 1/255 can never contribute

    in_depth = (depth > settings.znear) & (depth < settings.zfar)
    on_screen = ((center2d[:, 0] + ext_x > 0)
                 & (center2d[:, 0] - ext_x < settings.width)
                 & (center2d[:, 1] + ext_y > 0)
                 & (center2d[:, 1] - ext_y < settings.height))
    valid = in_depth & on_screen & jnp.isfinite(radius) & visible

    ext = jnp.stack([jnp.where(valid, ext_x, 0.0),
                     jnp.where(valid, ext_y, 0.0)], axis=-1)
    return SurfelScreen(M=M, center2d=center2d, depth=depth, normal=n,
                        opacity=op, color=colors,
                        radius=jnp.where(valid, radius, 0.0), ext=ext,
                        valid=valid)
