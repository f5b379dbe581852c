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
from .types import FILTER_INV_SQUARE, RasterizeSettings


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
    cull: jnp.ndarray     # [N, 11] per-surfel conic-cull table (stop-grad):
    #                       9 affine k-coefficients (A=r1×r2, B=r2×r3,
    #                       C=r3×r1 so that k(p) = A + px·B + py·C), rho_max,
    #                       d2max — lets the binning drop AABB tiles the
    #                       contribution region misses (~17% of duplicates)


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
    # HIGHEST-precision 3-wide matmuls: on TPU a DEFAULT-precision matmul
    # is bf16 — geometry quantized at 2⁻⁸ relative (≈0.4 px of center
    # wobble at street depths; found round 4 when on-device FD showed the
    # loss INSENSITIVE to 3e-4 position moves). These contractions are
    # width-3, nowhere near the MXU's profitable regime, so exact f32
    # costs nothing.
    hp = lambda x, y: jnp.matmul(x, y, precision=jax.lax.Precision.HIGHEST)
    R = w2c[:3, :3]
    t = w2c[:3, 3]
    c_view = hp(means3d, R.T) + t                    # [N,3]
    depth = c_view[:, 2]

    rot = quat_to_rotmat(quats)                      # [N,3,3]
    s = scales * settings.scale_modifier
    a = hp(rot[:, :, 0], R.T) * s[:, 0:1]            # [N,3] view-space u-axis
    b = hp(rot[:, :, 1], R.T) * s[:, 1:2]            # [N,3] view-space v-axis
    n = hp(rot[:, :, 2], R.T)                        # [N,3] view-space normal

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
    col_a = hp(a, Kp.T)
    col_b = hp(b, Kp.T)
    col_c = jnp.stack([center2d[:, 0] * zsafe, center2d[:, 1] * zsafe,
                       depth], axis=-1)
    M = jnp.stack([col_a, col_b, col_c], axis=-1)    # [N,3,3]

    # Screen-space extent: EXACT projective bound of the contribution
    # region. A pair contributes iff α = opacity·exp(−ρ/2) ≥ 1/255, i.e.
    # ρ ≤ ρ_max = 2·ln(255·opacity); the region is the union of the ρ3d
    # set (the image of the uv-disc u²+v² ≤ ρ_max under the homography M
    # — a conic, NOT the linearized ellipse: for strongly tilted splats
    # the true footprint extends past the tangent-plane approximation)
    # and the low-pass disc (ρ2d = 2d² ≤ ρ_max). The conic's axis-aligned
    # extremes come from the dual conic D = M·diag(ρ,ρ,−1)·Mᵀ: a line
    # (1,0,−x) is tangent iff D00 − 2x·D02 + x²·D22 = 0, so
    # x ∈ D02/D22 ± √((D02/D22)² − D00/D22) (the 2DGS CUDA rasterizer's
    # compute_aabb; SURVEY.md §3.5). Using the exact bound makes tile
    # binning lossless: the tiled kernel and the untiled oracle produce
    # identical contributing sets (parity-tested, incl. off-center
    # splats in test_empty_tiles_zeroed_in_kernel).
    # The radius/extent only feeds culling and binning (index space) — it
    # is never differentiated, and sqrt-at-zero under the max would leak
    # inf·0 = NaN into the opacity/axis gradients of culled surfels.
    sg = jax.lax.stop_gradient
    op = opacities.reshape(-1)
    rho_max = 2.0 * jnp.log(jnp.maximum(255.0 * sg(op), 1e-6))
    rho_pos = jnp.maximum(rho_max, 1e-12)
    Msg = sg(M)

    def conic_interval(i):
        """Exact [lo, hi] of screen coord i over the ρ3d region, as an
        extent around center2d (widened to cover the asymmetry)."""
        ri, r3 = Msg[:, i, :], Msg[:, 2, :]
        dii = rho_pos * (ri[:, 0] ** 2 + ri[:, 1] ** 2) - ri[:, 2] ** 2
        di2 = (rho_pos * (ri[:, 0] * r3[:, 0] + ri[:, 1] * r3[:, 1])
               - ri[:, 2] * r3[:, 2])
        d22 = rho_pos * (r3[:, 0] ** 2 + r3[:, 1] ** 2) - r3[:, 2] ** 2
        bounded = d22 < -1e-12
        d22s = jnp.where(bounded, d22, -1.0)
        ce = di2 / d22s
        half = jnp.sqrt(jnp.maximum(ce * ce - dii / d22s, 0.0))
        # unbounded conic image (splat plane grazing the camera): cover
        # everything; the exact conic tile test in the binning prunes it
        return (jnp.where(bounded, ce, 0.0),
                jnp.where(bounded, half, 1e6))

    cex, ext3_x = conic_interval(0)
    cey, ext3_y = conic_interval(1)
    r_lowpass = jnp.sqrt(rho_pos * 0.5)
    c2dsg = sg(center2d)
    ext_x = jnp.maximum(jnp.abs(cex - c2dsg[:, 0]) + ext3_x,
                        r_lowpass) + 0.51
    ext_y = jnp.maximum(jnp.abs(cey - c2dsg[:, 1]) + ext3_y,
                        r_lowpass) + 0.51
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

    # Conic-cull table: the pair condition ρ3d ≤ ρ_max is pointwise
    # equivalent to the quadratic kx²+ky²−ρ_max·kz² ≤ 0 with
    # k(p) = A + px·B + py·C (blendmath's hoisted cross products). The
    # binning minimizes that quadratic over each candidate tile's pixel
    # rect and drops tiles where neither it nor the low-pass disc
    # (‖p−c‖² ≤ d2max ⟺ ρ2d ≤ ρ_max) can contribute.
    r1, r2, r3 = (sg(M[:, i, :]) for i in range(3))
    cull = jnp.concatenate([
        jnp.cross(r1, r2), jnp.cross(r2, r3), jnp.cross(r3, r1),
        sg(rho_max)[:, None],
        sg(rho_max)[:, None] * (1.0 / FILTER_INV_SQUARE)], axis=1)

    return SurfelScreen(M=M, center2d=center2d, depth=depth, normal=n,
                        opacity=op, color=colors,
                        radius=jnp.where(valid, radius, 0.0), ext=ext,
                        valid=valid, cull=cull)
