"""Pair (surfel × pixel) math shared by the oracle and the Pallas kernels.

Keeping the exact ray–surfel intersection and alpha formulas in one place
guarantees the Pallas kernel and the pure-jnp oracle implement the *same*
renderer semantics (the parity tests then only check scheduling, not math).

Everything here is written componentwise over [S, P] arrays (S surfels in a
chunk × P pixels in a tile) so the identical code runs inside a Pallas kernel
body (VPU elementwise ops, no [S, P, 3] intermediates).

Semantics pinned down (SURVEY.md §3.5; behavior of the reference CUDA
rasterizer as observed through its Python contract):
  * ray–plane intersection via the two homogeneous pixel planes
    h_u = r1 − px·r3, h_v = r2 − py·r3 and their cross product,
  * object-space Gaussian rho3d = u²+v² merged with the screen-space
    low-pass rho2d = 2·‖Δpix‖² by taking the min (anti-aliasing floor),
  * α = min(0.99, opacity·exp(−ρ/2)), contributions below 1/255 dropped,
  * front-to-back compositing with early termination at T < 1e-4.
"""

from __future__ import annotations

import jax.numpy as jnp

from .types import (ALPHA_EPS, ALPHA_MAX, FILTER_INV_SQUARE, T_EPS)


def pair_alpha_depth(m_rows, center2d, center_depth, opacity, valid,
                     px, py, znear):
    """Alpha and intersection depth for every (surfel, pixel) pair.

    m_rows: tuple of 9 arrays [S] — rows of M: (r1x, r1y, r1z, r2x, ..., r3z)
    center2d: (cx2d [S], cy2d [S]); center_depth, opacity, valid: [S]
    px, py: [P] pixel-center coordinates.

    Returns (alpha [S,P], t [S,P]) with alpha already zeroed for
    non-contributing pairs (α < 1/255, behind znear, culled surfel).

    Inputs may be 1-D ([S] / [P], oracle path) or pre-shaped 2-D
    ([S,1] / [1,P], Pallas kernel path — avoids relayouts on TPU).

    The homogeneous-plane formulation hu = r1 − px·r3, hv = r2 − py·r3,
    k = hu × hv is algebraically AFFINE in the pixel coordinates:

        k = (r1×r2) + px·(r2×r3) + py·(r3×r1)

    (the px·py term carries r3×r3 = 0), and the intersection-depth
    numerator r3·k collapses to the constant det(M) because
    r3·(r2×r3) = r3·(r3×r1) = 0. So the cross products are hoisted to
    per-SURFEL coefficients ([S,1]-shaped, 128 lanes per op inside the
    kernel) and the per-PAIR ([S,P]-shaped, 64k elements) work drops from
    ~45 VPU ops to ~27 — this function is the kernels' hot loop.
    """
    col = lambda m: m[:, None] if m.ndim == 1 else m         # → [S,1]
    row = lambda p: p[None, :] if p.ndim == 1 else p         # → [1,P]
    r1x, r1y, r1z, r2x, r2y, r2z, r3x, r3y, r3z = [col(m) for m in m_rows]
    pxb, pyb = row(px), row(py)
    center2d = (col(center2d[0]), col(center2d[1]))
    center_depth = col(center_depth)
    opacity = col(opacity)
    valid = col(valid)

    # --- per-surfel coefficients ([S,1] ops — cheap)
    ax = r1y * r2z - r1z * r2y          # A = r1 × r2
    ay = r1z * r2x - r1x * r2z
    az = r1x * r2y - r1y * r2x
    bx = r2y * r3z - r2z * r3y          # B = r2 × r3
    by = r2z * r3x - r2x * r3z
    bz = r2x * r3y - r2y * r3x
    cx = r3y * r1z - r3z * r1y          # C = r3 × r1
    cy = r3z * r1x - r3x * r1z
    cz = r3x * r1y - r3y * r1x
    det_m = r3x * ax + r3y * ay + r3z * az   # r3·(r1×r2) = det(M)

    # --- per-pair math ([S,P] ops — the hot part)
    kx = ax + pxb * bx + pyb * cx
    ky = ay + pxb * by + pyb * cy
    kz = az + pxb * bz + pyb * cz
    kz_safe = jnp.where(jnp.abs(kz) < 1e-12, 1e-12, kz)
    rcp = 1.0 / kz_safe

    rho3d = (kx * kx + ky * ky) * (rcp * rcp)
    t_isect = det_m * rcp

    dx = pxb - center2d[0]
    dy = pyb - center2d[1]
    rho2d = FILTER_INV_SQUARE * (dx * dx + dy * dy)

    use2d = rho3d > rho2d
    rho = jnp.where(use2d, rho2d, rho3d)
    t = jnp.where(use2d, center_depth * jnp.ones_like(t_isect), t_isect)

    g = jnp.exp(-0.5 * rho)
    alpha = jnp.minimum(ALPHA_MAX, opacity * g)
    contrib = (alpha >= ALPHA_EPS) & (t >= znear) & valid
    return jnp.where(contrib, alpha, 0.0), t


def map_depth(t, znear, zfar):
    """Depth → [0,1] NDC-style mapping used by the distortion accumulator."""
    tsafe = jnp.maximum(t, 1e-6)
    return (zfar / (zfar - znear)) * (1.0 - znear / tsafe)


def chunk_weights(alpha, t_carry, done_carry, t_eps=T_EPS):
    """Compositing weights for one depth-sorted chunk.

    alpha: [S, P] (zeroed for non-contributing pairs); t_carry: [P] incoming
    transmittance; done_carry: [P] bool — pixel already early-terminated.

    Returns (w [S,P], t_excl [S,P], t_out [P], done_out [P]) where ``w`` is
    the blending weight α·T_excl with the reference's early-termination rule:
    a surfel whose post-blend transmittance would drop below ``t_eps`` is
    *not* composited and freezes the pixel (CUDA's loop break; 0 disables).
    """
    one_minus = 1.0 - alpha
    cum_incl = jnp.cumprod(one_minus, axis=0)
    t_excl = t_carry[None, :] * jnp.concatenate(
        [jnp.ones_like(cum_incl[:1]), cum_incl[:-1]], axis=0)
    t_after = t_carry[None, :] * cum_incl

    trigger = (alpha > 0.0) & (t_after < t_eps)
    dead = jnp.logical_or(jnp.cumsum(trigger.astype(jnp.int32), axis=0) > 0,
                          done_carry[None, :])
    keep = (alpha > 0.0) & jnp.logical_not(dead)

    w = jnp.where(keep, alpha * t_excl, 0.0)
    kept_factor = jnp.where(keep, one_minus, 1.0)
    t_out = t_carry * jnp.prod(kept_factor, axis=0)
    done_out = jnp.logical_or(done_carry, jnp.any(trigger, axis=0))
    return w, t_excl, t_out, done_out
