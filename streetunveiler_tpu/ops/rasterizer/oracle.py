"""Pure-jnp 2DGS renderer — the correctness oracle.

Implements the full output contract of the reference CUDA rasterizer
(SURVEY.md §2.3 N1, §3.5) with no Pallas: vectorized over (surfel-chunk ×
pixel-block), scanned front-to-back. Runs on CPU, differentiable end-to-end
via JAX autodiff (this replaces the hand-written CUDA backward), and serves
as the ground truth the Pallas kernels are tested against (BASELINE config 1).

Deliberately mirrors the *scheduling structure* of the TPU kernel (chunked
prefix-scan blending with transmittance carry) so parity tests exercise the
same numerical path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .preprocess import preprocess_surfels
from .types import MEDIAN_T, RasterizeSettings, RenderOutput
from .blendmath import chunk_weights, map_depth, pair_alpha_depth


def _blend_block(px, py, sur_sorted, settings, chunk_surfels):
    """Composite all surfels (depth-sorted, padded) over one pixel block.

    px, py: [P]. Returns per-pixel accumulators.
    """
    n = sur_sorted.depth.shape[0]
    nchunk = n // chunk_surfels
    p = px.shape[0]
    c = sur_sorted.color.shape[-1]

    m_rows_all = tuple(sur_sorted.M[:, i, j] for i in range(3) for j in range(3))

    def chunk_arrays(start):
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, start, chunk_surfels, 0)
        return (tuple(sl(m) for m in m_rows_all),
                (sl(sur_sorted.center2d[:, 0]), sl(sur_sorted.center2d[:, 1])),
                sl(sur_sorted.depth), sl(sur_sorted.opacity),
                sl(sur_sorted.valid), sl(sur_sorted.color),
                sl(sur_sorted.normal))

    def body(carry, i):
        (t_carry, done, color, depth_a, normal_a, dist, a_sum, m1, m2, med) = carry
        m_rows, c2d, cdepth, opac, valid, col, nrm = chunk_arrays(i * chunk_surfels)

        alpha, t = pair_alpha_depth(m_rows, c2d, cdepth, opac, valid,
                                    px, py, settings.znear)
        w, t_excl, t_out, done_out = chunk_weights(alpha, t_carry, done,
                                                   t_eps=settings.t_eps)

        # HIGHEST precision: on TPU a DEFAULT-precision matmul is bf16
        # (~2⁻⁸ relative) — the oracle must stay f32-exact to be an
        # oracle (found round 4: 3e-3 "kernel" drift was the oracle's own
        # w.T @ col rounding on device; tools/verify_device_parity.py)
        hp = functools.partial(jnp.matmul,
                               precision=jax.lax.Precision.HIGHEST)
        color = color + hp(w.T, col)                   # [P,C]
        normal_a = normal_a + hp(w.T, nrm)             # [P,3]
        depth_a = depth_a + jnp.sum(w * t, axis=0)     # [P]

        m = map_depth(t, settings.znear, settings.zfar)
        wm = w * m
        wm2 = wm * m
        a_excl = a_sum[None, :] + jnp.cumsum(w, axis=0) - w
        m1_excl = m1[None, :] + jnp.cumsum(wm, axis=0) - wm
        m2_excl = m2[None, :] + jnp.cumsum(wm2, axis=0) - wm2
        dist = dist + jnp.sum(w * (m * m * a_excl + m2_excl - 2.0 * m * m1_excl),
                              axis=0)
        a_sum = a_sum + jnp.sum(w, axis=0)
        m1 = m1 + jnp.sum(wm, axis=0)
        m2 = m2 + jnp.sum(wm2, axis=0)

        # median depth: last composited surfel whose incoming T > 0.5
        cand = (w > 0.0) & (t_excl > MEDIAN_T)
        idx = jax.lax.broadcasted_iota(jnp.int32, w.shape, 0)
        best = jnp.max(jnp.where(cand, idx, -1), axis=0)          # [P]
        t_best = jnp.take_along_axis(t, jnp.maximum(best, 0)[None, :], axis=0)[0]
        med = jnp.where(best >= 0, jax.lax.stop_gradient(t_best), med)

        return (t_out, done_out, color, depth_a, normal_a, dist,
                a_sum, m1, m2, med), None

    init = (jnp.ones((p,)), jnp.zeros((p,), bool),
            jnp.zeros((p, c)), jnp.zeros((p,)), jnp.zeros((p, 3)),
            jnp.zeros((p,)), jnp.zeros((p,)), jnp.zeros((p,)), jnp.zeros((p,)),
            jnp.zeros((p,)))
    (t_f, _, color, depth_a, normal_a, dist, a_sum, _, _, med), _ = \
        jax.lax.scan(body, init, jnp.arange(nchunk))
    return t_f, color, depth_a, normal_a, dist, a_sum, med


def rasterize_oracle(means3d, scales, quats, opacities, colors, w2c, K,
                     settings: RasterizeSettings, bg=None,
                     chunk_surfels: int = 256,
                     pixel_block: int = 4096,
                     center2d_offset=None) -> RenderOutput:
    """Render. ``scales``/``opacities`` pre-activated; ``colors`` [N, C].

    bg: [C] background composited behind the splats (reference semantics:
    the rasterizer itself adds T_final·bg, incl. the per-class sky prior of
    the semantic passes, ``gaussian_renderer/__init__.py:347-358``).
    """
    h, w_img = settings.height, settings.width
    sur = preprocess_surfels(means3d, scales, quats, opacities, colors,
                             w2c, K, settings,
                             center2d_offset=center2d_offset)

    # Global front-to-back order by center view depth (reference sorts
    # duplicates by (tile, depth); depth order is the blend semantics).
    n = sur.depth.shape[0]
    order = jnp.argsort(jnp.where(sur.valid, sur.depth, jnp.inf))
    take = lambda a: jnp.take(a, order, axis=0)
    sur_sorted = jax.tree.map(take, sur)

    # Pad surfel dim to a chunk multiple with invalid entries.
    pad = (-n) % chunk_surfels
    if pad:
        padf = lambda a: jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
        sur_sorted = jax.tree.map(padf, sur_sorted)

    # Pixel grid, padded to block multiple, processed block-by-block.
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32) + 0.5,
                          jnp.arange(w_img, dtype=jnp.float32) + 0.5,
                          indexing="ij")
    px = xs.reshape(-1)
    py = ys.reshape(-1)
    total = h * w_img
    ppad = (-total) % pixel_block
    if ppad:
        px = jnp.concatenate([px, jnp.full((ppad,), -1e6)])
        py = jnp.concatenate([py, jnp.full((ppad,), -1e6)])
    nblocks = px.shape[0] // pixel_block

    fn = functools.partial(_blend_block, sur_sorted=sur_sorted,
                           settings=settings, chunk_surfels=chunk_surfels)
    t_f, color, depth_a, normal_a, dist, a_sum, med = jax.lax.map(
        lambda ab: fn(ab[0], ab[1]),
        (px.reshape(nblocks, pixel_block), py.reshape(nblocks, pixel_block)))

    unpad = lambda a: a.reshape((-1,) + a.shape[2:])[:total]
    t_f, color, depth_a, normal_a, dist, a_sum, med = map(
        unpad, (t_f, color, depth_a, normal_a, dist, a_sum, med))

    if bg is not None:
        color = color + t_f[:, None] * bg[None, :]

    c = colors.shape[-1]
    return RenderOutput(
        color=color.reshape(h, w_img, c),
        alpha=a_sum.reshape(h, w_img),
        expected_depth=depth_a.reshape(h, w_img),
        normal=normal_a.reshape(h, w_img, 3),
        median_depth=med.reshape(h, w_img),
        distortion=dist.reshape(h, w_img),
        radii=sur.radius,
    )
