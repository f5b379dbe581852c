"""Real spherical harmonics, degrees 0–4, in pure jnp.

TPU-native replacement for two reference components at once:

* ``utils/sh_utils.py:63-110`` — per-surfel view-dependent color decode
  (``eval_sh``), used by the rasterizer preprocess, and
* the CUDA ``sh_encoder`` submodule (SURVEY.md §2.3 N3,
  ``utils/sh_encoder_utils.py:14-55``) — the directional encoding of the sky
  model becomes ``sh_basis(dirs, degree)``; JAX autodiff supplies the input
  gradients the CUDA backward computed by hand.

Uses the standard real-SH constants (the same hard-coded polynomial basis the
reference uses). Everything is vmap/jit/grad friendly with static degree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
      -1.0925484305920792, 0.5462742152960396)
C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
      0.3731763325901154, -0.4570457994644658, 1.445305721320277,
      -0.5900435899266435)
C4 = (2.5033429417967046, -1.7701307697799304, 0.9461746957575601,
      -0.6690465435572892, 0.10578554691520431, -0.6690465435572892,
      0.47308734787878004, -1.7701307697799304, 0.6258357354491761)


def num_sh_bases(degree: int) -> int:
    return (degree + 1) ** 2


def sh_basis(dirs, degree: int):
    """Real SH basis values for unit directions.

    dirs: [..., 3] (assumed normalized). Returns [..., (degree+1)**2].
    ``degree`` is the max band (inclusive), so degree=3 → 16 features — the
    same contract as the CUDA sh_encoder with ``degree=4`` meaning 4 bands
    (reference ``scene/env_map.py:76`` requests 16 output features).
    """
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    out = [jnp.full_like(x, C0)]
    if degree >= 1:
        out += [-C1 * y, C1 * z, -C1 * x]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            C2[0] * xy,
            C2[1] * yz,
            C2[2] * (2.0 * zz - xx - yy),
            C2[3] * xz,
            C2[4] * (xx - yy),
        ]
    if degree >= 3:
        out += [
            C3[0] * y * (3 * xx - yy),
            C3[1] * xy * z,
            C3[2] * y * (4 * zz - xx - yy),
            C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
            C3[4] * x * (4 * zz - xx - yy),
            C3[5] * z * (xx - yy),
            C3[6] * x * (xx - 3 * yy),
        ]
    if degree >= 4:
        out += [
            C4[0] * xy * (xx - yy),
            C4[1] * yz * (3 * xx - yy),
            C4[2] * xy * (7 * zz - 1),
            C4[3] * yz * (7 * zz - 3),
            C4[4] * (zz * (35 * zz - 30) + 3),
            C4[5] * xz * (7 * zz - 3),
            C4[6] * (xx - yy) * (7 * zz - 1),
            C4[7] * xz * (xx - 3 * yy),
            C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy)),
        ]
    return jnp.stack(out, axis=-1)


def eval_sh(degree: int, sh_coeffs, dirs):
    """Evaluate SH-encoded color along directions.

    sh_coeffs: [..., K, C] with K >= (degree+1)**2; dirs: [..., 3] normalized.
    Returns [..., C]. Mirrors reference ``eval_sh`` semantics (no +0.5 shift —
    callers add it, cf. ``gaussian_renderer/__init__.py``'s precomputed-color
    path and the rasterizer's internal clamp).
    """
    basis = sh_basis(dirs, degree)  # [..., B]
    k = num_sh_bases(degree)
    # HIGHEST: a DEFAULT-precision einsum is bf16 on TPU — surfel colors
    # quantized at 2⁻⁸ (0.4%); this contraction is K ≤ 16 wide, exact
    # f32 costs nothing (found round 4, tools/verify_device_parity.py)
    return jnp.einsum("...k,...kc->...c", basis, sh_coeffs[..., :k, :],
                      precision=jax.lax.Precision.HIGHEST)


def rgb_to_sh(rgb):
    """RGB in [0,1] → DC SH coefficient (reference ``RGB2SH``)."""
    return (rgb - 0.5) / C0


def sh_to_rgb(sh_dc):
    return sh_dc * C0 + 0.5
