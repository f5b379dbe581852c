"""Sky / environment model — TPU-native ``scene/env_map.py:67-139``.

The reference composites a learned per-ray sky color behind the splats
(``train.py:114-115``). Its encoder stack (reference lines cited):

* direction → CUDA SH encoder, 4 bands = 16 features (``env_map.py:76``,
  submodule N3) → here: closed-form ``sh_basis`` (ops/sh.py), autodiff
  supplies input grads;
* camera origin → NeRF frequency embedding, 10 octaves with include_input
  = 63 features (``env_map.py:14-64``);
* camera origin → tiny-cuda-nn multiresolution hash grid, 16 levels × 2
  features, 2^16 table, base resolution 16 (``env_map.py:81-91``,
  submodule N4) → here: pure-jnp hash grid (hash → take → trilinear);
  the full table set is ~4 MB and lives comfortably in HBM/VMEM;
* concat → 3-layer width-64 ReLU MLP → sigmoid RGB (``env_map.py:93-97``),
  trained with its own Adam(1e-4) (``env_map.py:100``).

Ray generation reproduces the reference's convention exactly
(``env_map.py:113-126``): dirs = ((i−cx)/fx, −(j−cy)/fy, −1) rotated by
c2w — unnormalized, evaluated raw by the SH basis, like the reference.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sh import sh_basis

# spatial-hash primes (instant-ngp), pre-wrapped to int32
HASH_PRIMES = (np.int32(1), np.int32(2654435761 - 2**32), np.int32(805459861))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SkyParams:
    hash_tables: Any       # [L, 2^log2_size, F]
    mlp_w: Any             # tuple of weight matrices
    mlp_b: Any             # tuple of biases
    num_levels: int = dataclasses.field(default=16, metadata=dict(static=True))
    base_res: int = dataclasses.field(default=16, metadata=dict(static=True))
    growth: float = dataclasses.field(default=2.0, metadata=dict(static=True))
    sh_bands: int = dataclasses.field(default=3, metadata=dict(static=True))


def init_sky(key, num_levels=16, features_per_level=2, log2_size=16,
             base_res=16, growth=2.0, width=64, depth=3,
             sh_bands=3) -> SkyParams:
    """sh_bands=3 → 16 direction features (the reference's "degree 4")."""
    k1, *mk = jax.random.split(key, 2 + depth + 1)
    tables = jax.random.uniform(k1, (num_levels, 2 ** log2_size,
                                     features_per_level),
                                minval=-1e-4, maxval=1e-4)
    in_dim = (sh_bands + 1) ** 2 + num_levels * features_per_level + 63
    dims = [in_dim] + [width] * depth + [3]
    ws, bs = [], []
    for i, kk in enumerate(mk[:len(dims) - 1]):
        fan_in = dims[i]
        ws.append(jax.random.normal(kk, (dims[i], dims[i + 1]))
                  * np.sqrt(2.0 / fan_in))
        bs.append(jnp.zeros((dims[i + 1],)))
    return SkyParams(hash_tables=tables, mlp_w=tuple(ws), mlp_b=tuple(bs),
                     num_levels=num_levels, base_res=base_res, growth=growth,
                     sh_bands=sh_bands)


def freq_embed(x, num_freqs: int = 10):
    """NeRF positional encoding, log-sampled, include_input
    (reference ``get_embedder(10)``)."""
    freqs = 2.0 ** jnp.arange(num_freqs)
    ang = x[..., None, :] * freqs[:, None]                 # [..., F, 3]
    enc = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    return jnp.concatenate([x, enc.reshape(*x.shape[:-1], -1)], axis=-1)


def hash_encode(params: SkyParams, x):
    """Multiresolution hash grid lookup with trilinear interpolation.

    x: [..., 3] raw world coordinates (hashing wraps any range, like tcnn).
    Returns [..., L*F].
    """
    table_size = params.hash_tables.shape[1]
    feats = []
    for level in range(params.num_levels):
        res = params.base_res * (params.growth ** level)
        scaled = x * res
        base = jnp.floor(scaled)
        frac = scaled - base
        base = base.astype(jnp.int32)

        level_feats = 0.0
        for corner in range(8):
            off = jnp.array([(corner >> 0) & 1, (corner >> 1) & 1,
                             (corner >> 2) & 1], jnp.int32)
            c = base + off
            h = (c[..., 0] * HASH_PRIMES[0]
                 ^ c[..., 1] * HASH_PRIMES[1]
                 ^ c[..., 2] * HASH_PRIMES[2])
            idx = jnp.abs(h) % table_size
            w = jnp.prod(jnp.where(off > 0, frac, 1.0 - frac), axis=-1)
            level_feats = level_feats + w[..., None] * params.hash_tables[level][idx]
        feats.append(level_feats)
    return jnp.concatenate(feats, axis=-1)


def sky_forward(params: SkyParams, dirs, origins):
    """dirs/origins [..., 3] → RGB [..., 3] in (0,1)."""
    d_enc = sh_basis(dirs, params.sh_bands)
    h_enc = hash_encode(params, origins)
    p_enc = freq_embed(origins)
    h = jnp.concatenate([d_enc, h_enc, p_enc], axis=-1)
    for i, (w, b) in enumerate(zip(params.mlp_w, params.mlp_b)):
        h = h @ w + b
        if i < len(params.mlp_w) - 1:
            h = jax.nn.relu(h)
    return jax.nn.sigmoid(h)


def camera_rays(height: int, width: int, K, c2w):
    """Reference ray convention (``env_map.py:113-126``)."""
    i, j = jnp.meshgrid(jnp.arange(width, dtype=jnp.float32),
                        jnp.arange(height, dtype=jnp.float32), indexing="xy")
    dirs = jnp.stack([(i - K[0, 2]) / K[0, 0],
                      -(j - K[1, 2]) / K[1, 1],
                      -jnp.ones_like(i)], axis=-1)
    rays_d = jnp.einsum("hwj,ij->hwi", dirs, c2w[:3, :3])
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o, rays_d


def render_sky(params: SkyParams, height: int, width: int, K, c2w):
    """[H, W, 3] sky image for a camera (reference ``render_with_camera``)."""
    rays_o, rays_d = camera_rays(height, width, K, c2w)
    return sky_forward(params, rays_d, rays_o)
