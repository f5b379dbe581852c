"""Masked delta re-optimization — the reference ``MaskGaussianModel``.

The reference devotes 636 lines (``scene/mask_gaussian.py:32-636``) to a
frozen-base + trainable-delta model because torch optimizers key on
parameter objects. Functionally it is one equation (``:153-156``):

    effective_param = stop_gradient(base) + delta * mask

with per-attribute freeze bits (``:29-30, :78-100``) and a per-surfel
trainable mask (``set_nograd``/``reset_mask`` :102-122). Here that's a
~40-line pure wrapper (SURVEY.md §7.1.3): deltas are a ``SurfelParams``
pytree of zeros, and the stage-C optimizer steps only the deltas.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from .gaussians import SurfelParams, SurfelState


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DeltaConfig:
    """Which attributes train (reference freeze bits, mask_gaussian.py:29-30:
    stage C trains xyz/features/opacity/scaling/rotation of masked surfels)."""
    xyz: bool = dataclasses.field(default=True, metadata=dict(static=True))
    features: bool = dataclasses.field(default=True, metadata=dict(static=True))
    scaling: bool = dataclasses.field(default=True, metadata=dict(static=True))
    rotation: bool = dataclasses.field(default=True, metadata=dict(static=True))
    opacity: bool = dataclasses.field(default=True, metadata=dict(static=True))


def zero_deltas(params: SurfelParams) -> SurfelParams:
    return jax.tree.map(jnp.zeros_like, params)


def apply_deltas(base: SurfelState, deltas: SurfelParams, train_mask,
                 cfg: DeltaConfig = DeltaConfig()) -> SurfelState:
    """Effective state = frozen base + masked deltas.

    train_mask [C] bool — the reference's ``mask`` (1 = re-optimizable;
    surfels outside stay bit-exact at their base values).
    """
    b = jax.lax.stop_gradient(base.params)
    m = train_mask.astype(jnp.float32)

    def mix(enabled, bleaf, dleaf):
        if not enabled:
            return bleaf
        mm = m.reshape((-1,) + (1,) * (bleaf.ndim - 1))
        return bleaf + dleaf * mm

    params = SurfelParams(
        xyz=mix(cfg.xyz, b.xyz, deltas.xyz),
        features_dc=mix(cfg.features, b.features_dc, deltas.features_dc),
        features_rest=mix(cfg.features, b.features_rest, deltas.features_rest),
        scaling=mix(cfg.scaling, b.scaling, deltas.scaling),
        rotation=mix(cfg.rotation, b.rotation, deltas.rotation),
        opacity=mix(cfg.opacity, b.opacity, deltas.opacity),
    )
    return dataclasses.replace(base, params=params)
