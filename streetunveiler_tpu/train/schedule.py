"""Learning-rate schedules (reference ``utils/general_utils.py:29-61``)."""

from __future__ import annotations

import jax.numpy as jnp


def expon_lr(step, lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0,
             max_steps=1_000_000):
    """Log-linear interpolation with optional cosine delay ramp.

    Matches the reference ``get_expon_lr_func`` (itself from Plenoxels).
    ``lr_init``/``lr_final`` may be traced (the xyz LR scales with the
    scene extent) and must be positive.
    """
    step = jnp.asarray(step, jnp.float32)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1))
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0, 1)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    return delay_rate * log_lerp
