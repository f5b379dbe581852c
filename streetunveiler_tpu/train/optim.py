"""Per-leaf-LR Adam for surfel parameter pytrees.

The reference uses one torch.optim.Adam with per-group LRs and eps=1e-15
(``scene/gaussian_model.py:171-186``), and performs optimizer-state surgery
on densify/prune. Here the optimizer is ~40 lines of pure pytree code, so
"surgery" is just gathering/writing moment arrays with the same index maps
as the parameters (SURVEY.md §7.1.1) — no object identity involved.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    step: jnp.ndarray
    mu: any       # first-moment pytree (same structure as params)
    nu: any       # second-moment pytree


def adam_init(params) -> AdamState:
    z = lambda p: jnp.zeros_like(p)
    return AdamState(step=jnp.zeros((), jnp.int32),
                     mu=jax.tree.map(z, params), nu=jax.tree.map(z, params))


def adam_update(grads, state: AdamState, params, lrs,
                b1: float = 0.9, b2: float = 0.999, eps: float = 1e-15):
    """One Adam step. ``lrs``: pytree of scalars matching ``params``
    structure (entries may be traced, e.g. the xyz schedule)."""
    step = state.step + 1
    bc1 = 1.0 - b1 ** step.astype(jnp.float32)
    bc2 = 1.0 - b2 ** step.astype(jnp.float32)

    def upd(p, g, m, v, lr):
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mhat = m / bc1
        vhat = v / bc2
        return p - lr * mhat / (jnp.sqrt(vhat) + eps), m, v

    out = jax.tree.map(upd, params, grads, state.mu, state.nu, lrs)
    is_triple = lambda x: isinstance(x, tuple) and len(x) == 3
    new_p = jax.tree.map(lambda t: t[0], out, is_leaf=is_triple)
    new_m = jax.tree.map(lambda t: t[1], out, is_leaf=is_triple)
    new_v = jax.tree.map(lambda t: t[2], out, is_leaf=is_triple)
    return new_p, AdamState(step=step, mu=new_m, nu=new_v)
