"""Union-find via pointer jumping — reference ``utils/disjoint_set_utils.py``.

The reference's ``DisjointSet.densify`` is iterated ``father = father[father]``
until fixpoint (:26-31) — already the parallel-friendly formulation; here it
is a ``lax.while_loop`` over a gather (log-depth path compression).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compress(parent):
    """Pointer-jump ``parent`` to fixpoint: every entry points at its root."""
    def cond(state):
        p, changed = state
        return changed

    def body(state):
        p, _ = state
        p2 = p[p]
        return p2, jnp.any(p2 != p)

    p, _ = jax.lax.while_loop(cond, body, (parent, jnp.bool_(True)))
    return p


def union_edges(n: int, edges_a, edges_b, valid):
    """Build a root labeling from an edge list (a_i ~ b_i where valid).

    Deterministic min-label propagation: iterate "each node adopts the
    minimum root among its neighbors" until fixpoint — O(E · log n) with
    fully vectorized scatter-min, the TPU-native replacement for the
    reference's sequential per-point union loop
    (``scene/gaussian_model.py:627-637``).
    """
    label = jnp.arange(n, dtype=jnp.int32)

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        label, _ = state
        la = label[edges_a]
        lb = label[edges_b]
        mn = jnp.where(valid, jnp.minimum(la, lb), jnp.int32(n))
        new = label.at[edges_a].min(mn, mode="drop")
        new = new.at[edges_b].min(mn, mode="drop")
        new = compress_once(new)
        return new, jnp.any(new != label)

    label, _ = jax.lax.while_loop(cond, body, (label, jnp.bool_(True)))
    return compress(label)


def compress_once(parent):
    return parent[parent]
