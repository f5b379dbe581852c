"""Small MLP library — reference ``utils/mlp_utils.py`` (DenseLayer/FCBlock).

The reference carries a 538-line torch MLP library used only by the sky
model. The pytree equivalent: ``init_mlp``/``apply_mlp`` with the same
knobs that matter (depth, width, skips, activation, output activation,
SIREN-style sine init option).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

_ACTS = {
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "softplus": jax.nn.softplus,
    "sine": jnp.sin,
    "none": lambda x: x,
}


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MLPParams:
    weights: Any   # tuple of [in, out]
    biases: Any    # tuple of [out]
    skips: tuple = dataclasses.field(default=(), metadata=dict(static=True))
    activation: str = dataclasses.field(default="relu",
                                        metadata=dict(static=True))
    output_activation: str = dataclasses.field(default="none",
                                               metadata=dict(static=True))


def init_mlp(key, in_dim: int, out_dim: int, depth: int = 3, width: int = 64,
             skips: Sequence[int] = (), activation: str = "relu",
             output_activation: str = "none") -> MLPParams:
    """FCBlock equivalent: depth hidden layers of ``width`` + output layer;
    ``skips``: hidden-layer indices whose input is concat(input, h)."""
    dims = [in_dim] + [width] * depth + [out_dim]
    ws, bs = [], []
    keys = jax.random.split(key, len(dims) - 1)
    for i, k in enumerate(keys):
        d_in = dims[i] + (in_dim if i in skips and i > 0 else 0)
        if activation == "sine" and i == 0:
            w = jax.random.uniform(k, (d_in, dims[i + 1]),
                                   minval=-1.0 / d_in, maxval=1.0 / d_in)
        elif activation == "sine":
            bound = np.sqrt(6.0 / d_in) / 30.0
            w = jax.random.uniform(k, (d_in, dims[i + 1]),
                                   minval=-bound, maxval=bound)
        else:
            w = jax.random.normal(k, (d_in, dims[i + 1])) * np.sqrt(
                2.0 / d_in)
        ws.append(w)
        bs.append(jnp.zeros((dims[i + 1],)))
    return MLPParams(weights=tuple(ws), biases=tuple(bs),
                     skips=tuple(skips), activation=activation,
                     output_activation=output_activation)


def apply_mlp(params: MLPParams, x):
    act = _ACTS[params.activation]
    out_act = _ACTS[params.output_activation]
    h = x
    n = len(params.weights)
    for i, (w, b) in enumerate(zip(params.weights, params.biases)):
        if i in params.skips and i > 0:
            h = jnp.concatenate([x, h], axis=-1)
        pre = h @ w + b
        if params.activation == "sine" and i < n - 1:
            pre = pre * 30.0
        h = out_act(pre) if i == n - 1 else act(pre)
    return h
