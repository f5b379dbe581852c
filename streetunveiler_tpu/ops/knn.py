"""Nearest-neighbor distances — TPU-native replacement for the CUDA
``simple-knn`` submodule (SURVEY.md §2.3 N2).

The reference uses ``dist3knn`` once at init (mean *squared* distance to the
3 nearest points, ``scene/gaussian_model.py:151``) and
``meanDistFromReferencePcd`` in the unveiling stage-B mask expansion. Both
are throughput-uncritical, host-side computations, so the idiomatic
implementation is a KD-tree on CPU (numpy in, numpy out); a blocked
brute-force jnp fallback exists for small device-resident queries.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree

import jax
import jax.numpy as jnp


def mean_sq_dist_to_3nn(points: np.ndarray) -> np.ndarray:
    """Per-point mean squared distance to the 3 nearest neighbors
    (reference ``dist3knn``)."""
    points = np.asarray(points, np.float32)
    tree = cKDTree(points)
    d, _ = tree.query(points, k=4)        # first neighbor is the point itself
    return np.mean(d[:, 1:] ** 2, axis=1).astype(np.float32)


def mean_dist_to_reference(query: np.ndarray, reference: np.ndarray,
                           k: int = 3) -> np.ndarray:
    """Per-query mean distance to the k nearest reference points
    (reference ``meanDistFromReferencePcd`` contract, used by
    ``2_generate_inpainted_mask.py:71-73``)."""
    tree = cKDTree(np.asarray(reference, np.float32))
    d, _ = tree.query(np.asarray(query, np.float32), k=k)
    return np.mean(d, axis=1).astype(np.float32)


def mean_sq_dist_to_3nn_jnp(points, block: int = 1024):
    """Blocked brute-force on-device variant (small N only)."""
    n = points.shape[0]
    pad = (-n) % block
    pts = jnp.concatenate([points, jnp.full((pad, 3), 1e10)], 0) if pad else points

    def one_block(start):
        q = jax.lax.dynamic_slice_in_dim(pts, start, block, 0)
        d2 = jnp.sum((q[:, None, :] - pts[None, :n, :]) ** 2, -1)
        top = -jax.lax.top_k(-d2, 4)[0]      # 4 smallest (incl. self=0)
        return jnp.mean(top[:, 1:], axis=1)

    starts = jnp.arange(0, pts.shape[0], block)
    out = jax.lax.map(one_block, starts).reshape(-1)
    return out[:n]
