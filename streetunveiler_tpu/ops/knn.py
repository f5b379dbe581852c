"""Nearest-neighbor distances — TPU-native replacement for the CUDA
``simple-knn`` submodule (SURVEY.md §2.3 N2).

The reference uses ``dist3knn`` once at init (mean *squared* distance to the
3 nearest points, ``scene/gaussian_model.py:151``) and
``meanDistFromReferencePcd`` in the unveiling stage-B mask expansion. Both
are host-side computations; the primary path is the native C++ KD-tree
(``streetunveiler_tpu.native``, OpenMP-parallel — the reference's own KNN is
the native simple-knn CUDA submodule), with a scipy fallback when no
compiler is present and a blocked brute-force jnp variant for small
device-resident queries.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree

import jax
import jax.numpy as jnp

from .. import native


def mean_sq_dist_to_3nn(points: np.ndarray) -> np.ndarray:
    """Per-point mean squared distance to the 3 nearest neighbors
    (reference ``dist3knn``)."""
    points = np.asarray(points, np.float32)
    out = native.knn_mean_sq_dist3(points)
    if out is not None:
        return out
    tree = cKDTree(points)
    d, _ = tree.query(points, k=4)        # first neighbor is the point itself
    return np.mean(d[:, 1:] ** 2, axis=1).astype(np.float32)


def mean_dist_to_reference(query: np.ndarray, reference: np.ndarray,
                           k: int = 3) -> np.ndarray:
    """Per-query mean distance to the k nearest reference points
    (reference ``meanDistFromReferencePcd`` contract, used by
    ``2_generate_inpainted_mask.py:71-73``)."""
    out = native.knn_mean_dist_ref(np.asarray(query, np.float32),
                                   np.asarray(reference, np.float32), k)
    if out is not None:
        return out
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
