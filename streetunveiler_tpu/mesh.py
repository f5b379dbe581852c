"""Mesh extraction driver — reference ``utils/mesh_utils.py``
``GaussianExtractor`` (render every view, TSDF-fuse, extract, clean).

``extract_mesh`` renders depth/color for the given cameras through the
Pallas renderer, fuses on device, extracts with surface nets, and
optionally keeps only the largest connected components (the reference's
post_process_mesh cluster filter, ``mesh_utils.py:23-44``).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .ops.tsdf import integrate_tsdf, make_volume, save_mesh_ply, surface_nets
from .renderer import render


def estimate_bounds(state, margin: float = 0.05):
    xyz = np.asarray(state.params.xyz)[np.asarray(state.alive)]
    lo = xyz.min(0)
    hi = xyz.max(0)
    pad = (hi - lo) * margin + 1e-3
    return lo - pad, hi + pad


def extract_mesh(cameras, state, bg=None, voxel_size: float = 0.05,
                 sdf_trunc: float | None = None, depth_trunc: float = 100.0,
                 bounds=None, alpha_thresh: float = 0.5,
                 min_cluster_frac: float = 0.02, depth_ratio: float = 0.0,
                 duplicate_capacity: int | None = None):
    """TSDF-fuse the views and return (verts, faces, colors).

    Pass a measured ``duplicate_capacity`` (renderer.py
    ``measure_duplicate_capacity``) for trained states — a truncated
    duplicate stream drops the farthest surfels and punches depth holes
    into the fusion."""
    bg = jnp.zeros(3) if bg is None else jnp.asarray(bg)
    if bounds is None:
        lo, hi = estimate_bounds(state)
    else:
        lo, hi = bounds
    if sdf_trunc is None:
        sdf_trunc = 5.0 * voxel_size
    vol = make_volume(lo, hi - lo, voxel_size)

    for cam in cameras:
        res = render(cam, state, bg, depth_ratio=depth_ratio,
                     duplicate_capacity=duplicate_capacity)
        vol = integrate_tsdf(vol, res.surf_depth, res.render, cam.w2c,
                             cam.K, trunc=sdf_trunc,
                             depth_trunc=depth_trunc,
                             alpha=res.rend_alpha,
                             alpha_thresh=alpha_thresh)

    verts, faces, colors = surface_nets(
        np.asarray(vol.tsdf), np.asarray(vol.weight), np.asarray(vol.origin),
        vol.voxel_size, color=np.asarray(vol.color))
    if faces.shape[0] and min_cluster_frac > 0:
        verts, faces, colors = keep_large_clusters(verts, faces, colors,
                                                   min_cluster_frac)
    return verts, faces, colors


def keep_large_clusters(verts, faces, colors, min_frac: float):
    """Drop small connected components (reference post_process_mesh)."""
    n = verts.shape[0]
    parent = np.arange(n)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for f in faces:
        r0 = find(f[0])
        for v in f[1:]:
            rv = find(v)
            if rv != r0:
                parent[max(r0, rv)] = min(r0, rv)
                r0 = min(r0, rv)
    roots = np.array([find(i) for i in range(n)])
    uniq, counts = np.unique(roots, return_counts=True)
    keep_roots = set(uniq[counts >= min_frac * n])
    vkeep = np.isin(roots, list(keep_roots))
    remap = -np.ones(n, np.int64)
    remap[vkeep] = np.arange(vkeep.sum())
    fkeep = vkeep[faces].all(axis=1)
    new_faces = remap[faces[fkeep]]
    return (verts[vkeep], new_faces,
            None if colors is None else colors[vkeep])


__all__ = ["extract_mesh", "keep_large_clusters", "save_mesh_ply"]
