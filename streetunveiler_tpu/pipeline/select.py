"""Stage A/B1 — instance selection (reference ``inpainting_pipeline/1_selection``
and ``2_condition_preparation/1_select_instance.py``).

Clusters surfels of a target semantic class into spatial instances and
turns chosen instance ids into removal masks. The reference does this with
an O(N²) GPU loop over points (``scene/gaussian_model.py:617-651``,
SURVEY.md §7.3.6); here neighbor pairs come from a KD-tree (offline stage,
CPU) feeding a vectorized union-find, so it scales past 10⁶ surfels.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np
from scipy.spatial import cKDTree

from .. import native
from ..models.gaussians import SurfelState

CLUSTER_THRESHOLD = 7e-2     # reference 1_instance_visualization.py:28
MIN_SOLID_CLUSTER = 50       # clusters below this are not offered (:106)


class Clustering(NamedTuple):
    labels: np.ndarray        # [C] instance id, -1 = not in target class
    cluster_ids: np.ndarray   # ids sorted by descending size
    cluster_sizes: np.ndarray


def auto_cluster_threshold(xyz: np.ndarray, factor: float = 3.0) -> float:
    """Data-driven clustering radius: ``factor`` × median 1-NN distance of
    the class points (the reference's fixed 7e-2 assumes its normalized
    Waymo scene units and fragments on other scales)."""
    if xyz.shape[0] < 2:
        return CLUSTER_THRESHOLD
    tree = cKDTree(xyz)
    d, _ = tree.query(xyz[:: max(1, xyz.shape[0] // 5000)], k=2)
    return float(max(factor * np.median(d[:, 1]), CLUSTER_THRESHOLD))


def cluster_semantic_instance(state: SurfelState, class_bits: int,
                              threshold: float | None = CLUSTER_THRESHOLD
                              ) -> Clustering:
    """Connected components of the τ-ball graph over surfels of a class
    (reference ``cluster_instance_with_mask``). threshold=None → derive
    from the class points' nearest-neighbor statistics."""
    alive = np.asarray(state.alive)
    in_class = np.asarray(state.semantic_mask(class_bits)) & alive
    xyz = np.asarray(state.params.xyz)[in_class]
    idx = np.where(in_class)[0]

    labels = np.full(alive.shape[0], -1, np.int64)
    if xyz.shape[0] == 0:
        return Clustering(labels, np.array([], np.int64),
                          np.array([], np.int64))
    if threshold is None:
        threshold = auto_cluster_threshold(xyz)

    roots = native.cluster_radius(xyz.astype(np.float32), float(threshold))
    if roots is None:
        tree = cKDTree(xyz)
        pairs = tree.query_pairs(threshold, output_type="ndarray")

        parent = np.arange(xyz.shape[0])

        def find(a):
            root = a
            while parent[root] != root:
                root = parent[root]
            while parent[a] != root:
                parent[a], a = root, parent[a]
            return root

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        roots = np.array([find(i) for i in range(xyz.shape[0])])

    uniq, inv, counts = np.unique(roots, return_inverse=True,
                                  return_counts=True)
    labels[idx] = inv
    order = np.argsort(-counts)
    return Clustering(labels=labels, cluster_ids=order.astype(np.int64),
                      cluster_sizes=counts[order])


def solid_cluster_mask(clustering: Clustering,
                       min_size: int = MIN_SOLID_CLUSTER) -> np.ndarray:
    """[C] bool — surfels in clusters of ≥ min_size (reference
    ``solid_cluster_mask.pt``)."""
    solid = set(int(c) for c, s in zip(clustering.cluster_ids,
                                       clustering.cluster_sizes)
                if s >= min_size)
    return np.isin(clustering.labels,
                   np.array(sorted(solid), np.int64)) & (
        clustering.labels >= 0)


def render_instance_previews(scene, state: SurfelState,
                             clustering: Clustering, workspace: str,
                             bg=None, min_size: int = MIN_SOLID_CLUSTER,
                             close_depth: float = 4.0,
                             duplicate_capacity=None) -> np.ndarray:
    """Per-instance preview renders for human id selection (reference
    ``1_instance_visualization.py:79-156``).

    For each solid cluster: pick the first frame seeing >90% of its
    surfels at mean depth < ``close_depth`` (fallback: first frame seeing
    >50%; reference :86-99), render ONLY the cluster's surfels, and save
    ``instance_render/<cluster_id>.png``. Also writes
    ``solid_cluster_mask.npy`` and ``solid_cluster.ply`` (the solid
    surfels as an RGB cloud, reference ``save_rgb_ply`` :155).
    Returns the solid-cluster mask."""
    import jax
    import jax.numpy as jnp
    from ..renderer import render

    bg = jnp.zeros(3) if bg is None else jnp.asarray(bg)
    render_dir = os.path.join(workspace, "instance_render")
    os.makedirs(render_dir, exist_ok=True)
    xyz_all = jnp.asarray(state.params.xyz)
    solid = np.zeros(clustering.labels.shape[0], bool)

    # frame-selection stats for ALL frames in ONE jitted call per cluster
    # (the per-(frame, cluster) pcd_in_frame_mask loop was O(F·C) device
    # round-trips); same frustum semantics as scene.pcd_in_frame_mask
    cams = scene.train_cameras
    w2c_all = jnp.stack([jnp.asarray(c.w2c) for c in cams])
    k_all = jnp.stack([jnp.asarray(c.K) for c in cams])
    wh_all = jnp.asarray([[c.width, c.height] for c in cams], jnp.float32)

    @jax.jit
    def frame_stats(weights):
        def per_frame(w2c, K, wh):
            v = xyz_all @ w2c[:3, :3].T + w2c[:3, 3]
            z = v[:, 2]
            zs = jnp.maximum(z, 1e-8)
            x = v[:, 0] / zs * K[0, 0] + K[0, 2]
            y = v[:, 1] / zs * K[1, 1] + K[1, 2]
            inside = ((z > 0.01) & (x >= 0) & (x < wh[0])
                      & (y >= 0) & (y < wh[1]))
            wi = weights * inside
            cnt = jnp.sum(wi)
            frac = cnt / jnp.maximum(jnp.sum(weights), 1.0)
            mdepth = jnp.sum(wi * z) / jnp.maximum(cnt, 1e-6)
            return frac, mdepth
        return jax.vmap(per_frame)(w2c_all, k_all, wh_all)

    for cid, size in zip(clustering.cluster_ids, clustering.cluster_sizes):
        if size < min_size:
            break   # sizes are sorted descending
        cmask = clustering.labels == int(cid)
        solid |= cmask

        fracs, depths = map(np.asarray,
                            frame_stats(jnp.asarray(cmask, jnp.float32)))
        # first frame seeing >90% of the cluster close up; fallback >50%
        # (reference 1_instance_visualization.py:86-99)
        good = np.where((fracs > 0.9) & (depths < close_depth))[0]
        if good.size:
            pick = int(good[0])
        else:
            fallback = np.where(fracs > 0.5)[0]
            pick = int(fallback[0]) if fallback.size else -1
        if pick < 0:
            continue
        res = render(scene.train_cameras[pick], state, bg,
                     opacity_mask=jnp.asarray(cmask),
                     duplicate_capacity=duplicate_capacity)
        _save_png(os.path.join(render_dir, f"{int(cid):05d}.png"),
                  np.asarray(res.render))

    np.save(os.path.join(workspace, "solid_cluster_mask.npy"), solid)
    _save_rgb_ply(os.path.join(workspace, "solid_cluster.ply"),
                  np.asarray(state.params.xyz)[solid],
                  _dc_rgb(state)[solid])
    return solid


def _save_png(path, img):
    from PIL import Image
    Image.fromarray((np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
                    ).save(path)


def _dc_rgb(state: SurfelState) -> np.ndarray:
    """Approximate per-surfel RGB from the SH DC band (C0·dc + 0.5)."""
    dc = np.asarray(state.params.features_dc).reshape(
        state.capacity, -1)[:, :3]
    return np.clip(0.28209479177387814 * dc + 0.5, 0, 1)


def _save_rgb_ply(path: str, xyz: np.ndarray, rgb: np.ndarray) -> None:
    """Minimal ASCII xyz+rgb PLY (the reference's ``save_rgb_ply``)."""
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n"
                f"element vertex {xyz.shape[0]}\n"
                "property float x\nproperty float y\nproperty float z\n"
                "property uchar red\nproperty uchar green\n"
                "property uchar blue\nend_header\n")
        for p, c in zip(xyz, (rgb * 255).astype(np.uint8)):
            f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                    f"{c[0]} {c[1]} {c[2]}\n")


def removal_mask_for_instances(clustering: Clustering, instance_ids,
                               all_solid: bool = False,
                               min_size: int = MIN_SOLID_CLUSTER
                               ) -> np.ndarray:
    """Reference ``generate_pcd_valid_mask`` (1_select_instance.py:25-77):
    chosen instance ids — or every solid cluster with ``--all`` — become
    the ``removed_pcd_mask``."""
    if all_solid:
        return solid_cluster_mask(clustering, min_size)
    sel = np.asarray(list(instance_ids), np.int64)
    return np.isin(clustering.labels, sel) & (clustering.labels >= 0)
