"""Semantic point clouds — reference ``utils/pcd_utils.py``.

``voxel_down_sample`` reproduces the reference semantics (:73-132): voxel
mean for xyz/rgb, per-voxel *majority vote* for the semantic label, and
voxels whose majority is below an agreement ratio (default 0.8) are
dropped entirely. The reference runs a Python loop per voxel (flagged as a
hotspot in SURVEY.md §7.3.6); this is fully vectorized with one sort.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class SemanticPointCloud(NamedTuple):
    points: np.ndarray     # [N, 3] float32
    colors: np.ndarray     # [N, 3] float32 in [0,1]
    semantics: np.ndarray  # [N] int32

    def concat(self, other: "SemanticPointCloud") -> "SemanticPointCloud":
        return SemanticPointCloud(
            np.concatenate([self.points, other.points]),
            np.concatenate([self.colors, other.colors]),
            np.concatenate([self.semantics, other.semantics]))


def voxel_down_sample(pc: SemanticPointCloud, voxel_size: float,
                      agreement: float = 0.8) -> SemanticPointCloud:
    """Voxel-mean downsample with semantic majority vote."""
    pts = np.asarray(pc.points, np.float64)
    if pts.shape[0] == 0:
        return pc

    from .. import native
    nat = native.voxel_downsample(pc.points, pc.colors, pc.semantics,
                                  float(voxel_size), float(agreement))
    if nat is not None:
        return SemanticPointCloud(points=nat[0], colors=nat[1],
                                  semantics=nat[2])
    keys = np.floor(pts / voxel_size).astype(np.int64)
    lo = keys.min(axis=0)
    keys = keys - lo
    dims = keys.max(axis=0) + 1
    flat = (keys[:, 0] * dims[1] + keys[:, 1]) * dims[2] + keys[:, 2]

    order = np.argsort(flat, kind="stable")
    flat_s = flat[order]
    starts = np.flatnonzero(np.r_[True, flat_s[1:] != flat_s[:-1]])
    counts = np.diff(np.r_[starts, flat_s.size])

    group = np.repeat(np.arange(starts.size), counts)
    n_vox = starts.size

    def group_mean(vals):
        acc = np.zeros((n_vox, vals.shape[1]), np.float64)
        np.add.at(acc, group, vals[order])
        return acc / counts[:, None]

    mean_xyz = group_mean(pts)
    mean_rgb = group_mean(np.asarray(pc.colors, np.float64))

    # majority vote: count (voxel, class) pairs via a second sort-free pass
    sems = np.asarray(pc.semantics, np.int64)[order]
    n_classes = int(sems.max()) + 1 if sems.size else 1
    votes = np.zeros((n_vox, n_classes), np.int64)
    np.add.at(votes, (group, sems), 1)
    best = votes.argmax(axis=1)
    best_count = votes[np.arange(n_vox), best]
    keep = best_count >= agreement * counts

    return SemanticPointCloud(
        points=mean_xyz[keep].astype(np.float32),
        colors=mean_rgb[keep].astype(np.float32),
        semantics=best[keep].astype(np.int32))
