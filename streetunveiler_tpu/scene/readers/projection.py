"""Point-cloud↔frame projection helpers — reference
``scene/dataset_readers/projection_utils.py``.

``cull_mask_in_frame`` (:17-35): frustum membership + pixel coords of a
cloud in a camera. ``certain_semantic_mask`` (:37-104): a projected point's
semantic label is "certain" only if the mask pixels at ±10px along both
diagonals agree with the label at the point — rejects labels near class
boundaries before they are baked into surfels. Vectorized numpy.
"""

from __future__ import annotations

import numpy as np

CERTAIN_OFFSET = 10


def cull_mask_in_frame(points, w2c, K, width: int, height: int):
    """Returns (mask [N] bool, pix [N,2] float, depth [N])."""
    v = np.asarray(points) @ w2c[:3, :3].T + w2c[:3, 3]
    z = v[:, 2]
    zs = np.maximum(z, 1e-8)
    x = v[:, 0] / zs * K[0, 0] + K[0, 2]
    y = v[:, 1] / zs * K[1, 1] + K[1, 2]
    mask = (z > 0.01) & (x >= 0) & (x < width) & (y >= 0) & (y < height)
    return mask, np.stack([x, y], axis=1), z


def certain_semantic_mask(pix, labels, semantic_map,
                          offset: int = CERTAIN_OFFSET):
    """pix [N,2] float, labels [N] candidate classes, semantic_map [H,W].

    True where all four diagonal neighbors at ±offset carry the same class
    (reference ``getCertainSemanticMask``)."""
    sem = np.asarray(semantic_map)
    h, w = sem.shape
    x = pix[:, 0].astype(np.int64)
    y = pix[:, 1].astype(np.int64)
    ok = np.ones(x.shape[0], bool)
    for dx, dy in [(offset, offset), (offset, -offset),
                   (-offset, offset), (-offset, -offset)]:
        xi = np.clip(x + dx, 0, w - 1)
        yi = np.clip(y + dy, 0, h - 1)
        ok &= sem[yi, xi] == labels
    return ok


def colorize_points_from_frames(points, frames, agree_frames: int = 1):
    """Project a cloud into several frames, picking up color + semantics.

    ``frames``: iterable of dicts with keys w2c, K, image [H,W,3] float,
    semantic [H,W] int (optional). A point takes the color/label of the
    first frame that sees it with a *certain* label (reference
    addWaymoLidarPointCloud flow, ``waymo.py:195-255``). Returns
    (colors [N,3], semantics [N], seen [N] bool).
    """
    n = np.asarray(points).shape[0]
    colors = np.zeros((n, 3), np.float32)
    semantics = np.full(n, -1, np.int32)
    seen = np.zeros(n, bool)
    for fr in frames:
        img = np.asarray(fr["image"])
        h, w = img.shape[:2]
        mask, pix, _ = cull_mask_in_frame(points, fr["w2c"], fr["K"], w, h)
        todo = mask & ~seen
        if not todo.any():
            continue
        xi = np.clip(pix[todo, 0].astype(np.int64), 0, w - 1)
        yi = np.clip(pix[todo, 1].astype(np.int64), 0, h - 1)
        col = img[yi, xi]
        if "semantic" in fr and fr["semantic"] is not None:
            lab = np.asarray(fr["semantic"])[yi, xi]
            certain = certain_semantic_mask(pix[todo], lab, fr["semantic"])
        else:
            lab = np.zeros(xi.shape[0], np.int32)
            certain = np.ones(xi.shape[0], bool)
        idx = np.flatnonzero(todo)[certain]
        colors[idx] = col[certain]
        semantics[idx] = lab[certain]
        seen[idx] = True
    return colors, semantics, seen
