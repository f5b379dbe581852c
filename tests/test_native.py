"""Parity tests: native C++ host kernels vs the pure-Python fallbacks.

The native library (streetunveiler_tpu/native, the TPU build's equivalent
of the reference's simple-knn / pcd-loop native paths) must agree with the
scipy/numpy implementations it replaces. Skipped when no compiler is
available in the environment.
"""

import numpy as np
import pytest
from scipy.spatial import cKDTree

from streetunveiler_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def test_knn_mean_sq_dist3():
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((5000, 3)).astype(np.float32)
    got = native.knn_mean_sq_dist3(pts)
    tree = cKDTree(pts)
    d, _ = tree.query(pts, k=4)
    want = np.mean(d[:, 1:] ** 2, axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_knn_mean_dist_ref():
    rng = np.random.default_rng(1)
    q = rng.standard_normal((2000, 3)).astype(np.float32)
    ref = rng.standard_normal((3000, 3)).astype(np.float32)
    got = native.knn_mean_dist_ref(q, ref, 3)
    tree = cKDTree(ref)
    d, _ = tree.query(q, k=3)
    want = np.mean(d, axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_cluster_radius_components():
    rng = np.random.default_rng(2)
    # three well-separated blobs with internal spacing << radius
    blobs = [rng.normal(c, 0.05, (200, 3)) for c in
             ((0, 0, 0), (10, 0, 0), (0, 10, 0))]
    pts = np.concatenate(blobs).astype(np.float32)
    labels = native.cluster_radius(pts, 1.0)
    # each blob one component, all distinct
    for i, lo in enumerate(range(0, 600, 200)):
        assert len(set(labels[lo:lo + 200].tolist())) == 1
    assert len({labels[0], labels[200], labels[400]}) == 3


def test_cluster_radius_matches_bruteforce():
    rng = np.random.default_rng(3)
    pts = rng.uniform(0, 2, (300, 3)).astype(np.float32)
    r = 0.25
    labels = native.cluster_radius(pts, r)
    # brute-force union find
    parent = np.arange(300)

    def find(a):
        while parent[a] != a:
            a = parent[a]
        return a

    d2 = np.sum((pts[:, None] - pts[None]) ** 2, -1)
    for i, j in zip(*np.where(d2 <= r * r)):
        if i < j:
            ri, rj = find(i), find(j)
            if ri != rj:
                parent[max(ri, rj)] = min(ri, rj)
    want = np.array([find(i) for i in range(300)])
    # same partition (label values may differ)
    import itertools
    for a, b in itertools.islice(
            ((i, j) for i in range(300) for j in range(i + 1, 300, 7)),
            0, None):
        assert (labels[a] == labels[b]) == (want[a] == want[b])


def test_voxel_downsample_parity():
    from streetunveiler_tpu.utils.pcd import (SemanticPointCloud,
                                              voxel_down_sample)
    rng = np.random.default_rng(4)
    # points away from voxel boundaries so f32/f64 keys agree
    base = rng.integers(0, 20, (4000, 3)).astype(np.float32)
    pts = base + rng.uniform(0.2, 0.8, (4000, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (4000, 3)).astype(np.float32)
    sem = rng.integers(0, 6, 4000).astype(np.int32)
    pc = SemanticPointCloud(pts, cols, sem)

    got = voxel_down_sample(pc, 1.0, 0.6)     # native path
    import streetunveiler_tpu.utils.pcd as pcd_mod
    import streetunveiler_tpu.native as nat_mod
    old = nat_mod.voxel_downsample
    nat_mod.voxel_downsample = lambda *a, **k: None
    try:
        want = voxel_down_sample(pc, 1.0, 0.6)   # numpy path
    finally:
        nat_mod.voxel_downsample = old

    assert got.points.shape == want.points.shape
    # compare as voxel-keyed sets (output order differs by design)
    def keyed(x):
        k = np.round(x.points * 1000).astype(np.int64)
        order = np.lexsort((k[:, 2], k[:, 1], k[:, 0]))
        return (x.points[order], x.colors[order], x.semantics[order])

    gp, gc, gs = keyed(got)
    wp, wc, ws = keyed(want)
    np.testing.assert_allclose(gp, wp, atol=1e-4)
    np.testing.assert_allclose(gc, wc, atol=1e-4)
    np.testing.assert_array_equal(gs, ws)


def test_pipeline_clustering_uses_native():
    # end-to-end: cluster_semantic_instance through the native path
    from streetunveiler_tpu.models.gaussians import create_from_pcd
    from streetunveiler_tpu.pipeline.select import cluster_semantic_instance
    rng = np.random.default_rng(5)
    blob1 = rng.normal((0, 0, 5), 0.01, (60, 3))
    blob2 = rng.normal((3, 0, 5), 0.01, (60, 3))
    pts = np.concatenate([blob1, blob2]).astype(np.float32)
    cols = np.full((120, 3), 0.5, np.float32)
    sem = np.full(120, 5, np.int32)           # vehicle class
    state = create_from_pcd(pts, cols, sem, spatial_scale=10.0,
                            capacity=128, sh_degree=0)
    c = cluster_semantic_instance(state, 1 << 5, threshold=0.1)
    assert c.cluster_sizes.tolist().count(60) == 2
