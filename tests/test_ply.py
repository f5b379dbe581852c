import numpy as np

from streetunveiler_tpu.models.gaussians import create_from_pcd
from streetunveiler_tpu.utils.ply import (load_surfel_ply, save_surfel_ply,
                                          state_from_ply, state_to_ply)


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n = 50
    path = str(tmp_path / "pc.ply")
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    dc = rng.normal(size=(n, 1, 3)).astype(np.float32)
    rest = rng.normal(size=(n, 15, 3)).astype(np.float32)
    op = rng.normal(size=(n, 1)).astype(np.float32)
    sc = rng.normal(size=(n, 2)).astype(np.float32)
    rot = rng.normal(size=(n, 4)).astype(np.float32)
    sem = rng.integers(0, 6, n).astype(np.int32)
    save_surfel_ply(path, xyz, dc, rest, op, sc, rot, sem)
    d = load_surfel_ply(path)
    np.testing.assert_allclose(d["xyz"], xyz, atol=1e-6)
    np.testing.assert_allclose(d["features_dc"], dc, atol=1e-6)
    np.testing.assert_allclose(d["features_rest"], rest, atol=1e-6)
    np.testing.assert_allclose(d["opacity"], op, atol=1e-6)
    np.testing.assert_allclose(d["scaling"], sc, atol=1e-6)
    np.testing.assert_allclose(d["rotation"], rot, atol=1e-6)
    np.testing.assert_array_equal(d["semantics"], sem)


def test_state_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    n = 40
    pts = rng.normal(size=(n, 3)).astype(np.float32) + [0, 0, 5]
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    sem = rng.integers(0, 6, n)
    state = create_from_pcd(pts, cols, sem, spatial_scale=3.0, capacity=64)
    path = str(tmp_path / "state.ply")
    state_to_ply(path, state)
    state2 = state_from_ply(path, spatial_scale=3.0, capacity=64)
    assert int(state2.num_alive) == n
    a1 = np.array(state.alive)
    np.testing.assert_allclose(np.array(state2.params.xyz)[:n],
                               np.array(state.params.xyz)[a1][:n], atol=1e-6)
    np.testing.assert_array_equal(np.array(state2.semantics)[:n],
                                  np.array(state.semantics)[a1][:n])
    # dead slots culled (zero activated opacity)
    assert float(np.array(state2.get_opacity())[n:].max(initial=0.0)) == 0.0
