"""Surfel-sharded (ZeRO-style) training step matches the replicated step
bit-for-bit on the virtual CPU mesh (BASELINE config-5 memory scaling)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from streetunveiler_tpu.config import OptimizationParams
from streetunveiler_tpu.models.gaussians import create_from_pcd
from streetunveiler_tpu.parallel.shard import (make_mesh,
                                               make_sharded_train_step)
from streetunveiler_tpu.train.step import init_optimizer


def test_zero_sharded_matches_replicated():
    rng = np.random.default_rng(0)
    n = 50
    pts = np.stack([rng.uniform(-2, 2, n), rng.uniform(-2, 2, n),
                    rng.uniform(3, 8, n)], 1).astype(np.float32)
    cols = rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)
    state = create_from_pcd(pts, cols, rng.integers(0, 6, n),
                            spatial_scale=4.0, capacity=64)
    opt_state = init_optimizer(state)
    opt = OptimizationParams()
    W, H, f = 32, 64, 30.0
    K = jnp.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], jnp.float32)
    mesh = make_mesh(2, 4)

    B = 2
    w2c = jnp.broadcast_to(jnp.eye(4), (B, 4, 4))
    Kb = jnp.broadcast_to(K, (B, 3, 3))
    gt = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)), jnp.float32)
    bg = jnp.zeros(3)

    step = make_sharded_train_step(mesh, opt, W, H)
    step_z = make_sharded_train_step(mesh, opt, W, H, shard_surfels=True)

    s1, o1, m1 = step(state, opt_state, w2c, Kb, gt, bg, jnp.asarray(1))
    s2, o2, m2 = step_z(state, opt_state, w2c, Kb, gt, bg, jnp.asarray(1))

    assert np.isfinite(float(m2["loss"]))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)
    for name in ["xyz", "scaling", "rotation", "opacity", "features_dc"]:
        np.testing.assert_allclose(
            np.array(getattr(s2.params, name)),
            np.array(getattr(s1.params, name)), atol=1e-6,
            err_msg=f"param {name} diverged")
    np.testing.assert_allclose(np.array(o2.mu.xyz), np.array(o1.mu.xyz),
                               atol=1e-7)
    np.testing.assert_allclose(np.array(s2.grad_accum),
                               np.array(s1.grad_accum), atol=1e-6)
    assert int(o2.step) == int(o1.step) == 1
