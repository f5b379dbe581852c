import jax
import jax.numpy as jnp
import numpy as np

from streetunveiler_tpu.models.sky import (camera_rays, freq_embed,
                                           hash_encode, init_sky, render_sky,
                                           sky_forward)


def test_shapes_and_range():
    params = init_sky(jax.random.PRNGKey(0))
    H, W, f = 24, 32, 20.0
    K = jnp.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
    img = render_sky(params, H, W, K, jnp.eye(4))
    assert img.shape == (H, W, 3)
    assert float(img.min()) > 0.0 and float(img.max()) < 1.0


def test_freq_embed_dims():
    x = jnp.ones((5, 3))
    assert freq_embed(x).shape == (5, 63)


def test_hash_encode_smooth_and_local():
    params = init_sky(jax.random.PRNGKey(1))
    a = hash_encode(params, jnp.array([[0.5, 0.5, 0.5]]))
    b = hash_encode(params, jnp.array([[0.5001, 0.5, 0.5]]))
    c = hash_encode(params, jnp.array([[5.0, -3.0, 2.0]]))
    assert a.shape == (1, 32)
    assert float(jnp.abs(a - b).max()) < 1e-3      # continuity
    assert float(jnp.abs(a - c).max()) > 0.0       # distinct positions differ


def test_sky_trains():
    """A few Adam steps fit a constant color through the sigmoid."""
    params = init_sky(jax.random.PRNGKey(2))
    H, W, f = 16, 16, 10.0
    K = jnp.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
    target = jnp.broadcast_to(jnp.array([0.8, 0.3, 0.1]), (H, W, 3))

    def loss(p):
        return jnp.mean((render_sky(p, H, W, K, jnp.eye(4)) - target) ** 2)

    l0 = float(loss(params))
    lr = 1e-2
    g = jax.jit(jax.grad(loss))
    for _ in range(50):
        grads = g(params)
        params = jax.tree.map(lambda p, gg: p - lr * gg, params, grads)
    l1 = float(loss(params))
    assert l1 < l0 * 0.3, (l0, l1)


def test_camera_rays_convention():
    """Center pixel looks along -z (reference env_map.py convention)."""
    H, W, f = 17, 17, 10.0
    K = jnp.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
    o, d = camera_rays(H, W, K, jnp.eye(4))
    assert np.allclose(np.array(o[0, 0]), 0.0)
    center = np.array(d[8, 8])
    assert np.allclose(center, [-0.05, 0.05, -1.0], atol=1e-6)
