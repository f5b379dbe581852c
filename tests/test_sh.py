import jax
import jax.numpy as jnp
import numpy as np

from streetunveiler_tpu.ops.sh import (eval_sh, num_sh_bases, rgb_to_sh,
                                       sh_basis, sh_to_rgb)


def _rand_dirs(n, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    return (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)


def test_band_counts():
    d = jnp.asarray(_rand_dirs(5))
    for deg in range(5):
        assert sh_basis(d, deg).shape == (5, num_sh_bases(deg))


def test_orthonormality():
    """Monte-Carlo check: ∫ Y_i Y_j dΩ = δ_ij over the sphere."""
    d = jnp.asarray(_rand_dirs(200_000))
    B = np.array(sh_basis(d, 3))  # [N, 16]
    gram = 4 * np.pi * (B.T @ B) / B.shape[0]
    assert np.allclose(gram, np.eye(16), atol=0.05)


def test_dc_only_constant():
    d = jnp.asarray(_rand_dirs(10))
    sh = jnp.zeros((10, 16, 3)).at[:, 0, :].set(rgb_to_sh(jnp.full((10, 3), 0.7)))
    rgb = eval_sh(3, sh, d) + 0.5
    assert np.allclose(rgb, 0.7, atol=1e-5)


def test_rgb_sh_roundtrip():
    rgb = jnp.array([[0.1, 0.5, 0.9]])
    assert np.allclose(sh_to_rgb(rgb_to_sh(rgb)), rgb, atol=1e-6)


def test_grad_flows():
    d = jnp.asarray(_rand_dirs(4))
    g = jax.grad(lambda x: jnp.sum(sh_basis(x, 4)))(d)
    assert np.all(np.isfinite(np.array(g)))
