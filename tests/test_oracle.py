"""Semantics tests for the pure-jnp oracle rasterizer (BASELINE config 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streetunveiler_tpu.ops.rasterizer import RasterizeSettings, rasterize_oracle


def make_cam(W=64, H=48, f=60.0):
    K = jnp.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], jnp.float32)
    w2c = jnp.eye(4)
    return w2c, K, RasterizeSettings(width=W, height=H, znear=0.2, zfar=100.0)


def one_surfel(xyz=(0, 0, 5.0), scale=(0.5, 0.5), quat=(1, 0, 0, 0),
               opacity=0.9, color=(1.0, 0.2, 0.1)):
    return (jnp.array([xyz], jnp.float32), jnp.array([scale], jnp.float32),
            jnp.array([quat], jnp.float32), jnp.array([opacity], jnp.float32),
            jnp.array([color], jnp.float32))


def test_single_surfel_center():
    w2c, K, st = make_cam()
    out = rasterize_oracle(*one_surfel(), w2c, K, st,
                           chunk_surfels=8, pixel_block=512)
    cy, cx = st.height // 2, st.width // 2
    # at the exact center u=v≈0 → G≈1 → alpha≈opacity
    assert out.alpha[cy, cx] == pytest.approx(0.9, abs=0.02)
    assert np.allclose(out.color[cy, cx] / out.alpha[cy, cx], [1.0, 0.2, 0.1],
                       atol=0.02)
    # expected depth normalizes to the surfel depth
    assert out.expected_depth[cy, cx] / out.alpha[cy, cx] == pytest.approx(5.0, abs=1e-3)
    assert out.median_depth[cy, cx] == pytest.approx(5.0, abs=1e-3)
    # normal faces the camera: view-space normal (0,0,-1) after flip
    nrm = out.normal[cy, cx] / out.alpha[cy, cx]
    assert np.allclose(nrm, [0, 0, -1], atol=1e-3)
    # far corner: no coverage
    assert out.alpha[0, 0] == 0.0
    assert out.radii[0] > 0


def test_background_composite():
    w2c, K, st = make_cam()
    bg = jnp.array([0.0, 0.0, 1.0])
    out = rasterize_oracle(*one_surfel(opacity=0.5), w2c, K, st, bg=bg,
                           chunk_surfels=8, pixel_block=512)
    # empty pixel = pure background
    assert np.allclose(out.color[0, 0], [0, 0, 1], atol=1e-6)
    cy, cx = st.height // 2, st.width // 2
    a = out.alpha[cy, cx]
    assert np.allclose(out.color[cy, cx], a * np.array([1.0, 0.2, 0.1]) +
                       (1 - a) * np.array([0, 0, 1]), atol=1e-5)


def test_two_surfel_blending_order():
    w2c, K, st = make_cam()
    means = jnp.array([[0, 0, 8.0], [0, 0, 4.0]], jnp.float32)  # far listed first
    scales = jnp.full((2, 2), 2.0)
    quats = jnp.tile(jnp.array([1.0, 0, 0, 0]), (2, 1))
    opac = jnp.array([0.8, 0.6])
    cols = jnp.array([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0]], jnp.float32)
    out = rasterize_oracle(means, scales, quats, opac, cols, w2c, K, st,
                           chunk_surfels=8, pixel_block=512)
    cy, cx = st.height // 2, st.width // 2
    # near (red, 0.6) composites first regardless of input order
    expect = 0.6 * np.array([1, 0, 0]) + 0.4 * 0.8 * np.array([0, 1, 0])
    assert np.allclose(out.color[cy, cx], expect, atol=0.02)
    # median depth = first surfel crossing T=0.5 → the near one
    assert out.median_depth[cy, cx] == pytest.approx(4.0, abs=1e-2)
    # distortion is positive when two depths mix
    assert out.distortion[cy, cx] > 0
    # single-surfel pixels would have ~zero distortion
    solo = rasterize_oracle(*one_surfel(), w2c, K, st,
                            chunk_surfels=8, pixel_block=512)
    assert solo.distortion[cy, cx] == pytest.approx(0.0, abs=1e-6)


def test_tilted_surfel_depth_gradient():
    """A tilted plane must show per-pixel intersection depth variation."""
    w2c, K, st = make_cam()
    # rotate 45° about y so the plane tilts in x
    s = np.sin(np.pi / 8)
    c = np.cos(np.pi / 8)
    out = rasterize_oracle(*one_surfel(scale=(3.0, 3.0), quat=(c, 0.0, s, 0.0),
                                       opacity=0.95), w2c, K, st,
                           chunk_surfels=8, pixel_block=512)
    cy, cx = st.height // 2, st.width // 2
    d = np.array(out.expected_depth) / np.maximum(np.array(out.alpha), 1e-9)
    assert d[cy, cx + 6] != pytest.approx(d[cy, cx - 6], abs=1e-3)
    # depth increases toward the side the plane recedes
    assert (d[cy, cx + 6] - d[cy, cx - 6]) * (d[cy, cx + 3] - d[cy, cx - 3]) > 0


def test_early_termination_matches_many_opaque():
    """Deep stack of opaque surfels: far ones must not contribute."""
    w2c, K, st = make_cam(W=32, H=32, f=40.0)
    n = 40
    means = jnp.stack([jnp.zeros(n), jnp.zeros(n),
                       jnp.linspace(2.0, 40.0, n)], axis=1)
    scales = jnp.full((n, 2), 3.0)
    quats = jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1))
    opac = jnp.full((n,), 0.95)
    cols = jnp.zeros((n, 3)).at[:, 0].set(jnp.linspace(0, 1, n))
    out = rasterize_oracle(means, scales, quats, opac, cols, w2c, K, st,
                           chunk_surfels=8, pixel_block=256)
    # front surfel dominates; total alpha ~1
    assert out.alpha[16, 16] == pytest.approx(1.0, abs=1e-3)
    assert out.color[16, 16, 0] < 0.05
    assert out.median_depth[16, 16] == pytest.approx(2.0, abs=0.1)


def test_gradients_finite_diff():
    """Finite-difference gradient check on a tiny scene (BASELINE config 1).

    Runs in float64 with a small step so FD noise is negligible; remaining
    discrepancy would indicate a genuine autodiff/semantics bug (the blend
    has benign discontinuities at branch boundaries — min(ρ3d, ρ2d), the
    1/255 contribution gate — which small steps rarely cross).
    """
    jax.config.update("jax_enable_x64", True)
    try:
        w2c, K, st = make_cam(W=24, H=16, f=20.0)
        rng = np.random.default_rng(3)
        n = 6
        means = jnp.asarray(rng.uniform(-1, 1, (n, 3)) + [0, 0, 5])
        scales = jnp.asarray(rng.uniform(0.5, 1.5, (n, 2)))
        quats = jnp.asarray(rng.normal(size=(n, 4)))
        opac = jnp.asarray(rng.uniform(0.3, 0.8, n))
        cols = jnp.asarray(rng.uniform(0, 1, (n, 3)))
        target = jnp.asarray(rng.uniform(0, 1, (st.height, st.width, 3)))

        @jax.jit
        def loss(means, scales, quats, opac, cols):
            out = rasterize_oracle(means, scales, quats, opac, cols,
                                   jnp.asarray(w2c, jnp.float64),
                                   jnp.asarray(K, jnp.float64), st,
                                   bg=jnp.zeros(3), chunk_surfels=8,
                                   pixel_block=128)
            return (jnp.mean((out.color - target) ** 2)
                    + 1e-3 * jnp.mean(out.distortion)
                    + 1e-3 * jnp.mean(out.normal ** 2)
                    + 1e-3 * jnp.mean(out.expected_depth))

        grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))(
            means, scales, quats, opac, cols)
        for g in grads:
            assert np.all(np.isfinite(np.array(g)))
        assert any(float(jnp.abs(g).max()) > 0 for g in grads)

        eps = 1e-6
        args = [means, scales, quats, opac, cols]
        for ai in range(5):
            a = np.array(args[ai], np.float64)
            for fi in [0, min(3, a.size - 1)]:
                pert = np.zeros_like(a).reshape(-1)
                pert[fi] = eps
                pert = pert.reshape(a.shape)
                hi = [jnp.asarray(a + pert) if j == ai else args[j]
                      for j in range(5)]
                lo = [jnp.asarray(a - pert) if j == ai else args[j]
                      for j in range(5)]
                fd = (float(loss(*hi)) - float(loss(*lo))) / (2 * eps)
                an = float(np.array(grads[ai]).reshape(-1)[fi])
                assert an == pytest.approx(fd, abs=max(1e-6, 1e-3 * abs(fd))), \
                    f"arg {ai} flat {fi}: analytic {an} vs fd {fd}"
    finally:
        jax.config.update("jax_enable_x64", False)
