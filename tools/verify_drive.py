"""End-to-end TPU drive for /verify: render a recognizable scene through
the public API, check colors/depths/background, run a short training
slice (PSNR must rise), and check grads are finite+nonzero.

Everything per-frame is inside jit (axon relay rule); one process owns
the TPU for the whole run.

Usage: python tools/verify_drive.py [out_dir]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    print(f"backend: {jax.default_backend()} devices: {jax.devices()}",
          flush=True)

    from streetunveiler_tpu.ops.rasterizer import (RasterizeSettings,
                                                   rasterize)

    W, H, f = 320, 240, 200.0
    K = jnp.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], jnp.float32)
    w2c = jnp.eye(4)
    st = RasterizeSettings(width=W, height=H, znear=0.2, zfar=100.0)

    # ground plane + 3 colored blobs at known depths
    rng = np.random.default_rng(0)
    n_g = 4000
    ground = np.stack([rng.uniform(-8, 8, n_g), np.full(n_g, 1.5),
                       rng.uniform(2, 30, n_g)], 1)
    blobs = np.array([[-2.0, 0.0, 6.0], [0.0, -0.5, 8.0], [2.0, 0.0, 10.0]])
    bl_pts = np.concatenate([b + rng.normal(0, 0.12, (200, 3))
                             for b in blobs])
    pts = np.concatenate([ground, bl_pts]).astype(np.float32)
    n = pts.shape[0]
    cols = np.zeros((n, 3), np.float32)
    cols[:n_g] = [0.5, 0.5, 0.5]
    cols[n_g:n_g + 200] = [1.0, 0.1, 0.1]
    cols[n_g + 200:n_g + 400] = [0.1, 1.0, 0.1]
    cols[n_g + 400:] = [0.1, 0.1, 1.0]
    scales = np.full((n, 2), 0.06, np.float32)
    scales[:n_g] = 0.12
    quats = np.tile([1.0, 0, 0, 0], (n, 1)).astype(np.float32)
    opac = np.full(n, 0.9, np.float32)

    args = tuple(map(jnp.asarray, (pts, scales, quats, opac, cols)))

    @jax.jit
    def fwd(p, *rest):
        out = rasterize(p, *rest, w2c, K, st, bg=jnp.zeros(3))
        return out.color, out.alpha, out.median_depth, out.overflow

    img, alpha, med, ovf = map(np.asarray, fwd(*args))
    assert np.isfinite(img).all(), "NaNs in render"
    assert not bool(ovf), "unexpected overflow"

    def proj(p):
        return (int(f * p[0] / p[2] + W / 2), int(f * p[1] / p[2] + H / 2))

    for b, want in zip(blobs, ([1, 0, 0], [0, 1, 0], [0, 0, 1])):
        x, y = proj(b)
        got = img[y, x]
        d = med[y, x]
        ok_col = got[int(np.argmax(want))] == got.max() and got.max() > 0.2
        ok_dep = abs(d - b[2]) < 0.8
        print(f"blob@({x},{y}) rgb={np.round(got, 3)} med={d:.2f} "
              f"want_depth={b[2]} col_ok={ok_col} dep_ok={ok_dep}",
              flush=True)
        assert ok_col and ok_dep
    # sky pixel (above horizon): background
    assert alpha[10, W // 2] < 0.05, "sky pixel should be empty"

    # grads through the public API: finite, nonzero
    def loss(p, *rest):
        out = rasterize(p, *rest, w2c, K, st, bg=jnp.zeros(3))
        return jnp.sum(out.color ** 2) + 0.1 * jnp.sum(out.distortion)

    g = jax.jit(jax.grad(loss))(*args)
    g = np.asarray(g)
    assert np.isfinite(g).all() and np.abs(g).max() > 0, "bad grads"
    print(f"grad max |g|={np.abs(g).max():.4g}", flush=True)

    # short training slice on a synthetic scene: PSNR must rise.
    # (imports here so the rasterizer smoke test fails fast on its own)
    from streetunveiler_tpu.config import OptimizationParams
    from streetunveiler_tpu.scene.readers import make_synthetic_street
    from streetunveiler_tpu.scene.scene import Scene
    from streetunveiler_tpu.train.loop import train_scene

    info = make_synthetic_street(n_points=1500, n_cameras=6, width=128,
                                 height=96, focal=90.0, seed=0)
    scene = Scene(info)
    state = scene.create_state(capacity=4096)
    opt = OptimizationParams(densify_from_iter=50, iterations=200)
    reports = []
    t0 = time.perf_counter()
    state2, _, reps = train_scene(scene, state, opt, iterations=200,
                                  log_every=50, use_semantics=True,
                                  callback=reports.append)
    dt = time.perf_counter() - t0
    print(f"train 200 iters in {dt:.1f}s: psnr "
          f"{[round(r.psnr, 2) for r in reps]}", flush=True)
    assert reps[-1].psnr > reps[0].psnr + 1.0, "PSNR did not improve"
    assert np.isfinite([r.loss for r in reps]).all()

    if len(sys.argv) > 1:
        try:
            from PIL import Image
            Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)
                            ).save(sys.argv[1] + "/verify_render.png")
        except Exception as e:  # pragma: no cover
            print(f"png save skipped: {e}")
    print("VERIFY OK", flush=True)


if __name__ == "__main__":
    main()
