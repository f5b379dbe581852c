"""Stage breakdown of the fused late-phase semantic train step.

Times stage1_loss grad variants on the bench scene: full, without
class-dist blend, without semantic payload, plus bare RGB loss — the
deltas attribute the fused blends; also times SSIM and sky separately.

Run: python tools/profile_semstep.py
"""

import dataclasses
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_scene
from streetunveiler_tpu.config import OptimizationParams
from streetunveiler_tpu.models.gaussians import create_from_pcd
from streetunveiler_tpu.scene.cameras import Camera
from streetunveiler_tpu.train.step import stage1_loss

ITERS = 3


def timeit(fn, x):
    r = fn(x)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    jax.block_until_ready(fn(x + 1e-6))
    return (time.perf_counter() - t0) / ITERS


def main():
    n = 200_000
    W, H, f = 1920, 1280, 1000.0
    pts, scales, quats, opac, cols, sem = build_scene(n)
    rng = np.random.default_rng(1)
    state = create_from_pcd(pts, cols, sem, spatial_scale=30.0,
                            capacity=n, sh_degree=3)
    cam = Camera(w2c=jnp.eye(4),
                 K=jnp.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]],
                             jnp.float32), width=W, height=H)
    gt = jnp.zeros((H, W, 3))
    gt_sem = jnp.asarray(rng.integers(0, 6, (H, W)))
    bg = jnp.zeros(3)
    opt = OptimizationParams()
    opt_nosem = dataclasses.replace(opt, enable_semantic_loss=False)

    def make(opt_, cdist, gtsem):
        def loss(xyz):
            st = dataclasses.replace(
                state, params=dataclasses.replace(state.params, xyz=xyz))
            l, _ = stage1_loss(st, cam, gt, bg, jnp.asarray(28_000), opt_,
                               gt_semantic=gtsem, class_dist=cdist)
            return l
        g = jax.grad(loss)

        @jax.jit
        def run(xyz):
            def body(i, p):
                return p + 1e-12 * g(p)
            return jax.lax.fori_loop(0, ITERS, body, xyz)
        return run

    for name, opt_, cdist, gtsem in [
            ("full (sem+dist)", opt, True, gt_sem),
            ("sem, no dist", opt, False, gt_sem),
            ("rgb only", opt_nosem, False, None)]:
        t = timeit(make(opt_, cdist, gtsem), state.params.xyz)
        print(f"{name:18s}: {t*1e3:8.1f} ms", flush=True)

    # ssim alone
    from streetunveiler_tpu.train.losses import ssim

    def sg(img):
        return jnp.sum(ssim(img, gt))
    gs = jax.grad(sg)

    @jax.jit
    def run_ssim(x):
        def body(i, p):
            return p + 1e-12 * gs(p)
        return jax.lax.fori_loop(0, ITERS, body, x)
    t = timeit(run_ssim, jnp.zeros((H, W, 3)))
    print(f"{'ssim fwd+bwd':18s}: {t*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
