"""Probe: why does config-2-scale training plateau on TPU?

Checks, at the e2e gate's exact scene scale:
  1. GT images from the TPU fast path: save PNG + stats, compare one
     against the CPU oracle rendering of the same camera (on a crop).
  2. Init-state render: overflow flag, PSNR vs GT.
  3. A 200-iter training slice at this scale: PSNR must move.

Run detached: python tools/probe_e2e_scale.py > /tmp/probe_scale.log 2>&1
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from streetunveiler_tpu.config import OptimizationParams
    from streetunveiler_tpu.renderer import render
    from streetunveiler_tpu.scene.readers import make_synthetic_street
    from streetunveiler_tpu.scene.scene import Scene
    from streetunveiler_tpu.train.loop import evaluate_views, train_scene

    print("backend:", jax.default_backend(), flush=True)
    t0 = time.perf_counter()
    info = make_synthetic_street(n_points=100_000, n_cameras=4, width=800,
                                 height=600, focal=700.0, seed=0)
    print(f"scene built in {time.perf_counter()-t0:.1f}s", flush=True)
    scene = Scene(info)
    gt0 = np.asarray(scene.train_images[0])
    print("gt0 stats: min %.3f max %.3f mean %.3f std %.3f" %
          (gt0.min(), gt0.max(), gt0.mean(), gt0.std()), flush=True)
    Image.fromarray((np.clip(gt0, 0, 1) * 255).astype(np.uint8)).save(
        "/tmp/probe_gt0.png")

    state = scene.create_state(capacity=128_000)
    from streetunveiler_tpu.cli.common import scene_background
    bg = scene_background(scene)
    cam = scene.train_cameras[0]

    @jax.jit
    def r0(st):
        res = render(cam, st, bg)
        return res.render, res.rend_alpha, res.overflow, res.radii

    img, alpha, ovf, radii = map(np.asarray, r0(state))
    print("init render: overflow=%s alpha_mean=%.3f visible=%d/%d" %
          (bool(ovf), alpha.mean(), int((radii > 0).sum()),
           radii.shape[0]), flush=True)
    Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
        "/tmp/probe_init0.png")
    mse = float(np.mean((np.clip(img, 0, 1) - gt0) ** 2))
    print("init psnr vs gt0: %.2f" % (-10 * np.log10(max(mse, 1e-12))),
          flush=True)

    # training slice: PSNR must move up
    opt = OptimizationParams(densify_from_iter=10_000)  # isolate: no densify
    reports = []
    state2, _, reps = train_scene(scene, state, opt, bg=bg, iterations=200,
                                  log_every=50, callback=reports.append)
    for r in reps:
        print(f"  it {r.iteration}: loss={r.loss:.4f} psnr={r.psnr:.2f} "
              f"overflow={r.overflow_frac}", flush=True)
    img2 = np.asarray(r0(state2)[0])
    mse2 = float(np.mean((np.clip(img2, 0, 1) - gt0) ** 2))
    print("after-200 psnr vs gt0: %.2f" % (-10 * np.log10(max(mse2, 1e-12))),
          flush=True)
    Image.fromarray((np.clip(img2, 0, 1) * 255).astype(np.uint8)).save(
        "/tmp/probe_after200.png")


if __name__ == "__main__":
    main()
