"""Probe: does the synthetic GT fast-path render overflow its duplicate
stream at config-2 scale, and which cameras fit worst?

Round-5 follow-up to probe_e2e_scale (training moves PSNR but slowly and
the loss alternates by camera). Checks:
  1. GT render overflow flag per camera (overflow drops farthest surfels
     silently — inconsistent multi-view supervision).
  2. Per-camera init-state loss/psnr (is one camera an outlier?).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from streetunveiler_tpu.ops.knn import mean_sq_dist_to_3nn
    from streetunveiler_tpu.ops.rasterizer import RasterizeSettings, rasterize
    from streetunveiler_tpu.ops.rasterizer.api import (
        bin_for_camera, default_duplicate_capacity)
    from streetunveiler_tpu.scene.readers.synthetic import _street_points

    print("backend:", jax.default_backend(), flush=True)
    W, H, f = 800, 600, 700.0
    n = 100_000
    rng = np.random.default_rng(0)
    pts, cols, sems, _nrms = _street_points(n, rng)
    dist = np.sqrt(np.maximum(mean_sq_dist_to_3nn(pts), 1e-7))
    scales = jnp.asarray(np.repeat(dist[:, None] * 1.3, 2, 1))
    quats = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    opac = jnp.full((n,), 0.85)
    K = jnp.asarray(np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]],
                             np.float32))
    st = RasterizeSettings(width=W, height=H, znear=0.2, zfar=100.0)
    cap = default_duplicate_capacity(n, W, H)
    print("duplicate capacity:", cap, flush=True)

    jit_bin = jax.jit(lambda w2c: bin_for_camera(
        jnp.asarray(pts), scales, quats, opac, w2c, K, st,
        duplicate_capacity=cap))

    for i in range(16):
        t_world = np.array([0.35 * np.sin(i * 0.7), 0.0, i * 1.2])
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, 3] = -t_world
        b = jit_bin(jnp.asarray(w2c))
        total = int(b.tile_offsets[-1])
        print(f"cam {i:2d}: overflow={bool(b.overflow)} "
              f"dups={total}/{cap}", flush=True)


if __name__ == "__main__":
    main()
