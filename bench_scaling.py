"""Tile-parallel scaling benchmark (BASELINE configs 3/5, SURVEY.md §2.4).

Measures the sharded train step at 1/2/4/8 devices on the virtual CPU mesh
(``--xla_force_host_platform_device_count``) and reports rays/s plus
scaling efficiency vs the 1-device run. On real TPU hardware the same
harness runs unchanged (drop the CPU forcing); on the virtual mesh the
numbers measure the *parallelization overhead shape* (slab binning,
collectives), not TPU throughput.

Prints one JSON line per mesh size:
    {"devices": N, "rays_per_s": ..., "efficiency": ...}
"""

import json
import os
import sys
import time

if "--tpu" not in sys.argv:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8"
                               ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import numpy as np


def main():
    import jax.numpy as jnp
    from bench import build_scene
    from streetunveiler_tpu.config import OptimizationParams
    from streetunveiler_tpu.models.gaussians import create_from_pcd
    from streetunveiler_tpu.parallel.shard import (make_mesh,
                                                   make_sharded_train_step)
    from streetunveiler_tpu.train.step import init_optimizer

    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
        else 20_000
    W, H, f = 256, 256, 180.0
    iters = 3

    pts, _, _, _, cols, _ = build_scene(n)
    sem = np.zeros(n, np.int64)
    state = create_from_pcd(pts, cols, sem, spatial_scale=20.0,
                            capacity=-(-n // 8) * 8, sh_degree=3)
    opt = OptimizationParams()
    K = jnp.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], jnp.float32)
    gt = jnp.zeros((H, W, 3))
    bg = jnp.zeros(3)

    n_avail = len(jax.devices())
    base = None
    for nd in (1, 2, 4, 8):
        if nd > n_avail:
            break
        mesh = make_mesh(1, nd)
        step = make_sharded_train_step(mesh, opt, W, H)
        opt_state = init_optimizer(state)
        w2c = jnp.eye(4)[None]
        kb = K[None]
        gtb = gt[None]

        st, os_, _ = step(state, opt_state, w2c, kb, gtb, bg,
                          jnp.asarray(1))
        jax.block_until_ready(st.params.xyz)
        t0 = time.perf_counter()
        for it in range(iters):
            st, os_, _ = step(st, os_, w2c, kb, gtb, bg,
                              jnp.asarray(2 + it))
        jax.block_until_ready(st.params.xyz)
        dt = (time.perf_counter() - t0) / iters
        rays = W * H / dt
        if base is None:
            base = rays
        print(json.dumps({
            "devices": nd,
            "rays_per_s": round(rays, 1),
            # linear-scaling efficiency vs the 1-device run
            "efficiency": round(rays / (base * nd), 4),
        }), flush=True)


if __name__ == "__main__":
    main()
