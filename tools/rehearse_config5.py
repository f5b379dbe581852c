"""Config-5 memory rehearsal on the virtual 8-device mesh (VERDICT r4 #7).

Runs the FULL BASELINE-config-5 training machinery — ``step_zero``
(surfel-sharded params + Adam moments), two-phase binning,
shard_preprocess, joint sky — at >=1M surfels on a 2(data) x 4(tile)
virtual CPU mesh, plus one slab-bounded held-out eval, and records peak
host memory and step wall time into ``docs/config5_rehearsal.json``.

This is a MEMORY-SHAPE rehearsal: the interpret-mode Pallas kernels on
CPU are orders of magnitude slower than TPU, so the step time recorded
here is NOT a throughput claim — the artifact documents that the ZeRO
path executes end-to-end at config-5 state scale and what it allocates.

    python tools/rehearse_config5.py [n_surfels]
"""

import json
import os
import resource
import sys
import time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8"
                           ).strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def rss_mb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import jax.numpy as jnp

    from streetunveiler_tpu.config import OptimizationParams
    from streetunveiler_tpu.models.gaussians import create_from_pcd
    from streetunveiler_tpu.models.sky import init_sky
    from streetunveiler_tpu.parallel.shard import (make_mesh,
                                                   make_sharded_train_step,
                                                   surfel_sharding)
    from streetunveiler_tpu.train.loop import evaluate_views
    from streetunveiler_tpu.train.optim import adam_init
    from streetunveiler_tpu.train.step import init_optimizer
    from streetunveiler_tpu.scene.cameras import Camera

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
    # tiny frame: the rehearsal is about STATE-scale memory (1M-surfel
    # sharded params/moments + the full ZeRO step executing), and the
    # interpret-mode kernels pay python-level cost per visit — a small
    # duplicate stream keeps the step in minutes on CPU
    W, H, f = 128, 64, 90.0       # slab = 16 rows on the 4-wide tile axis
    n_data, n_tile = 2, 4

    rng = np.random.default_rng(0)
    pts = np.stack([rng.uniform(-40, 40, n), rng.uniform(-10, 3, n),
                    rng.uniform(2, 120, n)], 1).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    sem = rng.integers(0, 6, n)
    t0 = time.perf_counter()
    state = create_from_pcd(pts, cols, sem, spatial_scale=40.0,
                            capacity=n, sh_degree=3)
    build_s = time.perf_counter() - t0
    print(f"state built: {n} surfels in {build_s:.1f}s rss={rss_mb():.0f}MB",
          flush=True)

    mesh = make_mesh(n_data, n_tile)
    opt = OptimizationParams()
    opt_state = init_optimizer(state)
    sky_params = init_sky(jax.random.PRNGKey(0))
    sky_opt = adam_init(sky_params)

    sh = surfel_sharding(mesh)
    state = dataclasses.replace(state,
                                params=jax.device_put(state.params, sh))
    opt_state = opt_state._replace(mu=jax.device_put(opt_state.mu, sh),
                                   nu=jax.device_put(opt_state.nu, sh))

    step = make_sharded_train_step(mesh, opt, W, H, shard_surfels=True,
                                   semantics=True, class_dist=True,
                                   sky=True, two_phase=True,
                                   shard_preprocess=True,
                                   duplicate_capacity=640 * 1024)
    K = jnp.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], jnp.float32)
    w2c = jnp.tile(jnp.eye(4)[None], (n_data, 1, 1))
    k_b = jnp.tile(K[None], (n_data, 1, 1))
    gt = jnp.zeros((n_data, H, W, 3))
    gt_sem = jnp.zeros((n_data, H, W), jnp.int32)
    bg = jnp.zeros(3)

    t0 = time.perf_counter()
    out = step(state, opt_state, w2c, k_b, gt, bg, jnp.asarray(28_000),
               gt_sem, sky_params, sky_opt)
    jax.block_until_ready(out[0].params.xyz)
    compile_s = time.perf_counter() - t0
    print(f"step 1 (compile+run): {compile_s:.1f}s rss={rss_mb():.0f}MB",
          flush=True)
    state2, opt2 = out[0], out[1]

    t0 = time.perf_counter()
    out = step(state2, opt2, w2c, k_b, gt, bg, jnp.asarray(28_001),
               gt_sem, out[2], out[3])
    jax.block_until_ready(out[0].params.xyz)
    step_s = time.perf_counter() - t0
    print(f"step 2 (steady): {step_s:.1f}s rss={rss_mb():.0f}MB", flush=True)
    metrics = out[4]
    print("metrics:", {k: float(v) for k, v in metrics.items()
                       if k != "n_alive"}, flush=True)

    # slab-bounded held-out eval at the same scale (n_slabs = n_tile)
    cam = Camera(w2c=jnp.eye(4), K=K, width=W, height=H)
    img = np.zeros((H, W, 3), np.float32)
    t0 = time.perf_counter()
    psnr, l1 = evaluate_views(out[0], [cam], [img], bg, n_slabs=n_tile,
                              duplicate_capacity=640 * 1024)
    eval_s = time.perf_counter() - t0
    print(f"slab eval: psnr={psnr:.2f} in {eval_s:.1f}s "
          f"rss={rss_mb():.0f}MB", flush=True)

    rec = {
        "config": "BASELINE config 5 rehearsal (virtual 8-device CPU mesh)",
        "n_surfels": n, "image": [W, H], "mesh": [n_data, n_tile],
        "paths": "step_zero + two_phase + shard_preprocess + sky + "
                 "semantic CE + fused class distortion; slab-bounded eval",
        "peak_rss_mb": round(rss_mb(), 1),
        "state_build_s": round(build_s, 1),
        "step_compile_s": round(compile_s, 1),
        "step_steady_s": round(step_s, 1),
        "slab_eval_s": round(eval_s, 1),
        "loss": float(metrics["loss"]),
        "overflow": bool(metrics["overflow"]),
        "note": "CPU interpret-mode kernels: step time is NOT a TPU "
                "throughput claim; the artifact documents that the ZeRO "
                "path executes at config-5 state scale and its memory.",
        "command": "python tools/rehearse_config5.py",
    }
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "config5_rehearsal.json")
    with open(out_path, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps(rec, indent=1), flush=True)


if __name__ == "__main__":
    main()
