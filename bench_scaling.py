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


def decompose():
    """Per-device ADDED-WORK decomposition at the bench scene's REAL shape
    (300k surfels, 1920x1280 — not the 256^2 toy: overhead ratios there
    don't transfer; VERDICT r2 weak #1). For each mesh width reports, per
    tile-device: static duplicate capacity, measured duplicate count, sort
    size, visit count, and the duplicated per-surfel work (preprocess +
    depth argsort + record pack run over the FULL N on every device).
    Pure binning math — no train step, so it runs on CPU in minutes.

    Prints one JSON line per device count.
    """
    import jax.numpy as jnp
    from bench import build_scene
    from streetunveiler_tpu.ops.rasterizer.api import (
        default_duplicate_capacity)
    from streetunveiler_tpu.ops.rasterizer.kernel import TILE_H, TILE_W
    from streetunveiler_tpu.ops.rasterizer.preprocess import (
        preprocess_surfels)
    from streetunveiler_tpu.ops.rasterizer.tiles import (S_CHUNK,
                                                         bin_surfels_stream)
    from streetunveiler_tpu.ops.rasterizer.types import RasterizeSettings

    n = 300_000
    W, H, f = 1920, 1280, 1000.0
    pts, scales, quats, opac, cols, _ = build_scene(n)
    w2c = jnp.eye(4)
    full_cap = default_duplicate_capacity(n, W, H)

    def slab_duplicates(n_tile):
        """Measured duplicates/visits of each slab crop (exact crop via
        principal-point shift, as parallel/shard.py does)."""
        slab = H // n_tile
        cap = (full_cap if n_tile == 1
               else -(-(2 * full_cap // n_tile) // 128) * 128)
        dups, visits, ovf = [], [], 0
        for t in range(n_tile):
            K = jnp.array([[f, 0, W / 2], [0, f, H / 2 - t * slab],
                           [0, 0, 1]], jnp.float32)
            st = RasterizeSettings(width=W, height=slab, znear=0.2,
                                   zfar=100.0)
            sur = preprocess_surfels(jnp.asarray(pts), jnp.asarray(scales),
                                     jnp.asarray(quats), jnp.asarray(opac),
                                     jnp.asarray(cols), w2c, K, st)
            b = bin_surfels_stream(sur.center2d, sur.ext, sur.depth,
                                   sur.valid, W, slab, TILE_W, TILE_H, cap,
                                   cull=sur.cull)
            n_dup = int(b.tile_offsets[-1])
            dups.append(n_dup)
            visits.append(int(jnp.sum(b.first_of_tile >= 0)))
            ovf += int(b.overflow)
        return cap, dups, visits, ovf

    base = None
    for nd in (1, 2, 4, 8):
        cap, dups, visits, ovf = slab_duplicates(nd)
        tot = sum(dups)
        if base is None:
            base = tot
        print(json.dumps({
            "devices": nd,
            "dup_capacity_per_device": cap,
            "dup_measured_per_device": dups,
            "dup_total_vs_1dev": round(tot / base, 4),
            "sort_rows_per_device": cap,
            "visits_per_device": visits,
            "overflowed_slabs": ovf,
            # shard_preprocess (parallel/shard.py, default on): per-surfel
            # preprocess + record pack run on N/n_tile surfels per device
            # with the FULL camera, all-gathered along 'tile' and
            # slab-shifted (shift_packT / bin_slab_from_inputs) — no
            # duplication. Only the [N] depth argsort inside each slab's
            # binning remains per-device. The factor is nd in the
            # fallback paths (shard_preprocess engages only for nd > 1
            # with N % nd == 0 and a two-phase binning — the sharded
            # loop's defaults; ADVICE r4).
            "preprocess_pack_duplication": 1 if (nd > 1 and n % nd == 0)
                                          else nd if nd > 1 else 1,
            "shard_preprocess_engaged": bool(nd > 1 and n % nd == 0),
            "depth_argsort_duplication": nd,
        }), flush=True)


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
    decompose() if "--decompose" in sys.argv else main()
