"""Stage breakdown profiler for the rasterizer headline bench.

Times each pipeline stage in isolation (each inside one jitted fori_loop
with an inter-iteration data dependence, like bench.py, to defeat the
axon relay's dispatch overhead and launch dedup).

Usage: python tools/profile_raster.py [n_surfels] [dup_cap_multiple]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import build_scene  # noqa: E402


def timeit(fn, *args, iters=5):
    import jax
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from streetunveiler_tpu.ops.rasterizer import RasterizeSettings, rasterize
    from streetunveiler_tpu.ops.rasterizer.api import default_duplicate_capacity
    from streetunveiler_tpu.ops.rasterizer.kernel import (
        S_CHUNK, blend_core, build_aligned, pack_geometry)
    from streetunveiler_tpu.ops.rasterizer.preprocess import preprocess_surfels
    from streetunveiler_tpu.ops.rasterizer.tiles import bin_surfels_exact
    from streetunveiler_tpu.ops.rasterizer.kernel import TILE_H, TILE_W

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    W, H, f = 1920, 1280, 1000.0
    iters = 5

    pts, scales, quats, opac, cols = build_scene(n)
    args = tuple(map(jnp.asarray, (pts, scales, quats, opac, cols)))
    K = jnp.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], jnp.float32)
    w2c = jnp.eye(4)
    st = RasterizeSettings(width=W, height=H, znear=0.2, zfar=100.0)
    bg = jnp.zeros(3)
    tgt = jnp.zeros((H, W, 3))
    dup_cap = 3 * 1024 * 1024

    print(f"n={n} dup_cap={dup_cap} cap_chunks={dup_cap // S_CHUNK}",
          flush=True)

    # ---- count real duplicates (diagnostic)
    @jax.jit
    def count_dups(pts_, scales_, quats_, opac_, cols_):
        sur = preprocess_surfels(pts_, scales_, quats_, opac_, cols_,
                                 w2c, K, st)
        binning = bin_surfels_exact(sur.center2d, sur.radius, sur.depth,
                                    sur.valid, W, H, TILE_W, TILE_H,
                                    dup_cap, 64)
        aligned = build_aligned(binning, n, S_CHUNK, dup_cap)
        return (binning.tile_offsets[-1], aligned.chunk_offsets[-1],
                jnp.sum(sur.valid))
    total_dup, total_chunks, n_valid = map(int, count_dups(*args))
    print(f"valid_surfels={n_valid} real_duplicates={total_dup} "
          f"real_chunks={total_chunks} (of {dup_cap // S_CHUNK})", flush=True)

    def loopify(fn, n_iters=iters):
        """Wrap fn(perturb_scalar) in a jitted data-dependent loop."""
        @jax.jit
        def run():
            def body(i, carry):
                out = fn(carry * 1e-30)
                return carry + out
            return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0.0))
        return run

    # ---- stage: preprocess + pack
    def s_pre(eps):
        sur = preprocess_surfels(args[0] + eps, *args[1:], w2c, K, st)
        rec_rows = pack_geometry(sur, n)
        return jnp.sum(rec_rows) * 1e-12
    t_pre = timeit(loopify(s_pre))
    print(f"preprocess+pack      {t_pre*1e3:8.2f} ms", flush=True)

    # ---- stage: binning (argsort + big sort)
    def s_bin(eps):
        sur = preprocess_surfels(args[0] + eps, *args[1:], w2c, K, st)
        sg = jax.lax.stop_gradient
        binning = bin_surfels_exact(sg(sur.center2d), sg(sur.radius),
                                    sg(sur.depth), sur.valid, W, H,
                                    TILE_W, TILE_H, dup_cap, 64)
        return jnp.sum(binning.sorted_surfel) * 1e-12
    t_bin = timeit(loopify(s_bin))
    print(f"pre+binning          {t_bin*1e3:8.2f} ms", flush=True)

    # ---- stage: + aligned + gather + transpose
    def s_gather(eps):
        sur = preprocess_surfels(args[0] + eps, *args[1:], w2c, K, st)
        sg = jax.lax.stop_gradient
        binning = bin_surfels_exact(sg(sur.center2d), sg(sur.radius),
                                    sg(sur.depth), sur.valid, W, H,
                                    TILE_W, TILE_H, dup_cap, 64)
        aligned = build_aligned(binning, n, S_CHUNK, dup_cap)
        rec_rows = pack_geometry(sur, n)
        rec = jnp.take(rec_rows, aligned.surfel_idx, axis=0)
        recT = rec.T
        return jnp.sum(recT) * 1e-12
    t_gat = timeit(loopify(s_gather))
    print(f"pre+bin+gatherT      {t_gat*1e3:8.2f} ms", flush=True)

    # ---- stage: full forward
    def s_fwd(eps):
        out = rasterize(args[0] + eps, *args[1:], w2c, K, st, bg=bg,
                        duplicate_capacity=dup_cap)
        return jnp.sum(out.color) * 1e-12
    t_fwd = timeit(loopify(s_fwd))
    print(f"full forward         {t_fwd*1e3:8.2f} ms", flush=True)

    # ---- stage: full fwd+bwd (the bench's measurement)
    def loss(p, *rest):
        out = rasterize(p, *rest, w2c, K, st, bg=bg,
                        duplicate_capacity=dup_cap)
        return (jnp.sum((out.color - tgt) ** 2)
                + 0.01 * jnp.sum(out.distortion)
                + 0.01 * jnp.sum(out.normal ** 2))
    gfn = jax.grad(loss, argnums=(0,))

    @jax.jit
    def s_grad():
        def body(i, m):
            return m + 1e-12 * gfn(m, *args[1:])[0]
        return jax.lax.fori_loop(0, iters, body, args[0])
    t_all = timeit(s_grad)
    print(f"full fwd+bwd         {t_all*1e3:8.2f} ms "
          f"({W*H/t_all/1e6:.2f}M rays/s)", flush=True)

    # ---- isolated kernel timings with fixed recT input
    sur = preprocess_surfels(*args, w2c, K, st)
    sg = jax.lax.stop_gradient
    binning = jax.jit(lambda: bin_surfels_exact(
        sg(sur.center2d), sg(sur.radius), sg(sur.depth), sur.valid,
        W, H, TILE_W, TILE_H, dup_cap, 64))()
    aligned = build_aligned(binning, n, S_CHUNK, dup_cap)
    rec_rows = pack_geometry(sur, n)
    recT0 = jnp.take(rec_rows, aligned.surfel_idx, axis=0).T
    recT0 = jax.block_until_ready(recT0)
    num_tiles = aligned.num_tiles_x * aligned.num_tiles_y

    def s_kfwd(recT):
        @jax.jit
        def run(recT):
            def body(i, r):
                acc, lk = blend_core(r, aligned.tile_of_chunk,
                                     aligned.first_of_tile,
                                     aligned.last_of_tile, num_tiles,
                                     aligned.num_tiles_x, st, False)
                return r + jnp.sum(acc) * 1e-30
            return jax.lax.fori_loop(0, iters, body, recT)
        return run(recT)
    t_kf = timeit(s_kfwd, recT0)
    print(f"blend fwd kernel     {t_kf*1e3:8.2f} ms", flush=True)

    def kloss(recT):
        acc, lk = blend_core(recT, aligned.tile_of_chunk,
                             aligned.first_of_tile, aligned.last_of_tile,
                             num_tiles, aligned.num_tiles_x, st, False)
        return jnp.sum(acc ** 2)
    kg = jax.grad(kloss)

    @jax.jit
    def s_kgrad(recT):
        def body(i, r):
            return r + 1e-30 * kg(r)
        return jax.lax.fori_loop(0, iters, body, recT)
    t_kg = timeit(s_kgrad, recT0)
    print(f"blend fwd+bwd kernel {t_kg*1e3:8.2f} ms", flush=True)

    # ---- scatter-add cost (VJP of the take)
    idx0 = jax.block_until_ready(aligned.surfel_idx)
    def takef(rows):
        return jnp.sum(jnp.take(rows, idx0, axis=0) ** 2)
    tg = jax.grad(takef)

    @jax.jit
    def s_scatter(rows):
        def body(i, r):
            return r + 1e-30 * tg(r)
        return jax.lax.fori_loop(0, iters, body, rows)
    t_sc = timeit(s_scatter, rec_rows)
    print(f"take fwd + scatter-add bwd {t_sc*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
