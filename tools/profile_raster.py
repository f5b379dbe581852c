"""Stage breakdown profiler for the rasterizer headline bench.

Times each pipeline stage in isolation (each inside one jitted fori_loop
with an inter-iteration data dependence, like bench.py, to defeat the
axon relay's dispatch overhead and launch dedup).

Usage: python tools/profile_raster.py [n_surfels] [dup_cap_mb]
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
    from streetunveiler_tpu.ops.rasterizer.kernel import (
        S_CHUNK, TILE_H, TILE_W, blend_stream, pack_geometry_T)
    from streetunveiler_tpu.ops.rasterizer.preprocess import preprocess_surfels
    from streetunveiler_tpu.ops.rasterizer.tiles import bin_surfels_stream

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    W, H, f = 1920, 1280, 1000.0
    iters = 5

    pts, scales, quats, opac, cols, sem = build_scene(n)
    args = tuple(map(jnp.asarray, (pts, scales, quats, opac, cols)))
    K = jnp.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], jnp.float32)
    w2c = jnp.eye(4)
    st = RasterizeSettings(width=W, height=H, znear=0.2, zfar=100.0)
    bg = jnp.zeros(3)
    tgt = jnp.zeros((H, W, 3))
    from streetunveiler_tpu.ops.rasterizer.api import \
        default_duplicate_capacity
    dup_cap = (int(sys.argv[2]) * 1024 * 1024 if len(sys.argv) > 2
               else default_duplicate_capacity(n, W, H))

    print(f"n={n} dup_cap={dup_cap} cap_chunks={dup_cap // S_CHUNK}",
          flush=True)

    # ---- count real duplicates / visits (diagnostic)
    @jax.jit
    def count_dups(pts_, scales_, quats_, opac_, cols_):
        sur = preprocess_surfels(pts_, scales_, quats_, opac_, cols_,
                                 w2c, K, st)
        b = bin_surfels_stream(sur.center2d, sur.ext, sur.depth, sur.valid,
                               W, H, TILE_W, TILE_H, dup_cap, 64)
        return (b.tile_offsets[-1], jnp.sum(b.first_of_tile >= 0),
                jnp.sum(sur.valid), b.overflow)
    total_dup, n_vis, n_valid, ovf = map(np.asarray, count_dups(*args))
    print(f"valid_surfels={n_valid} real_duplicates={total_dup} "
          f"real_visits={n_vis} overflow={ovf}", flush=True)

    def loopify(fn, n_iters=iters):
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
        recT = pack_geometry_T(sur, n)
        return jnp.sum(recT) * 1e-12
    print(f"preprocess+pack      {timeit(loopify(s_pre))*1e3:8.2f} ms",
          flush=True)

    # ---- stage: + binning
    def s_bin(eps):
        sur = preprocess_surfels(args[0] + eps, *args[1:], w2c, K, st)
        sg = jax.lax.stop_gradient
        b = bin_surfels_stream(sg(sur.center2d), sg(sur.ext), sg(sur.depth),
                               sur.valid, W, H, TILE_W, TILE_H, dup_cap, 64)
        return (jnp.sum(b.sorted_surfel) + jnp.sum(b.chunk_of_visit)) * 1e-12
    print(f"pre+binning          {timeit(loopify(s_bin))*1e3:8.2f} ms",
          flush=True)

    # ---- stage: + record gather
    def s_gather(eps):
        sur = preprocess_surfels(args[0] + eps, *args[1:], w2c, K, st)
        sg = jax.lax.stop_gradient
        b = bin_surfels_stream(sg(sur.center2d), sg(sur.ext), sg(sur.depth),
                               sur.valid, W, H, TILE_W, TILE_H, dup_cap, 64)
        recT = jnp.take(pack_geometry_T(sur, n), b.sorted_surfel, axis=1)
        return jnp.sum(recT) * 1e-12
    print(f"pre+bin+gatherT      {timeit(loopify(s_gather))*1e3:8.2f} ms",
          flush=True)

    # ---- stage: + blend kernel (no image assembly)
    def s_kern(eps):
        sur = preprocess_surfels(args[0] + eps, *args[1:], w2c, K, st)
        sg = jax.lax.stop_gradient
        b = bin_surfels_stream(sg(sur.center2d), sg(sur.ext), sg(sur.depth),
                               sur.valid, W, H, TILE_W, TILE_H, dup_cap, 64,
                               cull=sg(sur.cull))
        recT = jnp.take(pack_geometry_T(sur, n), b.sorted_surfel, axis=1)
        acc, lk = blend_stream(recT, b.tile_of_visit, b.chunk_of_visit,
                               b.first_of_tile, b.last_of_tile, b.init_rev,
                               b.lane_lo, b.lane_hi,
                               b.tiles_x * b.tiles_y, b.tiles_x, st, False)
        return jnp.sum(acc) * 1e-12
    print(f"pre+bin+gather+kernel{timeit(loopify(s_kern))*1e3:8.2f} ms",
          flush=True)

    # ---- stage: full forward
    def s_fwd(eps):
        out = rasterize(args[0] + eps, *args[1:], w2c, K, st, bg=bg,
                        duplicate_capacity=dup_cap)
        return jnp.sum(out.color) * 1e-12
    print(f"full forward         {timeit(loopify(s_fwd))*1e3:8.2f} ms",
          flush=True)

    # ---- stage: fwd+bwd through gather+kernel only (no assembly/loss)
    def kern_loss(p, *rest):
        sur = preprocess_surfels(p, *rest, w2c, K, st)
        sg = jax.lax.stop_gradient
        b = bin_surfels_stream(sg(sur.center2d), sg(sur.ext), sg(sur.depth),
                               sur.valid, W, H, TILE_W, TILE_H, dup_cap, 64,
                               cull=sg(sur.cull))
        recT = jnp.take(pack_geometry_T(sur, n), b.sorted_surfel, axis=1)
        acc, lk = blend_stream(recT, b.tile_of_visit, b.chunk_of_visit,
                               b.first_of_tile, b.last_of_tile, b.init_rev,
                               b.lane_lo, b.lane_hi,
                               b.tiles_x * b.tiles_y, b.tiles_x, st, False)
        return jnp.sum(acc ** 2)
    kgfn = jax.grad(kern_loss, argnums=(0,))

    @jax.jit
    def s_kgrad_full():
        def body(i, m):
            return m + 1e-12 * kgfn(m, *args[1:])[0]
        return jax.lax.fori_loop(0, iters, body, args[0])
    t_kg = timeit(s_kgrad_full)
    print(f"fwd+bwd no-assembly  {t_kg*1e3:8.2f} ms", flush=True)

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

    # ---- isolated kernel timings with a fixed recT input
    sur = preprocess_surfels(*args, w2c, K, st)
    sg = jax.lax.stop_gradient
    b = jax.jit(lambda: bin_surfels_stream(
        sg(sur.center2d), sg(sur.ext), sg(sur.depth), sur.valid,
        W, H, TILE_W, TILE_H, dup_cap, 64))()
    recT0 = jnp.take(pack_geometry_T(sur, n), b.sorted_surfel, axis=1)
    recT0 = jax.block_until_ready(recT0)
    # NamedTuple int fields crossing a jit boundary come back as arrays —
    # recast to python ints before they reach pallas_call statics
    tiles_x, tiles_y = int(b.tiles_x), int(b.tiles_y)
    num_tiles = tiles_x * tiles_y
    vargs = (b.tile_of_visit, b.chunk_of_visit, b.first_of_tile,
             b.last_of_tile, b.init_rev, b.lane_lo, b.lane_hi)

    @jax.jit
    def s_kfwd(recT):
        def body(i, r):
            acc, lk = blend_stream(r, *vargs, num_tiles, tiles_x, st, False)
            return r + jnp.sum(acc) * 1e-30
        return jax.lax.fori_loop(0, iters, body, recT)
    print(f"blend fwd kernel     {timeit(s_kfwd, recT0)*1e3:8.2f} ms",
          flush=True)

    def kloss(recT):
        acc, lk = blend_stream(recT, *vargs, num_tiles, tiles_x, st, False)
        return jnp.sum(acc ** 2)
    kg = jax.grad(kloss)

    @jax.jit
    def s_kgrad(recT):
        def body(i, r):
            return r + 1e-30 * kg(r)
        return jax.lax.fori_loop(0, iters, body, recT)
    print(f"blend fwd+bwd kernel {timeit(s_kgrad, recT0)*1e3:8.2f} ms",
          flush=True)

    # ---- scatter-add cost (VJP of the take)
    rec_rows = jax.block_until_ready(pack_geometry_T(sur, n))
    idx0 = jax.block_until_ready(b.sorted_surfel)

    def takef(rows):
        return jnp.sum(jnp.take(rows, idx0, axis=1) ** 2)
    tg = jax.grad(takef)

    @jax.jit
    def s_scatter(rows):
        def body(i, r):
            return r + 1e-30 * tg(r)
        return jax.lax.fori_loop(0, iters, body, rows)
    print(f"take fwd + scatter-add bwd {timeit(s_scatter, rec_rows)*1e3:8.2f}"
          " ms", flush=True)


if __name__ == "__main__":
    main()
