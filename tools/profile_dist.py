"""Isolated timings of the fused multi-gate distortion kernel.

Times the merged gated blend (blend_stream with n_gates=G) fwd and
fwd+bwd against the plain blend on the bench scene (clustered
semantics), sharing one binning — attributes the fused class-dist cost
inside the late-phase train step.

Usage: python tools/profile_dist.py [n_surfels]
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
    from streetunveiler_tpu.ops.rasterizer import RasterizeSettings
    from streetunveiler_tpu.ops.rasterizer.api import \
        default_duplicate_capacity
    from streetunveiler_tpu.ops.rasterizer.kernel import (
        NQ, Q_ROW0, TILE_H, TILE_W, blend_stream, pack_geometry_T)
    from streetunveiler_tpu.ops.rasterizer.preprocess import \
        preprocess_surfels
    from streetunveiler_tpu.ops.rasterizer.tiles import bin_surfels_stream

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    W, H, f = 1920, 1280, 1000.0
    iters = 5
    G = 5

    pts, scales, quats, opac, cols, sem = build_scene(n)
    args = tuple(map(jnp.asarray, (pts, scales, quats, opac, cols)))
    K = jnp.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], jnp.float32)
    w2c = jnp.eye(4)
    st = RasterizeSettings(width=W, height=H, znear=0.2, zfar=100.0)
    dup_cap = default_duplicate_capacity(n, W, H)

    # class gates like train/step.py: class g membership (sky excluded)
    gates = np.zeros((n, G), np.float32)
    cls = np.where(sem >= 4, sem - 1, sem)  # concerned ids minus sky slot
    gates[np.arange(n), np.clip(cls, 0, G - 1)] = 1.0
    powers = jnp.asarray(2.0 ** np.arange(G), jnp.float32)
    grow = jnp.asarray(gates) @ powers[:, None]

    sur = preprocess_surfels(*args, w2c, K, st)
    sg = jax.lax.stop_gradient
    b = jax.jit(lambda: bin_surfels_stream(
        sg(sur.center2d), sg(sur.ext), sg(sur.depth), sur.valid,
        W, H, TILE_W, TILE_H, dup_cap, 64))()
    recT0 = jnp.take(pack_geometry_T(sur, n, grow), b.sorted_surfel, axis=1)
    recT0 = jax.block_until_ready(recT0)
    tiles_x, tiles_y = int(b.tiles_x), int(b.tiles_y)
    num_tiles = tiles_x * tiles_y
    vargs = (b.tile_of_visit, b.chunk_of_visit, b.first_of_tile,
             b.last_of_tile, b.init_rev, b.lane_lo, b.lane_hi)
    nq = NQ + 1
    gate_row = Q_ROW0 + nq

    # visit-level class statistics (how often does the per-class skip fire)
    tov = np.asarray(b.tile_of_visit)
    lo, hi = np.asarray(b.lane_lo), np.asarray(b.lane_hi)
    cov = np.asarray(b.chunk_of_visit)
    ss = np.asarray(b.sorted_surfel)
    gnp = gates
    fot = np.asarray(b.first_of_tile)
    ksum, nreal = 0, 0
    for v in range(len(tov)):
        if fot[v] < 0:
            continue
        lanes = ss[cov[v] * 128 + lo[v]:cov[v] * 128 + hi[v]]
        lanes = lanes[lanes < n]
        if len(lanes):
            ksum += int(gnp[lanes].max(0).sum())
            nreal += 1
    print(f"visits={nreal} mean_classes_per_visit={ksum / max(nreal,1):.2f}",
          flush=True)

    @jax.jit
    def s_fwd_main(recT):
        def body(i, r):
            acc, lk = blend_stream(r, *vargs, num_tiles, tiles_x, st,
                                   False, nq)
            return r + jnp.sum(acc) * 1e-30
        return jax.lax.fori_loop(0, iters, body, recT)
    print(f"main blend fwd       {timeit(s_fwd_main, recT0)*1e3:8.2f} ms",
          flush=True)

    def kloss(recT):
        acc, _ = blend_stream(recT, *vargs, num_tiles, tiles_x, st,
                              False, nq)
        return jnp.sum(acc ** 2)
    gmain = jax.grad(kloss)

    @jax.jit
    def s_grad_main(recT):
        def body(i, r):
            return r + 1e-12 * gmain(r)
        return jax.lax.fori_loop(0, iters, body, recT)
    print(f"main blend fwd+bwd   {timeit(s_grad_main, recT0)*1e3:8.2f} ms",
          flush=True)

    @jax.jit
    def s_fwd_dist(recT):
        def body(i, r):
            acc, lk = blend_stream(r, *vargs, num_tiles, tiles_x, st,
                                   False, nq, G, gate_row)
            return r + jnp.sum(acc) * 1e-30
        return jax.lax.fori_loop(0, iters, body, recT)
    print(f"merged blend fwd     {timeit(s_fwd_dist, recT0)*1e3:8.2f} ms",
          flush=True)

    def dloss(recT):
        acc, _ = blend_stream(recT, *vargs, num_tiles, tiles_x, st,
                              False, nq, G, gate_row)
        # exclude the non-diff per-class lk channels from the cotangent
        from streetunveiler_tpu.ops.rasterizer.kernel import ch_for
        mask = jnp.concatenate([jnp.ones(ch_for(nq)),
                                jnp.tile(jnp.asarray([1.0, 1.0, 1.0, 0.0]),
                                         G)])
        return jnp.sum((acc * mask) ** 2)
    gdist = jax.grad(dloss)

    @jax.jit
    def s_grad_dist(recT):
        def body(i, r):
            return r + 1e-12 * gdist(r)
        return jax.lax.fori_loop(0, iters, body, recT)
    print(f"merged blend fwd+bwd {timeit(s_grad_dist, recT0)*1e3:8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
