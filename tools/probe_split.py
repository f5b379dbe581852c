"""Does a two-phase step (binning jit | grad jit) remove the prefetch tax?

probe_prefetch/probe_compose* established: visit arrays computed inside
the SAME executable as the blend kernels cost ~13 ms/direction extra
(Mosaic dynamic scalar prefetch); as top-level jit ARGUMENTS they cost
nothing; Pallas-identity laundering does NOT help. The remaining move is
to split the step into two executables:

    jit_bin  : preprocess (stop-grad) + tile binning -> StreamBinning
    jit_grad : preprocess + pack + blend fwd/bwd + loss grad,
               taking the visit arrays as arguments

This probe times the production single-jit fwd+bwd step against the
two-phase step, chained host-side over ITERS distinct inputs (dispatch
is async; distinct inputs defeat the relay's launch dedup).

Usage: python tools/probe_split.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bench import build_scene
from streetunveiler_tpu.ops.rasterizer import RasterizeSettings, rasterize
from streetunveiler_tpu.ops.rasterizer.api import (bin_for_camera,
                                                   default_duplicate_capacity)

ITERS = 10
N = 300_000


def main():
    W, H, f = 1920, 1280, 1000.0
    pts, scales, quats, opac, cols, sem = build_scene(N)
    args = tuple(map(jnp.asarray, (pts, scales, quats, opac, cols)))
    K = jnp.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], jnp.float32)
    w2c = jnp.eye(4)
    st = RasterizeSettings(width=W, height=H, znear=0.2, zfar=100.0)
    bg = jnp.zeros(3)
    tgt = jnp.zeros((H, W, 3))
    dup_cap = default_duplicate_capacity(N, W, H)

    def loss(m, sc, q, o, c, binning=None):
        out = rasterize(m, sc, q, o, c, w2c, K, st, bg=bg,
                        duplicate_capacity=dup_cap, binning=binning)
        return (jnp.sum((out.color - tgt) ** 2)
                + 0.01 * jnp.sum(out.distortion)
                + 0.01 * jnp.sum(out.normal ** 2))

    # ---- production single-jit step, fori_loop timing (bench.py form)
    gfn = jax.grad(loss, argnums=(0,))

    @jax.jit
    def single(m, *rest):
        def body(_, mm):
            return mm + 1e-12 * gfn(mm, *rest)[0]
        return jax.lax.fori_loop(0, ITERS, body, m)

    r = jax.block_until_ready(single(*args))
    a2 = (args[0] + 1e-6,) + args[1:]
    t0 = time.perf_counter()
    jax.block_until_ready(single(*a2))
    t_single = (time.perf_counter() - t0) / ITERS
    print(f"single-jit step : {t_single*1e3:8.2f} ms "
          f"({W*H/t_single/1e6:.2f}M rays/s)", flush=True)

    # ---- two-phase step
    jit_bin = jax.jit(lambda m, sc, q, o: bin_for_camera(
        m, sc, q, o, w2c, K, st, duplicate_capacity=dup_cap))
    gfn2 = jax.grad(loss, argnums=(0,))

    @jax.jit
    def jit_grad(m, sc, q, o, c, binning):
        return gfn2(m, sc, q, o, c, binning=binning)[0]

    b0 = jit_bin(*args[:4])   # tiles_x/tiles_y are static aux-data now
    jax.block_until_ready(jit_grad(*args, b0))

    # distinct device-resident inputs (defeat dedup, no eager glue)
    inputs = [jax.block_until_ready(args[0] + i * 1e-6)
              for i in range(ITERS)]
    outs = []
    t0 = time.perf_counter()
    for i in range(ITERS):
        b = jit_bin(inputs[i], *args[1:4])
        outs.append(jit_grad(inputs[i], *args[1:], b))
    for o in outs:
        jax.block_until_ready(o)
    t_two = (time.perf_counter() - t0) / ITERS
    print(f"two-phase step  : {t_two*1e3:8.2f} ms "
          f"({W*H/t_two/1e6:.2f}M rays/s)", flush=True)


if __name__ == "__main__":
    main()
