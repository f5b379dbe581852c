"""Decompose the fwd blend kernel's per-grid-step floor overhead.

The stage profiler shows ~55ms of the 88.7ms forward kernel survives with
a trivial body — ~3µs per grid step of pipeline overhead. This measures
floor variants to find what composes it: dynamic out-block maps, number
of output buffers, scalar-prefetch count, scratch, and block width.

Run on the real TPU: python tools/micro_floor.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REC, S, PIX, CH = 24, 128, 512, 12
ITERS = 5


def timeit(fn, *a):
    # perturb the first (float) arg on the timed call: the axon relay
    # dedupes identical repeated launches (bench.py does the same)
    r = fn(*a)
    jax.block_until_ready(r)
    a2 = (a[0] + 1e-6,) + a[1:]
    t0 = time.perf_counter()
    r = fn(*a2)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / ITERS


def make_visits(n_dup_chunks, n_tiles, vcap):
    """Realistic visit stream: ~3.2 visits/tile, consecutive chunks."""
    rng = np.random.default_rng(0)
    tile_of, chunk_of, first = [], [], []
    c = 0
    for t in range(n_tiles):
        k = 1 + int(rng.random() < 0.5) + int(rng.random() < 0.5)
        for j in range(k):
            tile_of.append(t)
            chunk_of.append(min(c, n_dup_chunks - 1))
            first.append(1 if j == 0 else 0)
            if j < k - 1:
                c += 1
        c += 1
    n = len(tile_of)
    tile_of += [0] * (vcap - n)
    chunk_of += [n_dup_chunks - 1] * (vcap - n)
    first += [-1] * (vcap - n)
    return (np.asarray(tile_of, np.int32), np.asarray(chunk_of, np.int32),
            np.asarray(first, np.int32), n)


def build_visit(variant, vcap, n_tiles):
    """Visit-stream floors. variant: base | one_out | static_out |
    no_scratch | prefetch2"""
    n_out = 2 if variant == "base" else 1
    use_scratch = variant not in ("no_scratch",)
    npre = 2 if variant == "prefetch2" else 3

    def kern(*refs):
        sref = refs[:npre]
        rec_ref = refs[npre]
        outs = refs[npre + 1:npre + 1 + n_out]
        v = pl.program_id(0)
        if npre == 3:
            first = sref[2][v]

            @pl.when(first > 0)
            def _():
                for o in outs:
                    o[0] = jnp.zeros_like(o[0])
                if use_scratch and variant == "alldone":
                    refs[-1][:, 1:2] = jnp.zeros((PIX, 1), jnp.float32)

            if variant == "alldone":
                # replicate the real kernel's tile-wide skip: a SCALAR
                # read of vector scratch gating the body
                alldone = refs[-1][0, 1] > 1.5
                skip = jnp.logical_or(alldone, first < 0)

                @pl.when(jnp.logical_not(skip))
                def _():
                    outs[0][0] = outs[0][0] + jnp.sum(rec_ref[:, :]) * 1e-30
                    refs[-1][:, 0:1] = refs[-1][:, 0:1] * 0.999
            else:
                @pl.when(first >= 0)
                def _():
                    outs[0][0] = (outs[0][0]
                                  + jnp.sum(rec_ref[:, :]) * 1e-30)
                    if use_scratch:
                        refs[-1][:, 0:1] = refs[-1][:, 0:1] * 0.999
        else:
            outs[0][0] = outs[0][0] + jnp.sum(rec_ref[:, :]) * 1e-30
            if use_scratch:
                refs[-1][:, 0:1] = refs[-1][:, 0:1] * 0.999

    omap = ((lambda v, *s: (0, 0, 0)) if variant == "static_out"
            else (lambda v, *s: (s[0][v], 0, 0)))
    out_specs = [pl.BlockSpec((1, PIX, CH), omap,
                              memory_space=pltpu.VMEM)] * n_out
    out_shape = [jax.ShapeDtypeStruct((n_tiles, PIX, CH), jnp.float32)
                 ] * n_out
    scratch = [pltpu.VMEM((PIX, 8), jnp.float32)] if use_scratch else []

    def run(recT, tile_of, chunk_of, first):
        pre = (tile_of, chunk_of) if npre == 2 else (tile_of, chunk_of,
                                                     first)
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=npre,
                grid=(vcap,),
                in_specs=[pl.BlockSpec((REC, S),
                                       lambda v, *s: (0, s[1][v]),
                                       memory_space=pltpu.VMEM)],
                out_specs=out_specs,
                scratch_shapes=scratch,
            ),
            out_shape=out_shape,
        )(*pre, recT)

    @jax.jit
    def loop(recT, tile_of, chunk_of, first):
        def body(i, c):
            out = run(recT + c * 1e-30, tile_of, chunk_of, first)
            o0 = out[0] if isinstance(out, (list, tuple)) else out
            return c + o0[0, 0, 0] * 1e-20
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    return loop


def build_linear(sblock, total_lanes, n_tiles):
    """Linear stream walk, one out block revisited per ~3 steps: isolates
    step-count scaling (same total bytes, varying block width)."""
    grid = total_lanes // sblock

    def kern(t_ref, rec_ref, o_ref):
        o_ref[0] = o_ref[0] + jnp.sum(rec_ref[:, :]) * 1e-30

    def run(recT, tile_map):
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(grid,),
                in_specs=[pl.BlockSpec((REC, sblock),
                                       lambda v, t: (0, v),
                                       memory_space=pltpu.VMEM)],
                out_specs=[pl.BlockSpec((1, PIX, CH),
                                        lambda v, t: (t[v], 0, 0),
                                        memory_space=pltpu.VMEM)],
            ),
            out_shape=[jax.ShapeDtypeStruct((n_tiles, PIX, CH),
                                            jnp.float32)],
        )(tile_map, recT)

    @jax.jit
    def loop(recT, tile_map):
        def body(i, c):
            out = run(recT + c * 1e-30, tile_map)
            return c + out[0][0, 0, 0] * 1e-20
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    return loop, grid


def main():
    n_chunks = 14080
    n_tiles = 4800
    tile_of, chunk_of, first, nreal = make_visits(n_chunks - 1, n_tiles,
                                                  18880)
    vcap = len(tile_of)
    recT = jnp.asarray(np.random.default_rng(1).random(
        (REC, n_chunks * S)).astype(np.float32))
    args = (recT, jnp.asarray(tile_of), jnp.asarray(chunk_of),
            jnp.asarray(first))
    print(f"vcap={vcap} real={nreal} chunks={n_chunks}", flush=True)
    for variant in ["base", "alldone", "one_out", "static_out",
                    "no_scratch", "prefetch2"]:
        t = timeit(build_visit(variant, vcap, n_tiles), *args)
        print(f"{variant:12s}: {t*1e3:7.2f} ms ({t/vcap*1e9:6.0f} ns/step)",
              flush=True)
    total = n_chunks * S
    for sb in (128, 256, 512):
        grid_n = total // sb
        tile_map = jnp.asarray(
            np.minimum(np.arange(grid_n) * n_tiles // grid_n,
                       n_tiles - 1).astype(np.int32))
        fn, grid_n = build_linear(sb, total, n_tiles)
        t = timeit(fn, recT, tile_map)
        print(f"linear sb={sb:3d} (grid {grid_n:5d}): {t*1e3:7.2f} ms "
              f"({t/grid_n*1e9:6.0f} ns/step)", flush=True)


if __name__ == "__main__":
    main()
