"""Micro-benchmark: cost of lane reductions inside a Pallas visit kernel.

The fwd blend kernel performs ~13 [P,S]→[P,1] lane reductions per visit
(payload sums, alpha/depth/moment accumulators, median/lk maxima). This
measures, per visit of a [P,S] block: (a) k separate VPU lane reductions,
(b) the same k folded into ONE MXU matmul against a [S,128] channel
matrix, (c) a ~25-op elementwise chain as the pair-math yardstick.
Run on the real TPU: python tools/micro_reduce.py
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P, S = 512, 128
NV = 4096
ITERS = 5


def timeit(fn, x):
    r = fn(x)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = fn(x)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / ITERS


def build(mode, k):
    def kern(x_ref, o_ref):
        v = pl.program_id(0)

        @pl.when(v == 0)
        def _():
            o_ref[...] = jnp.zeros((P, 128), jnp.float32)

        x = x_ref[...]
        if mode == "vpu":
            outs = [jnp.sum(x * (1.0 + 0.01 * i), axis=1, keepdims=True)
                    for i in range(k)]
            pad = [jnp.zeros((P, 128 - k), jnp.float32)]
            o_ref[...] = o_ref[...] + jnp.concatenate(outs + pad, axis=1)
        elif mode == "mxu":
            iota = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)
            g = jnp.where(iota < k,
                          1.0 + 0.01 * iota.astype(jnp.float32), 0.0)
            o_ref[...] = o_ref[...] + jax.lax.dot_general(
                x, g, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
        elif mode == "pair":
            y = x
            for _ in range(25):
                y = y * 1.0001 + 0.001
            o_ref[...] = o_ref[...] + jnp.concatenate(
                [jnp.sum(y, axis=1, keepdims=True),
                 jnp.zeros((P, 127), jnp.float32)], axis=1)

    @jax.jit
    def run(x):
        def body(i, acc):
            out = pl.pallas_call(
                kern,
                grid=(NV,),
                in_specs=[pl.BlockSpec((P, S), lambda v: (0, v),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((P, 128), lambda v: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((P, 128), jnp.float32),
            )(x + acc * 1e-30)
            return acc + out[0, 0] * 1e-20

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    return run


def main():
    x = jnp.asarray(
        np.random.default_rng(0).random((P, NV * S)).astype(np.float32))
    for mode, k in [("pair", 0), ("vpu", 4), ("vpu", 8), ("vpu", 13),
                    ("mxu", 8), ("mxu", 13)]:
        t = timeit(build(mode, k), x)
        print(f"{mode:4s} k={k:2d}: {t*1e3:7.2f} ms "
              f"({t/NV*1e9:6.1f} ns/visit)", flush=True)


if __name__ == "__main__":
    main()
