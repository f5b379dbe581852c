"""Micro-benchmarks: sort / gather / scatter / transpose variants on TPU.

Finds the fastest building blocks for tile binning + record assembly.
"""

import sys
import time

import numpy as np


def timeit(fn, *args, iters=3):
    import jax
    r = fn(*args)
    jax.block_until_ready(r)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    cap = 3 * 1024 * 1024
    n = 300_000
    T = 4800
    rng = np.random.default_rng(0)

    # partially-sorted-by-depth-rank tile keys (realistic distribution)
    keys_np = rng.integers(0, T, cap).astype(np.int32)
    pay_np = rng.integers(0, n, cap).astype(np.int32)
    val_np = rng.random(cap) < 0.6
    keys = jnp.asarray(keys_np)
    pay = jnp.asarray(pay_np)
    val = jnp.asarray(val_np)
    table = jnp.asarray(rng.standard_normal((n + 1, 24), dtype=np.float32))
    table128 = jnp.asarray(
        rng.standard_normal((n + 1, 128), dtype=np.float32))
    tableT = table.T

    LOOP = 5

    def rep(fn):
        """jit a 5x data-dependent loop of fn(perturbation)."""
        @jax.jit
        def run():
            def body(i, c):
                return c + fn(c)
            return jax.lax.fori_loop(0, LOOP, body, jnp.float32(0.0))
        return run

    def bench(name, fn):
        t = timeit(rep(fn)) / LOOP
        print(f"{name:46s} {t*1e3:8.2f} ms", flush=True)
        return t

    ikey = (keys + 0).astype(jnp.int32)

    # --- sorts
    bench("sort 1key i32 [3.1M]",
          lambda c: jnp.sum(jax.lax.sort((ikey + c.astype(jnp.int32),),
                                         num_keys=1, is_stable=True)[0])
          * 1e-12)
    bench("sort key+payload stable",
          lambda c: jnp.sum(jax.lax.sort(
              (ikey + c.astype(jnp.int32), pay), num_keys=1,
              is_stable=True)[1]) * 1e-12)
    bench("sort key+payload+bool stable (current)",
          lambda c: jnp.sum(jax.lax.sort(
              (ikey + c.astype(jnp.int32), pay, val), num_keys=1,
              is_stable=True)[1]) * 1e-12)
    bench("sort key+payload UNstable",
          lambda c: jnp.sum(jax.lax.sort(
              (ikey + c.astype(jnp.int32), pay), num_keys=1,
              is_stable=False)[1]) * 1e-12)
    # packed single-key trick: key*2^k + rank bits fused in f-order?
    pk = (ikey.astype(jnp.float32) * 8.0)
    bench("sort 1key f32 [3.1M]",
          lambda c: jnp.sum(jax.lax.sort((pk + c,), num_keys=1,
                                         is_stable=True)[0]) * 1e-12)
    bench("argsort i32 [300k]",
          lambda c: jnp.sum(jnp.argsort(pay[:n] + c.astype(jnp.int32)))
          * 1e-12)
    bench("sort 2key (tile,depth) + idx (old path)",
          lambda c: jnp.sum(jax.lax.sort(
              (ikey + c.astype(jnp.int32), pk, pay), num_keys=2,
              is_stable=False)[2]) * 1e-12)

    # --- gathers
    bench("gather [n,24] by idx[3.1M]",
          lambda c: jnp.sum(jnp.take(table + c, pay % (n + 1), axis=0))
          * 1e-12)
    bench("gather [n,24] + transpose (current)",
          lambda c: jnp.sum(jnp.take(table + c, pay % (n + 1), axis=0).T
                            * 2.0) * 1e-12)
    bench("gather [n,128] by idx[3.1M]",
          lambda c: jnp.sum(jnp.take(table128 + c, pay % (n + 1), axis=0))
          * 1e-12)
    bench("gather axis1 [24,n] by idx[3.1M]",
          lambda c: jnp.sum(jnp.take(tableT + c, pay % (n + 1), axis=1))
          * 1e-12)
    sorted_idx = jnp.sort(pay % (n + 1))
    bench("gather [n,24] by SORTED idx",
          lambda c: jnp.sum(jnp.take(table + c, sorted_idx, axis=0))
          * 1e-12)
    bench("transpose [3.1M,24]->[24,3.1M]",
          lambda c: jnp.sum((jnp.broadcast_to(
              c, (cap, 24)) + 1.0).T * 2.0) * 1e-12)

    # --- scatters
    perm = jnp.asarray(rng.permutation(cap).astype(np.int32))
    src = jnp.asarray(rng.standard_normal(cap, dtype=np.float32))
    bench("scatter unique perm [3.1M] f32",
          lambda c: jnp.sum(jnp.zeros(cap).at[perm].set(
              src + c, unique_indices=True)) * 1e-12)
    bench("scatter-add dup idx [3.1M]->[300k] f32",
          lambda c: jnp.sum(jnp.zeros(n + 1).at[pay].add(src + c))
          * 1e-12)
    bench("scatter-add rows [3.1M,24]->[300k,24]",
          lambda c: jnp.sum(jnp.zeros((n + 1, 24)).at[pay].add(
              jnp.broadcast_to((src + c)[:, None], (cap, 24)))) * 1e-12)
    # segment-sum alternative for the grad reduction:
    bench("sort(pay)+segsum rows[3.1M,24]",
          lambda c: jnp.sum(jax.ops.segment_sum(
              jnp.broadcast_to((src + c)[:, None], (cap, 24)),
              sorted_idx, num_segments=n + 1,
              indices_are_sorted=True)) * 1e-12)
    bench("cumsum f32 [3.1M]", lambda c: jnp.sum(jnp.cumsum(src + c))
          * 1e-12)
    bench("cumsum i32 [4800]",
          lambda c: jnp.sum(jnp.cumsum(ikey[:T] + c.astype(jnp.int32)))
          * 1e-12)
    bench("searchsorted [3.1M] in [4801]",
          lambda c: jnp.sum(jnp.searchsorted(
              jnp.sort(ikey), jnp.arange(T + 1) + c.astype(jnp.int32)))
          * 1e-12)


if __name__ == "__main__":
    main()
