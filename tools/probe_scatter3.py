"""Grad-scatter alternatives: what does the [R, cap] → [R, N] column
scatter-add really cost, and can sorted indices / fewer rows / a
gather+segment-sum formulation beat it?

Variants (cap=1.35M, N=300k, matching the bench shape after the 4.5
capacity):
  s24 / s16 / s8      scatter-add with R rows, random indices
  s16_sorted          indices sorted ascending (duplicates remain),
                      indices_are_sorted=True
  take16              lane-major take (the forward gather, reference)
  sort_i32            one (key, payload) sort over cap (what a second
                      binning sort would cost)
  cumsum16            cumsum along lanes of [16, cap] (segment-sum via
                      prefix — numerically unsafe for grads, timing only)

Usage (TPU): python tools/probe_scatter3.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

CAP = 1_351_680
N = 300_000
ITERS = 10


def timeit(fn, *args):
    r = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    r = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / ITERS


def loopify(fn, x0):
    @jax.jit
    def run(x):
        def body(_, c):
            return c * 0.999999 + fn(c)
        return jax.lax.fori_loop(0, ITERS, body, x)
    return run, x0


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N, CAP), jnp.int32)
    idx_sorted = jnp.sort(idx)
    key = jnp.asarray(rng.integers(0, 3200, CAP), jnp.int32)

    for r in (16, 17, 20, 24, 25, 32, 48):
        g = jnp.asarray(rng.normal(size=(r, CAP)), jnp.float32)

        def fn(c, g=g, r=r):
            return jnp.sum(
                jnp.zeros((r, N + 1), jnp.float32).at[:, idx].add(
                    g * c[0, 0])[:, :8], axis=1, keepdims=True)[:1, :1] + c[:1, :1] * 0

        run, x0 = loopify(lambda c, fn=fn: fn(c), g[:1, :1])
        print(f"s{r:<2d} random       {timeit(run, x0)*1e3:8.2f} ms",
              flush=True)

    g16 = jnp.asarray(rng.normal(size=(16, CAP)), jnp.float32)

    def fs(c):
        return jnp.sum(
            jnp.zeros((16, N + 1), jnp.float32).at[:, idx_sorted].add(
                g16 * c[0, 0], indices_are_sorted=True)[:, :8],
            axis=1, keepdims=True)[:1, :1] + c[:1, :1] * 0

    run, x0 = loopify(fs, g16[:1, :1])
    print(f"s16 sorted       {timeit(run, x0)*1e3:8.2f} ms", flush=True)

    big = jnp.asarray(rng.normal(size=(16, N + 1)), jnp.float32)

    def ft(c):
        return jnp.take(big * c[0, 0], idx, axis=1)[:1, :1] + c[:1, :1] * 0

    run, x0 = loopify(ft, big[:1, :1])
    print(f"take16           {timeit(run, x0)*1e3:8.2f} ms", flush=True)

    def fsort(c):
        k2 = key + jnp.int32(c[0, 0] * 0)
        sk, pv = jax.lax.sort((k2, idx), num_keys=1, is_stable=True)
        return (sk[:1] + pv[:1]).astype(jnp.float32)[None] + c[:1, :1] * 0

    run, x0 = loopify(fsort, jnp.ones((1, 1)))
    print(f"sort_i32 pair    {timeit(run, x0)*1e3:8.2f} ms", flush=True)

    def fc(c):
        return jnp.cumsum(g16 * c[0, 0], axis=1)[:1, :1] + c[:1, :1] * 0

    run, x0 = loopify(fc, g16[:1, :1])
    print(f"cumsum16         {timeit(run, x0)*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
