"""Measure duplicate-grad reduction strategies (the take-VJP scatter-add).

The train step's gradient path scatter-adds [REC, cap] record-grads back
to [REC, N] surfel rows (cap ~ 1.8M, ~5.4 dups/surfel). Variants:

  axis1   : take/scatter along lanes of [REC, cap]   (production today)
  axis0   : take/scatter rows of [cap, REC]
  segsum  : jax.ops.segment_sum over surfel-sorted rows
  psort   : sort (surfel_id, dup_row) then segment_sum (includes sort)

Run: python tools/micro_scatter.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

REC = 24
N = 300_000
CAP = 1_802_112
ITERS = 5


def timeit(fn, *a):
    r = fn(*a)
    jax.block_until_ready(r)
    a2 = (a[0] * (1.0 + 1e-6),) + a[1:]
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*a2))
    return (time.perf_counter() - t0) / ITERS


def main():
    rng = np.random.default_rng(int(time.time()))
    # realistic duplicate map: each surfel ~CAP/N dups, tile-sorted order
    idx = np.sort(rng.integers(0, N, CAP)).astype(np.int32)
    rng.shuffle(idx)  # tile order decorrelates from surfel order
    idx = jnp.asarray(idx)
    g1 = jnp.asarray(rng.random((REC, CAP), np.float32))
    g0 = jnp.asarray(np.ascontiguousarray(np.asarray(g1).T))

    @jax.jit
    def axis1(g, idx):
        def body(i, c):
            out = jnp.zeros((REC, N + 1), jnp.float32).at[:, idx].add(
                g + c * 1e-30)
            return c + out[0, 0] * 1e-20
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    @jax.jit
    def axis0(g, idx):
        def body(i, c):
            out = jnp.zeros((N + 1, REC), jnp.float32).at[idx].add(
                g + c * 1e-30)
            return c + out[0, 0] * 1e-20
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    @jax.jit
    def take1(g, idx):
        def body(i, c):
            out = jnp.take(g + c * 1e-30, idx, axis=1)
            return c + out[0, 0] * 1e-20
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    @jax.jit
    def take0(g, idx):
        def body(i, c):
            out = jnp.take(g + c * 1e-30, idx, axis=0)
            return c + out[0, 0] * 1e-20
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    @jax.jit
    def segsum(g, sidx):
        # pretend rows already surfel-sorted: pure segment_sum cost
        def body(i, c):
            out = jax.ops.segment_sum(g + c * 1e-30, sidx,
                                      num_segments=N + 1,
                                      indices_are_sorted=True)
            return c + out[0, 0] * 1e-20
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    @jax.jit
    def psort(g, idx):
        def body(i, c):
            sid, pos = jax.lax.sort((idx, jnp.arange(CAP, dtype=jnp.int32)),
                                    num_keys=1)
            rows = jnp.take(g + c * 1e-30, pos, axis=0)
            out = jax.ops.segment_sum(rows, sid, num_segments=N + 1,
                                      indices_are_sorted=True)
            return c + out[0, 0] * 1e-20
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    sidx = jnp.sort(idx)
    for name, fn, a in [("take axis1", take1, (g1, idx)),
                        ("take axis0", take0, (g0, idx)),
                        ("scatter axis1", axis1, (g1, idx)),
                        ("scatter axis0", axis0, (g0, idx)),
                        ("segsum sorted", segsum, (g0, sidx)),
                        ("sort+take+segsum", psort, (g0, idx))]:
        t = timeit(fn, *a)
        print(f"{name:18s}: {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
