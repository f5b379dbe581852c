"""Micro-bench: per-chunk prefix-sum strategies inside a Pallas kernel.

Simulates the blend kernel's hot structure: grid over 17k chunks, each
loading a [24,128] record block, producing [512,128] pair values, running
4 lane-axis prefix sums + reductions into a [512, 16] accumulator.

Variants: matmul HIGHEST / X3 / DEFAULT, roll-based Hillis-Steele.
"""

import functools
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P, S, REC = 512, 128, 24
    NCHUNK = 16896
    NT = 256  # fake tiles (every 66 chunks -> new tile block)

    def prefix_mat(s, dtype=jnp.float32):
        j = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
        i = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        return (j < i).astype(dtype)

    def cumsum_roll_excl(x):
        # exclusive prefix sum along lanes via Hillis-Steele shifts
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        # shift right by 1 (exclusive)
        y = pltpu.roll(x, 1, 1)
        y = jnp.where(lane >= 1, y, 0.0)
        for d in (1, 2, 4, 8, 16, 32, 64):
            z = pltpu.roll(y, d, 1)
            y = y + jnp.where(lane >= d, z, 0.0)
        return y

    def kern(rec_ref, out_ref, *, mode):
        c = pl.program_id(0)

        @pl.when(c % 66 == 0)
        def _():
            out_ref[0] = jnp.zeros((P, 16), jnp.float32)

        chunk = rec_ref[:, :]
        sub = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0).astype(
            jnp.float32)
        # fake pair math ~ similar op count to pair_alpha_depth
        r1 = chunk[0:1, :]; r2 = chunk[1:2, :]; r3 = chunk[2:3, :]
        a_ = r1 - sub * r3
        b_ = r2 - sub * r3
        kx = a_ * b_ - r3
        ky = b_ * r1 - a_
        kz = a_ * r2 - b_ * r1
        kzs = jnp.where(jnp.abs(kz) < 1e-12, 1e-12, kz)
        u = kx / kzs
        v = ky / kzs
        rho = u * u + v * v
        alpha = jnp.minimum(0.99, jnp.exp(-0.5 * rho))
        w0 = jnp.where(alpha > 1e-3, alpha, 0.0)
        logom = jnp.log1p(-w0)

        if mode == "roll":
            t_excl = jnp.exp(cumsum_roll_excl(logom))
            a_excl = cumsum_roll_excl(w0)
            m1_excl = cumsum_roll_excl(w0 * u)
            m2_excl = cumsum_roll_excl(w0 * u * u)
        else:
            if mode == "highest":
                prec = jax.lax.Precision.HIGHEST
            else:
                prec = jax.lax.Precision.DEFAULT
            m = prefix_mat(S)
            mm = lambda a: jax.lax.dot_general(
                a, m, dimension_numbers=((((1,), (0,))), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            if mode == "split2":
                # bf16 hi/lo decomposition: 2 DEFAULT passes ~ f32-ish
                hi = logom.astype(jnp.bfloat16).astype(jnp.float32)
                lo = logom - hi
                t_excl = jnp.exp(mm(hi) + mm(lo))
            else:
                t_excl = jnp.exp(mm(logom))
            a_excl = mm(w0)
            m1_excl = mm(w0 * u)
            m2_excl = mm(w0 * u * u)

        w = w0 * t_excl
        acc = out_ref[0]
        upd = jnp.concatenate([
            jnp.sum(w, 1, keepdims=True),
            jnp.sum(w * u, 1, keepdims=True),
            jnp.sum(w * (u * u * a_excl + m2_excl - 2 * u * m1_excl), 1,
                    keepdims=True),
            jnp.sum(w * v, 1, keepdims=True),
        ] + [jnp.sum(w * t_excl, 1, keepdims=True)] * 12, axis=1)
        out_ref[0] = acc + upd

    def run_mode(mode, rec):
        f = pl.pallas_call(
            functools.partial(kern, mode=mode),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(NCHUNK,),
                in_specs=[pl.BlockSpec((REC, S), lambda c: (0, c),
                                       memory_space=pltpu.VMEM)],
                out_specs=[pl.BlockSpec((1, P, 16),
                                        lambda c: (c // 66, 0, 0),
                                        memory_space=pltpu.VMEM)],
            ),
            out_shape=[jax.ShapeDtypeStruct((NT, P, 16), jnp.float32)],
        )

        @jax.jit
        def go(rec, s0):
            def body(i, carry):
                r, s = carry
                out = f(r + s * 1e-30)[0]
                return r, s + jnp.sum(out)
            return jax.lax.fori_loop(0, 3, body, (rec, s0))
        _, s = go(rec, jnp.float32(0.0))
        jax.block_until_ready(s)
        t0 = time.perf_counter()
        _, s = go(rec, jnp.float32(1.0))
        jax.block_until_ready(s)
        dt = (time.perf_counter() - t0) / 3
        print(f"{mode:10s} {dt*1e3:8.2f} ms  ({dt/NCHUNK*1e6:.2f} us/chunk)"
              f"  checksum={float(s):.4g}", flush=True)

    rng = np.random.default_rng(0)
    rec = jnp.asarray(rng.standard_normal((REC, NCHUNK * S),
                                          dtype=np.float32))
    for mode in ("default", "split2", "highest", "roll"):
        run_mode(mode, rec)


if __name__ == "__main__":
    main()
