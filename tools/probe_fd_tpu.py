"""Why is FD flat on TPU? Print raw perturbed losses for known-good coords.

Coord (2983,0) FD-matched its analytic gradient to 2.4e-4 on CPU. Print
L(m±eps) on the TPU with full precision for that coord and a few others,
plus the analytic grad, to see whether the TPU losses move at all.
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import numpy as np
import jax
import jax.numpy as jnp

from verify_device_parity import dense_scene
from streetunveiler_tpu.ops.rasterizer import rasterize


def main():
    print("backend:", jax.default_backend(), flush=True)
    args, w2c, K, st = dense_scene(tame=True)
    bg = jnp.asarray([0.1, 0.2, 0.3])

    def loss_k(m):
        r = rasterize(m, *args[1:], w2c, K, st, bg=bg)
        return (jnp.sum((r.color - 0.25) ** 2) + 0.05 * jnp.sum(r.distortion)
                + 0.02 * jnp.sum(r.normal ** 2))

    gm = np.asarray(jax.jit(jax.grad(loss_k))(args[0]))
    m0 = np.asarray(args[0])
    coords = [(2983, 0), (3645, 2), (3645, 0), (260, 0)]
    pert = []
    for (i, j) in coords:
        for eps in (3e-4,):
            for sgn in (+1.0, -1.0):
                mp = m0.copy()
                mp[i, j] += sgn * eps
                pert.append(mp)
    pert = jnp.asarray(np.stack(pert))

    @jax.jit
    def all_losses(ms):
        return jax.lax.map(loss_k, ms)

    ls = np.asarray(all_losses(pert))
    for k, (i, j) in enumerate(coords):
        lp, lm = ls[2 * k], ls[2 * k + 1]
        fd = (lp - lm) / (2 * 3e-4)
        print(f"coord ({i},{j}): an={gm[i, j]:+9.3f} fd={fd:+9.3f} "
              f"L+={lp:.6f} L-={lm:.6f}", flush=True)


if __name__ == "__main__":
    main()
