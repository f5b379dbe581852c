"""Attribute the on-device means-gradient drift: kernel or oracle?

Computes the dense-scene means gradient on TPU for both the Pallas
kernel and the jnp oracle, and cross-compares against the CPU-saved
references (/tmp/gk_cpu.npy, /tmp/go_cpu.npy — run the CPU snippet
first). Whichever side moved between backends owns the drift. Also
dumps the top offending surfels' scene parameters.
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import numpy as np
import jax
import jax.numpy as jnp

from verify_device_parity import dense_scene
from streetunveiler_tpu.ops.rasterizer import rasterize, rasterize_oracle


def main():
    args, w2c, K, st = dense_scene()
    bg = jnp.asarray([0.1, 0.2, 0.3])

    def lk(m, sc, q, o, c):
        r = rasterize(m, sc, q, o, c, w2c, K, st, bg=bg)
        return (jnp.sum((r.color - 0.25) ** 2) + 0.05 * jnp.sum(r.distortion)
                + 0.02 * jnp.sum(r.normal ** 2))

    def lo(m, sc, q, o, c):
        r = rasterize_oracle(m, sc, q, o, c, w2c, K, st, bg=bg)
        return (jnp.sum((r.color - 0.25) ** 2) + 0.05 * jnp.sum(r.distortion)
                + 0.02 * jnp.sum(r.normal ** 2))

    gk_t = np.asarray(jax.jit(jax.grad(lk))(*args))
    go_t = np.asarray(jax.jit(jax.grad(lo))(*args))
    gk_c = np.load("/tmp/gk_cpu.npy")
    go_c = np.load("/tmp/go_cpu.npy")

    def rep(name, a, b):
        d = np.abs(a - b)
        l2 = np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-30)
        print(f"{name:22s} l2 {l2:.3e}  max {d.max():.3e}", flush=True)

    rep("kernelTPU vs kernelCPU", gk_t, gk_c)
    rep("oracleTPU vs oracleCPU", go_t, go_c)
    rep("kernelTPU vs oracleTPU", gk_t, go_t)
    rep("kernelCPU vs oracleCPU", gk_c, go_c)

    # top offenders of the on-device kernel-vs-oracle diff
    d = np.abs(gk_t - go_t).max(axis=1)
    top = np.argsort(d)[-8:][::-1]
    m, sc, q, o, c = [np.asarray(a) for a in args]
    print("top kernelTPU-vs-oracleTPU offender surfels:")
    for i in top:
        print(f"  surfel {i}: |d|={d[i]:.2f} gk={gk_t[i]} go={go_t[i]} "
              f"depth={m[i,2]:.2f} scales={sc[i]} opac={o[i]:.3f}")


if __name__ == "__main__":
    main()
