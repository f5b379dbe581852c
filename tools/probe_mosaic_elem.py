"""Localize the TPU forward parity drift: Mosaic elementwise rounding?

Runs the SAME rasterize three ways on the TPU at the dense-occlusion
scene of verify_device_parity:

  mosaic    : real Pallas kernels (Mosaic exp/log1p/rcp)
  interp    : identical kernels through the Pallas interpreter (XLA ops)
  oracle    : pure-jnp reference

If mosaic↔interp shows the same error as mosaic↔oracle while
interp↔oracle is tight, the drift is Mosaic-vs-XLA elementwise
transcendental rounding flipping the exact α ≥ 1/255 pair gate — a
threshold knife-edge inherent to any reimplementation, not scheduling.

Usage (TPU): python tools/probe_mosaic_elem.py
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from streetunveiler_tpu.ops.rasterizer import (RasterizeSettings, rasterize,
                                               rasterize_oracle)
from verify_device_parity import dense_scene


def stats(a, b):
    d = np.abs(np.asarray(a) - np.asarray(b))
    return f"max {d.max():.3e} p99.9 {np.quantile(d, 0.999):.3e} " \
           f"frac>1e-3 {(d > 1e-3).mean():.2e}"


def main():
    print("backend:", jax.default_backend(), flush=True)
    args, w2c, K, st = dense_scene()
    bg = jnp.asarray([0.1, 0.2, 0.3])
    mos = jax.jit(lambda *a: rasterize(*a, w2c, K, st, bg=bg))(*args)
    itp = jax.jit(lambda *a: rasterize(*a, w2c, K, st, bg=bg,
                                       interpret=True))(*args)
    orc = jax.jit(lambda *a: rasterize_oracle(*a, w2c, K, st, bg=bg))(*args)
    for f in ("color", "alpha", "normal"):
        print(f"{f}:")
        print("  mosaic vs interp :", stats(getattr(mos, f), getattr(itp, f)))
        print("  interp vs oracle :", stats(getattr(itp, f), getattr(orc, f)))
        print("  mosaic vs oracle :", stats(getattr(mos, f), getattr(orc, f)),
              flush=True)


if __name__ == "__main__":
    main()
