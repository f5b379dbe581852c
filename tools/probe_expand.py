"""Is the Pallas expansion kernel broken at the new 8-column table shape?

Runs bin_surfels_stream's _expand_stream (and the full binning) on the
TPU and through the interpreter on the same device, comparing outputs.
The round-4 tiles.py restructure shrank the gathered table from 21 to 8
f32 columns; verify_drive went black on TPU with that change while CPU
interpret stayed green.

Usage (TPU): python tools/probe_expand.py
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from streetunveiler_tpu.ops.rasterizer import RasterizeSettings
from streetunveiler_tpu.ops.rasterizer.preprocess import preprocess_surfels
from streetunveiler_tpu.ops.rasterizer.tiles import bin_surfels_stream


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    n = 4000
    W, H, f = 320, 240, 200.0
    means = np.stack([rng.uniform(-6, 6, n), rng.uniform(-4, 4, n),
                      rng.uniform(2.0, 30.0, n)], 1).astype(np.float32)
    scales = rng.uniform(0.05, 0.5, (n, 2)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(0.3, 0.95, n).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    K = jnp.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], jnp.float32)
    st = RasterizeSettings(width=W, height=H, znear=0.2, zfar=100.0)
    sur = preprocess_surfels(jnp.asarray(means), jnp.asarray(scales),
                             jnp.asarray(quats), jnp.asarray(opac),
                             jnp.asarray(cols), jnp.eye(4), K, st)
    sg = jax.lax.stop_gradient
    cap = 40960

    def bin_(interp, use_cull):
        return bin_surfels_stream(
            sg(sur.center2d), sg(sur.ext), sg(sur.depth), sur.valid,
            W, H, 32, 16, cap, 64,
            cull=sg(sur.cull) if use_cull else None, interpret=interp)

    for use_cull in (True, False):
        bm = jax.jit(lambda: bin_(False, use_cull))()
        bi = jax.jit(lambda: bin_(True, use_cull))()
        for fld in ("sorted_surfel", "tile_offsets", "tile_of_visit",
                    "lane_lo", "lane_hi"):
            a = np.asarray(getattr(bm, fld))
            b = np.asarray(getattr(bi, fld))
            ndiff = int((a != b).sum())
            print(f"cull={use_cull} {fld:14s} ndiff={ndiff}"
                  + (f" first={np.nonzero(a != b)[0][:5]}" if ndiff else ""),
                  flush=True)


if __name__ == "__main__":
    main()
