"""Is _mmT3 ([P,S]x[Q,S] contracting lanes, Q=7) miscompiled by Mosaic?

verify_device_parity r4 found the fwd kernel's payload+alpha MXU
contraction produces garbage on real TPU while interpret mode is exact.
This probe runs a minimal Pallas kernel computing the same contraction
three ways and compares against the VPU lane-reduction truth:

  a) _mmT3 as shipped: b [7,128], dot_general contracting ((1,),(1,))
  b) same but b zero-padded to [8,128] (sublane-aligned operand)
  c) transpose b in-kernel to [128,8] and use the standard _mm form

Usage (on TPU): python tools/probe_mmt3.py
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from streetunveiler_tpu.ops.rasterizer.kernel import _mmT3, _hi8

P, S, Q = 512, 128, 7


def kern(w_ref, b_ref, oa_ref, ob_ref, oc_ref, ot_ref):
    w = w_ref[:, :]
    b = b_ref[:, :]              # [8, S]; row 7 is garbage-free zero pad
    bq = b[0:Q, :]
    # truth: VPU lane reductions
    ot_ref[:, :] = jnp.concatenate(
        [jnp.sum(w * bq[k:k + 1, :], axis=1, keepdims=True)
         for k in range(Q)], axis=1)
    oa_ref[:, :] = _mmT3(w, bq)
    ob_ref[:, :] = _mmT3(w, b)[:, 0:Q]
    bt = jnp.transpose(b, (1, 0))    # [S, 8]
    dot = lambda x, y: jax.lax.dot_general(
        x, y, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    ah, bh = _hi8(w), _hi8(bt)
    oc_ref[:, :] = (dot(ah, bh) + (dot(ah, bt - bh) + dot(w - ah, bh)))[:, 0:Q]


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.uniform(0, 1, (P, S)), jnp.float32)
    b = jnp.asarray(
        np.concatenate([rng.uniform(0, 1, (Q, S)), np.zeros((1, S))]),
        jnp.float32)
    outs = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((P, Q), jnp.float32)] * 3
        + [jax.ShapeDtypeStruct((P, Q), jnp.float32)],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
    )(w, b)
    a, bb, c, t = map(np.asarray, outs)
    for name, x in (("a_mmT3_q7", a), ("b_mmT3_pad8", bb),
                    ("c_transpose_mm", c)):
        err = np.max(np.abs(x - t)) / (np.max(np.abs(t)) + 1e-30)
        print(f"{name:16s} max rel err vs VPU truth: {err:.3e}", flush=True)


if __name__ == "__main__":
    main()
