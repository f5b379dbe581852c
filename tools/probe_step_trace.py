"""Per-op device timing of the FULL bench grad step (fwd+bwd+scatter).

Traces exactly what bench.py main() measures — jax.grad through
rasterize at 1920x1280, 300k surfels — and prints the top device ops by
self time with source mapping, so every millisecond of the headline
metric is attributable.

Usage: python tools/probe_step_trace.py [--hlo]
"""

import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bench import build_scene
from streetunveiler_tpu.ops.rasterizer import RasterizeSettings, rasterize
from streetunveiler_tpu.ops.rasterizer.api import default_duplicate_capacity

ITERS = 5
N = 300_000


def summarize(logdir, hlo_text=None):
    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                             recursive=True))
    if not paths:
        print(f"no trace json under {logdir}")
        return
    with gzip.open(paths[-1], "rt") as fh:
        data = json.load(fh)
    evs = data.get("traceEvents", data if isinstance(data, list) else [])
    pid_names = {}
    for e in evs:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    totals, counts = {}, {}
    for e in evs:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "Chip" not in pname and "XLA" not in pname:
            continue
        key = e.get("name", "?")
        totals[key] = totals.get(key, 0) + e.get("dur", 0)
        counts[key] = counts.get(key, 0) + 1
    src = {}
    if hlo_text:
        for m in re.finditer(
                r"%([\w.-]+) = [^\n]*?source_file=\"([^\"]+)\"[^\n]*?"
                r"source_line=(\d+)", hlo_text):
            src[m.group(1)] = f"{os.path.basename(m.group(2))}:{m.group(3)}"
    tot = 0.0
    for key, us in sorted(totals.items(), key=lambda kv: -kv[1])[:40]:
        ms = us / 1e3 / ITERS
        where = src.get(key, "")
        print(f"  {ms:9.3f} ms x{counts[key]:5d}  {key[:60]:60s} {where}")
        if key not in ("while.34", "while.35") and not key.startswith(
                "jit_"):
            tot += ms
    print(f"  (sum of listed non-outer ops: {tot:.1f} ms)")


def main():
    W, H, f = 1920, 1280, 1000.0
    pts, scales, quats, opac, cols, sem = build_scene(N)
    args = tuple(map(jnp.asarray, (pts, scales, quats, opac, cols)))
    K = jnp.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], jnp.float32)
    w2c = jnp.eye(4)
    st = RasterizeSettings(width=W, height=H, znear=0.2, zfar=100.0)
    bg = jnp.zeros(3)
    tgt = jnp.zeros((H, W, 3))
    dup_cap = default_duplicate_capacity(N, W, H)

    def loss(*a):
        out = rasterize(*a, w2c, K, st, bg=bg, duplicate_capacity=dup_cap)
        return (jnp.sum((out.color - tgt) ** 2)
                + 0.01 * jnp.sum(out.distortion)
                + 0.01 * jnp.sum(out.normal ** 2))

    gfn = jax.grad(loss, argnums=(0,))

    @jax.jit
    def multi_step(m, *rest):
        def body(_, mm):
            return mm + 1e-12 * gfn(mm, *rest)[0]
        return jax.lax.fori_loop(0, ITERS, body, m)

    hlo = None
    if "--hlo" in sys.argv:
        hlo = multi_step.lower(*args).compile().as_text()
        with open("/tmp/hlo_step.txt", "w") as fh:
            fh.write(hlo)
        print("wrote /tmp/hlo_step.txt")

    r = jax.block_until_ready(multi_step(*args))
    logdir = "/tmp/trace_step"
    args2 = (args[0] + 1e-6,) + args[1:]
    with jax.profiler.trace(logdir):
        jax.block_until_ready(multi_step(*args2))
    summarize(logdir, hlo)


if __name__ == "__main__":
    main()
