"""On-device (real TPU) forward + gradient parity vs the pure-jnp oracle.

The CPU test suite runs the Pallas kernels in interpret mode where
``Precision.DEFAULT`` is f32 — it cannot see bf16 MXU rounding. This tool
runs the REAL Mosaic kernels on the TPU and checks:

1. forward parity vs ``rasterize_oracle`` (computed on the same device in
   plain jnp/f32) at a DENSE-OCCLUSION scene — many overlapping opaque
   surfels per pixel, the worst case for the log-space transmittance
   matmuls — twice: t_eps=0 (identical pair sets → f32-floor gate) and
   default termination (bounded knife-edge regime, see pass-2 comment);
2. gradient parity vs the oracle's autodiff gradients (the oracle is
   pure jnp, so its VJP is exact f32);
3. central-difference FD checks of the Pallas gradients on a sample of
   coordinates (validates the single-pass bf16 backward t_excl/tg_excl
   downgrade flagged by ADVICE r3: |exponent err| <= 2^-8 relative).

Run on the TPU (default backend):  python tools/verify_device_parity.py
Prints max errors; exits nonzero on failure. Committed results live in
docs/profile.md ("on-device parity").
"""

import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from streetunveiler_tpu.ops.rasterizer import (RasterizeSettings, rasterize,
                                               rasterize_oracle)


def dense_scene(n=4000, W=128, H=96, f=110.0, seed=0, tame=False):
    """Deep stack of mostly-opaque surfels: every pixel blends ~dozens of
    contributors before early termination — maximum |log T| growth.

    ``tame`` keeps the stacks deep but removes near-camera grazing-angle
    monsters (depth ≥ 4, scales ≤ 0.35, opacity ≤ 0.9): the default
    scene's huge near surfels with random orientations have per-pair
    derivatives ∝ 1/kz³ whose ~1e6-sized terms cancel down to O(100)
    gradients — intrinsically ill-conditioned (f32 ulp at the partial
    sums is ~0.25, so ANY implementation/backend pair differs by ~10%;
    measured: kernel-vs-itself across CPU/TPU moves 29% l2, oracle 26%).
    Use the default scene for forward checks (well-conditioned sums) and
    the tame scene for gradient/FD checks."""
    rng = np.random.default_rng(seed)
    lo_d, hi_s = (4.0, 0.35) if tame else (2.0, 0.9)
    means = np.stack([rng.uniform(-2.5, 2.5, n), rng.uniform(-2, 2, n),
                      rng.uniform(lo_d, 30.0, n)], 1).astype(np.float32)
    scales = rng.uniform(0.1 if tame else 0.2, hi_s, (n, 2)).astype(
        np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(0.3 if tame else 0.5, 0.9 if tame else 0.98,
                       n).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    K = jnp.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], jnp.float32)
    st = RasterizeSettings(width=W, height=H, znear=0.2, zfar=100.0)
    return (tuple(map(jnp.asarray, (means, scales, quats, opac, cols))),
            jnp.eye(4), K, st)


def main():
    assert jax.default_backend() != "cpu", "run on the TPU"
    args, w2c, K, st = dense_scene()
    bg = jnp.asarray([0.1, 0.2, 0.3])

    # ---- pass 1: early termination DISABLED (t_eps=0) → the kernel and
    # the oracle composite the identical pair set; parity must sit at the
    # f32 floor. This is the real Mosaic-correctness gate.
    import dataclasses as _dc
    st0 = _dc.replace(st, t_eps=0.0)
    out0 = jax.jit(lambda *a: rasterize(*a, w2c, K, st0, bg=bg))(*args)
    ref0 = jax.jit(lambda *a: rasterize_oracle(*a, w2c, K, st0, bg=bg))(*args)
    print("forward parity, termination OFF (exact gate):")
    # Floor: ~100s of kept pairs/pixel × 1-ulp Mosaic-vs-XLA exp/log
    # differences + the 2⁻¹⁶ _mm_precise weight rounding → ~7e-5 measured
    # (color); expected_depth carries the ~30-unit depth scale.
    for f_ in ("color", "alpha", "expected_depth", "normal", "distortion"):
        e = float(jnp.max(jnp.abs(getattr(out0, f_) - getattr(ref0, f_))))
        print(f"  {f_:15s} max {e:.3e}")
        assert e < (2e-4 if f_ != "expected_depth" else 2e-3), (f_, e)
    assert not bool(out0.overflow)

    # ---- pass 2: default termination → bounded knife-edge regime. The
    # trigger ``t_after < t_eps`` flips at pixels where the kernel's
    # log-space T and the oracle's cumprod T (~1e-6 apart) straddle the
    # threshold; each flip moves ONE weight ≤ t_eps·a/(1−a) ≈ 5e-3 at
    # a=0.98. Inherent to any reimplementation (incl. CUDA vs this
    # oracle); this scene (50-deep stacks of a∈[0.5,0.98]) maximizes it.
    out = jax.jit(lambda *a: rasterize(*a, w2c, K, st, bg=bg))(*args)
    ref = jax.jit(lambda *a: rasterize_oracle(*a, w2c, K, st, bg=bg))(*args)
    errs = {}
    print("forward parity, termination ON (knife-edge bound):")
    print(f"  {'field':15s} {'max':>10s} {'p99.9':>10s} {'frac>1e-3':>10s}")
    for f_ in ("color", "alpha", "expected_depth", "normal", "distortion"):
        d = np.abs(np.asarray(getattr(out, f_) - getattr(ref, f_)))
        errs[f_] = dict(max=float(d.max()),
                        p999=float(np.quantile(d, 0.999)),
                        frac=float((d > 1e-3).mean()))
        print(f"  {f_:15s} {errs[f_]['max']:10.3e} {errs[f_]['p999']:10.3e}"
              f" {errs[f_]['frac']:10.2e}")
    for f_ in ("color", "alpha"):
        assert errs[f_]["max"] < 1e-2, (f_, errs[f_])   # t_eps·a/(1−a) bound
    assert errs["distortion"]["max"] < 5e-4, errs["distortion"]

    # gradient + FD checks: the TAME dense scene (see dense_scene — the
    # default scene's gradients are intrinsically ill-conditioned and
    # measure numerics noise, not correctness), at the DEFAULT t_eps (the
    # production path): the backward reconstructs per-pair transmittance
    # by dividing suffix products out of the final T, so it needs the
    # termination floor T ≳ t_eps — at t_eps=0 the final T underflows
    # f32 on deep stacks and the reconstruction explodes (measured; the
    # forward-only t_eps=0 mode is unaffected).
    args, w2c, K, st = dense_scene(tame=True)

    def loss_k(m, sc, q, o, c):
        r = rasterize(m, sc, q, o, c, w2c, K, st, bg=bg)
        return (jnp.sum((r.color - 0.25) ** 2) + 0.05 * jnp.sum(r.distortion)
                + 0.02 * jnp.sum(r.normal ** 2))

    def loss_o(m, sc, q, o, c):
        r = rasterize_oracle(m, sc, q, o, c, w2c, K, st, bg=bg)
        return (jnp.sum((r.color - 0.25) ** 2) + 0.05 * jnp.sum(r.distortion)
                + 0.02 * jnp.sum(r.normal ** 2))

    gk = jax.jit(jax.grad(loss_k, argnums=(0, 1, 2, 3, 4)))(*args)
    go = jax.jit(jax.grad(loss_o, argnums=(0, 1, 2, 3, 4)))(*args)
    # On device the kernel (Mosaic exp) and oracle (XLA exp) differ by
    # ~1 ulp per pair, flipping the exact α ≥ 1/255 and T < t_eps gates
    # for a handful of boundary pairs; a flipped SHARP pair carries a
    # pointwise-large gradient (dα/dx ~ ρ′·α is unbounded at the gate),
    # so max-norm parity is meaningless on device (CPU, where both sides
    # share one exp, measures 4e-5 max-rel). Gate on the L2 ratio —
    # flips are sparse — and leave pointwise validation to the FD check.
    # INFORMATIONAL on device: 2DGS gradients are sums of large
    # cancelling per-pair terms, so they are strongly sensitive to
    # ulp-level backend differences even where the forward agrees to
    # 1e-4 — measured: the ORACLE's own gradients move 26% l2 between
    # CPU and TPU on the adversarial scene, and kernel-vs-oracle reads
    # ~2% l2 here while the same comparison in exact-f32 CPU arithmetic
    # is 3e-5 (asserted by tests/test_kernel.py). The asserted device
    # gate is the FD check below: the production kernel against its own
    # loss, where conditioning affects both sides equally.
    print("gradient err vs oracle-autodiff (informational — see comment):")
    names = ("means", "scales", "quats", "opacity", "colors")
    for nm, a, b in zip(names, gk, go):
        d = np.abs(np.asarray(a - b)).ravel()
        bb = np.asarray(b).ravel()
        rel_l2 = float(np.linalg.norm(d) / (np.linalg.norm(bb) + 1e-30))
        print(f"  {nm:8s} l2 {rel_l2:.3e}  max|d| {d.max():.2e}  "
              f"max|g| {np.max(np.abs(bb)):.2e}")

    # central-difference FD on the TPU kernels themselves — the asserted
    # device gradient gate (validates the backward transmittance
    # reconstruction at dense occlusion, ADVICE r3 medium). 2DGS
    # gradients contain mathematically-correct SPIKE components from
    # near-edge-on splats (per-pair dρ/dx ∝ 1/kz³ concentrated in a
    # ~1e-6-wide transition band; measured: a coord with analytic −858
    # on BOTH kernel and oracle whose loss landscape is flat ±0.06 at
    # eps=3e-4 — the slope only exists below FD resolution; the CUDA
    # reference's gradients spike identically). So FD is only meaningful
    # where it is SELF-CONSISTENT across two step sizes: probe the
    # largest-gradient coords, keep those where fd(eps) ≈ fd(eps/4),
    # and assert parity there.
    gm = np.asarray(gk[0])
    flat = np.abs(gm).ravel()
    idxs = np.argsort(flat)[-24:][::-1]
    m0 = np.asarray(args[0])

    # ALL loss evaluations in ONE jitted lax.map launch: sequential
    # near-identical launches through the axon relay get deduped (the
    # relay returns cached results — measured: every perturbed L came
    # back bit-identical, FD ≡ 0 on device while CPU FD was clean).
    pert = []
    for ii in idxs:
        i, j = divmod(int(ii), 3)
        for eps in (3e-4, 7.5e-5):
            for sgn in (+1.0, -1.0):
                mp = m0.copy()
                mp[i, j] += sgn * eps
                pert.append(mp)
    pert = jnp.asarray(np.stack(pert))              # [24*4, N, 3]

    @jax.jit
    def all_losses(ms):
        return jax.lax.map(lambda m: loss_k(m, *args[1:]), ms)

    ls = np.asarray(all_losses(pert))
    rels, n_spiky = [], 0
    for k, ii in enumerate(idxs):
        i, j = divmod(int(ii), 3)
        an = gm[i, j]
        lp1, lm1, lp2, lm2 = ls[4 * k:4 * k + 4]
        f1 = (lp1 - lm1) / (2 * 3e-4)
        f2 = (lp2 - lm2) / (2 * 7.5e-5)
        # keep only coords where the slope is VISIBLE at FD scale and
        # the two step sizes agree — flat-landscape spike coords (fd≈0
        # under a large analytic spike) carry no information either way
        if (abs(f1) < 0.3 * (abs(an) + 1.0)
                or abs(f1 - f2) > 0.2 * (abs(f1) + 1.0)):
            n_spiky += 1
            continue
        rel = abs(f1 - an) / (abs(f1) + abs(an) + 1e-6)
        rels.append(rel)
        if rel > 2e-2:
            print(f"  fd outlier coord ({i},{j}): an={an:+.2f} "
                  f"fd={f1:+.2f}/{f2:+.2f} rel={rel:.3e}")
    rels = np.asarray(rels)
    print(f"FD check ({rels.size} FD-stable of 24 top grad coords, "
          f"{n_spiky} spike coords skipped): median rel "
          f"{np.median(rels):.3e}, worst {rels.max():.3e}")
    # worst tolerates a single kept-set crossing inside the ±eps window
    # (an O(w) jump under the difference quotient); the median pins the
    # bulk to FD resolution
    assert rels.size >= 6, (rels.size, n_spiky)
    assert np.median(rels) < 1e-2, np.median(rels)
    assert rels.max() < 0.15, rels.max()
    print("ON-DEVICE PARITY: ALL PASS")


if __name__ == "__main__":
    main()
