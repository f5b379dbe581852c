"""FID InceptionV3 (pool3 features) in pure JAX — the reference protocol's
feature space (``eval_lpips_fid.sh:5`` runs ``pytorch_fid`` whose scores are
defined by the TF-ported ``pt_inception-2015-12-05`` checkpoint).

The network is the torchvision InceptionV3 graph with pytorch_fid's three
FID-specific deviations re-derived here:

* every in-block average pool uses ``count_include_pad=False``
  (FIDInceptionA/C/E_1);
* the last block's pool branch (Mixed_7c) uses MAX pooling (FIDInceptionE_2);
* inputs are bilinearly resized to 299x299 (align_corners=False) and
  mapped [0,1] -> [-1,1] before the stem.

Weights load from an ``.npz`` keyed by the torch ``state_dict`` names
(``tools/export_eval_weights.py --inception pt_inception-*.pth`` converts
the pytorch_fid checkpoint); BatchNorm (eps=1e-3) is folded into each conv
at load time. Output is the 2048-d global-average pool ("pool3") that
``evaluation.metrics.fid_from_dirs`` feeds to the Frechet distance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_BN_EPS = 1e-3


def _fold_conv(blob, prefix):
    """conv + BN (torch state_dict names) → folded (w, b), OIHW."""
    w = np.asarray(blob[f"{prefix}.conv.weight"], np.float32)
    gamma = np.asarray(blob[f"{prefix}.bn.weight"], np.float32)
    beta = np.asarray(blob[f"{prefix}.bn.bias"], np.float32)
    mean = np.asarray(blob[f"{prefix}.bn.running_mean"], np.float32)
    var = np.asarray(blob[f"{prefix}.bn.running_var"], np.float32)
    s = gamma / np.sqrt(var + _BN_EPS)
    return jnp.asarray(w * s[:, None, None, None]), jnp.asarray(
        beta - mean * s)


def conv_shapes():
    """{state_dict prefix: (O, I, kh, kw)} for every conv in the FID
    InceptionV3 — the weight contract of ``load_inception_weights`` (used
    by tests to build synthetic checkpoints, and handy for validating
    exported artifacts)."""
    s = {"Conv2d_1a_3x3": (32, 3, 3, 3), "Conv2d_2a_3x3": (32, 32, 3, 3),
         "Conv2d_2b_3x3": (64, 32, 3, 3), "Conv2d_3b_1x1": (80, 64, 1, 1),
         "Conv2d_4a_3x3": (192, 80, 3, 3)}
    for m, cin, pf in [("Mixed_5b", 192, 32), ("Mixed_5c", 256, 64),
                       ("Mixed_5d", 288, 64)]:
        s.update({f"{m}.branch1x1": (64, cin, 1, 1),
                  f"{m}.branch5x5_1": (48, cin, 1, 1),
                  f"{m}.branch5x5_2": (64, 48, 5, 5),
                  f"{m}.branch3x3dbl_1": (64, cin, 1, 1),
                  f"{m}.branch3x3dbl_2": (96, 64, 3, 3),
                  f"{m}.branch3x3dbl_3": (96, 96, 3, 3),
                  f"{m}.branch_pool": (pf, cin, 1, 1)})
    s.update({"Mixed_6a.branch3x3": (384, 288, 3, 3),
              "Mixed_6a.branch3x3dbl_1": (64, 288, 1, 1),
              "Mixed_6a.branch3x3dbl_2": (96, 64, 3, 3),
              "Mixed_6a.branch3x3dbl_3": (96, 96, 3, 3)})
    for m, c7 in [("Mixed_6b", 128), ("Mixed_6c", 160), ("Mixed_6d", 160),
                  ("Mixed_6e", 192)]:
        s.update({f"{m}.branch1x1": (192, 768, 1, 1),
                  f"{m}.branch7x7_1": (c7, 768, 1, 1),
                  f"{m}.branch7x7_2": (c7, c7, 1, 7),
                  f"{m}.branch7x7_3": (192, c7, 7, 1),
                  f"{m}.branch7x7dbl_1": (c7, 768, 1, 1),
                  f"{m}.branch7x7dbl_2": (c7, c7, 7, 1),
                  f"{m}.branch7x7dbl_3": (c7, c7, 1, 7),
                  f"{m}.branch7x7dbl_4": (c7, c7, 7, 1),
                  f"{m}.branch7x7dbl_5": (192, c7, 1, 7),
                  f"{m}.branch_pool": (192, 768, 1, 1)})
    s.update({"Mixed_7a.branch3x3_1": (192, 768, 1, 1),
              "Mixed_7a.branch3x3_2": (320, 192, 3, 3),
              "Mixed_7a.branch7x7x3_1": (192, 768, 1, 1),
              "Mixed_7a.branch7x7x3_2": (192, 192, 1, 7),
              "Mixed_7a.branch7x7x3_3": (192, 192, 7, 1),
              "Mixed_7a.branch7x7x3_4": (192, 192, 3, 3)})
    for m, cin in [("Mixed_7b", 1280), ("Mixed_7c", 2048)]:
        s.update({f"{m}.branch1x1": (320, cin, 1, 1),
                  f"{m}.branch3x3_1": (384, cin, 1, 1),
                  f"{m}.branch3x3_2a": (384, 384, 1, 3),
                  f"{m}.branch3x3_2b": (384, 384, 3, 1),
                  f"{m}.branch3x3dbl_1": (448, cin, 1, 1),
                  f"{m}.branch3x3dbl_2": (384, 448, 3, 3),
                  f"{m}.branch3x3dbl_3a": (384, 384, 1, 3),
                  f"{m}.branch3x3dbl_3b": (384, 384, 3, 1),
                  f"{m}.branch_pool": (192, cin, 1, 1)})
    return s


def load_inception_weights(path: str):
    """npz of torch state_dict tensors → dict of folded conv params,
    shape-validated against ``conv_shapes``."""
    blob = np.load(path)
    params = {}
    for n, shp in conv_shapes().items():
        got = tuple(np.asarray(blob[f"{n}.conv.weight"]).shape)
        if got != shp:
            raise ValueError(f"{n}.conv.weight: expected {shp}, got {got} "
                             f"— not a pytorch_fid InceptionV3 export?")
        params[n] = _fold_conv(blob, n)
    return params


def _conv(x, wb, stride=1, padding=0):
    """NCHW conv + folded bias + relu; padding int or (ph, pw)."""
    w, b = wb
    if isinstance(padding, int):
        padding = (padding, padding)
    pad = [(padding[0], padding[0]), (padding[1], padding[1])]
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return jax.nn.relu(y + b[None, :, None, None])


def _maxpool3s2(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 1, 3, 3),
                                 (1, 1, 2, 2), "VALID")


def _avgpool3s1p1(x):
    """3x3 stride-1 pad-1 average pool with count_include_pad=False —
    the FID-Inception flavor: border pixels divide by their true window
    size, not 9."""
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 1, 3, 3),
                              (1, 1, 1, 1), [(0, 0), (0, 0), (1, 1), (1, 1)])
    ones = jnp.ones((1, 1) + x.shape[2:], x.dtype)
    cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 1, 3, 3),
                                (1, 1, 1, 1),
                                [(0, 0), (0, 0), (1, 1), (1, 1)])
    return s / cnt


def _maxpool3s1p1(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 1, 3, 3),
                                 (1, 1, 1, 1),
                                 [(0, 0), (0, 0), (1, 1), (1, 1)])


def _block_a(p, m, x):
    b1 = _conv(x, p[f"{m}.branch1x1"])
    b5 = _conv(_conv(x, p[f"{m}.branch5x5_1"]), p[f"{m}.branch5x5_2"],
               padding=2)
    b3 = _conv(_conv(_conv(x, p[f"{m}.branch3x3dbl_1"]),
                     p[f"{m}.branch3x3dbl_2"], padding=1),
               p[f"{m}.branch3x3dbl_3"], padding=1)
    bp = _conv(_avgpool3s1p1(x), p[f"{m}.branch_pool"])
    return jnp.concatenate([b1, b5, b3, bp], axis=1)


def _block_b(p, x):
    b3 = _conv(x, p["Mixed_6a.branch3x3"], stride=2)
    bd = _conv(_conv(_conv(x, p["Mixed_6a.branch3x3dbl_1"]),
                     p["Mixed_6a.branch3x3dbl_2"], padding=1),
               p["Mixed_6a.branch3x3dbl_3"], stride=2)
    return jnp.concatenate([b3, bd, _maxpool3s2(x)], axis=1)


def _block_c(p, m, x):
    b1 = _conv(x, p[f"{m}.branch1x1"])
    b7 = _conv(_conv(_conv(x, p[f"{m}.branch7x7_1"]),
                     p[f"{m}.branch7x7_2"], padding=(0, 3)),
               p[f"{m}.branch7x7_3"], padding=(3, 0))
    bd = x
    for i, pad in zip(range(1, 6), [0, (3, 0), (0, 3), (3, 0), (0, 3)]):
        bd = _conv(bd, p[f"{m}.branch7x7dbl_{i}"], padding=pad)
    bp = _conv(_avgpool3s1p1(x), p[f"{m}.branch_pool"])
    return jnp.concatenate([b1, b7, bd, bp], axis=1)


def _block_d(p, x):
    b3 = _conv(_conv(x, p["Mixed_7a.branch3x3_1"]),
               p["Mixed_7a.branch3x3_2"], stride=2)
    b7 = _conv(_conv(_conv(_conv(x, p["Mixed_7a.branch7x7x3_1"]),
                           p["Mixed_7a.branch7x7x3_2"], padding=(0, 3)),
                     p["Mixed_7a.branch7x7x3_3"], padding=(3, 0)),
               p["Mixed_7a.branch7x7x3_4"], stride=2)
    return jnp.concatenate([b3, b7, _maxpool3s2(x)], axis=1)


def _block_e(p, m, x, pool):
    b1 = _conv(x, p[f"{m}.branch1x1"])
    b3 = _conv(x, p[f"{m}.branch3x3_1"])
    b3 = jnp.concatenate([_conv(b3, p[f"{m}.branch3x3_2a"], padding=(0, 1)),
                          _conv(b3, p[f"{m}.branch3x3_2b"], padding=(1, 0))],
                         axis=1)
    bd = _conv(x, p[f"{m}.branch3x3dbl_1"])
    bd = _conv(bd, p[f"{m}.branch3x3dbl_2"], padding=1)
    bd = jnp.concatenate([_conv(bd, p[f"{m}.branch3x3dbl_3a"],
                                padding=(0, 1)),
                          _conv(bd, p[f"{m}.branch3x3dbl_3b"],
                                padding=(1, 0))], axis=1)
    bp = _conv(pool(x), p[f"{m}.branch_pool"])
    return jnp.concatenate([b1, b3, bd, bp], axis=1)


def inception_pool3(params, x):
    """x [N,H,W,3] in [0,1] → pool3 features [N, 2048]."""
    x = jax.image.resize(x, (x.shape[0], 299, 299, 3), "bilinear")
    x = x * 2.0 - 1.0
    h = jnp.transpose(x, (0, 3, 1, 2))                       # NCHW
    h = _conv(h, params["Conv2d_1a_3x3"], stride=2)
    h = _conv(h, params["Conv2d_2a_3x3"])
    h = _conv(h, params["Conv2d_2b_3x3"], padding=1)
    h = _maxpool3s2(h)
    h = _conv(h, params["Conv2d_3b_1x1"])
    h = _conv(h, params["Conv2d_4a_3x3"])
    h = _maxpool3s2(h)
    for m in ["Mixed_5b", "Mixed_5c", "Mixed_5d"]:
        h = _block_a(params, m, h)
    h = _block_b(params, h)
    for m in ["Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"]:
        h = _block_c(params, m, h)
    h = _block_d(params, h)
    h = _block_e(params, "Mixed_7b", h, _avgpool3s1p1)
    # FIDInceptionE_2: the checkpoint's last block pools with MAX
    h = _block_e(params, "Mixed_7c", h, _maxpool3s1p1)
    return jnp.mean(h, axis=(2, 3))


def inception_feature_fn(weights_path: str):
    """Image [H,W,3] in [0,1] → [2048] pool3 features (jitted) — drop-in
    ``feature_fn`` for ``evaluation.metrics.fid_from_dirs``, matching the
    reference's pytorch_fid protocol."""
    params = load_inception_weights(weights_path)

    @jax.jit
    def fn(img):
        return inception_pool3(params, jnp.asarray(img)[None])[0]

    return fn
