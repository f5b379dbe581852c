"""LPIPS (VGG16 variant) in pure JAX — reference ``eval_lpips.py``.

The reference scores unveiling quality with mean VGG-LPIPS over paired
directories (``eval_lpips.py:10-29``). This implements the exact LPIPS-VGG
computation (conv features at relu{1_2,2_2,3_3,4_3,5_3}, per-channel unit
normalization, learned 1×1 linear heads, spatial mean, layer sum) with
weights loaded from an ``.npz`` file — this image has no torchvision/lpips
checkpoints and no egress, so weights are an input artifact:

    # one-time, on any machine with lpips installed:
    import lpips, numpy as np, torch
    m = lpips.LPIPS(net='vgg')
    blob = {f"conv{i}": p.detach().numpy() for i, p in
            enumerate(m.net.parameters())}        # 26 conv w/b tensors
    blob.update({f"lin{i}": l.model[1].weight.detach().numpy()[:, :, 0, 0]
                 for i, l in enumerate(m.lins)})
    np.savez("lpips_vgg.npz", **blob)

Without a weight file, ``lpips_fn`` raises; callers fall back to
PSNR/SSIM (the hermetic metrics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (out_channels, pool_before)
_VGG_PLAN = [(64, False), (64, False), (128, True), (128, False),
             (256, True), (256, False), (256, False), (512, True),
             (512, False), (512, False), (512, True), (512, False),
             (512, False)]
# feature taps after these conv indices (post-ReLU): relu1_2 … relu5_3
_TAPS = [1, 3, 6, 9, 12]

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def load_lpips_weights(path: str):
    blob = np.load(path)
    convs = []
    for i in range(13):
        w = jnp.asarray(blob[f"conv{2 * i}"])      # [O, I, 3, 3]
        b = jnp.asarray(blob[f"conv{2 * i + 1}"])
        convs.append((w, b))
    lins = [jnp.asarray(blob[f"lin{i}"]) for i in range(5)]
    return dict(convs=convs, lins=lins)


def _vgg_features(params, x):
    """x [N,H,W,3] in [0,1] → list of tap features (NHWC)."""
    h = (x * 2.0 - 1.0 - _SHIFT) / _SCALE
    h = jnp.transpose(h, (0, 3, 1, 2))            # NCHW like torch
    feats = []
    for i, ((w, b), (_, pool)) in enumerate(zip(params["convs"], _VGG_PLAN)):
        if pool:
            h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                      (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
        h = jax.lax.conv_general_dilated(
            h, w, (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        h = h + b[None, :, None, None]
        h = jax.nn.relu(h)
        if i in _TAPS:
            feats.append(h)
    return feats


def lpips_pair(params, img0, img1):
    """LPIPS distance for a pair of [H,W,3] images in [0,1]."""
    f0 = _vgg_features(params, img0[None])
    f1 = _vgg_features(params, img1[None])
    total = 0.0
    for a, b, lin in zip(f0, f1, params["lins"]):
        na = a / jnp.sqrt(jnp.sum(a * a, axis=1, keepdims=True) + 1e-10)
        nb = b / jnp.sqrt(jnp.sum(b * b, axis=1, keepdims=True) + 1e-10)
        d = (na - nb) ** 2                         # [1, C, H, W]
        wd = jnp.einsum("nchw,oc->nohw", d, lin)   # 1x1 conv head
        total = total + jnp.mean(wd)
    return total


def lpips_fn(weights_path: str):
    """Returns a jitted pairwise LPIPS callable."""
    params = load_lpips_weights(weights_path)
    return jax.jit(functools.partial(lpips_pair, params))


def vgg_feature_fn(weights_path: str):
    """Image → pooled VGG tap features [1472] for FID.

    The reference scores FID through ``pytorch_fid``'s InceptionV3
    (``eval_lpips_fid.sh:5``); that checkpoint is another external
    artifact, so the VGG backbone already supplied for LPIPS doubles as
    the FID feature space (concatenated global-average-pooled relu taps).
    Self-consistent across runs; not numerically comparable to
    Inception-FID values — documented deviation.
    """
    params = load_lpips_weights(weights_path)

    @jax.jit
    def fn(img):
        feats = _vgg_features(params, jnp.asarray(img)[None])
        return jnp.concatenate([jnp.mean(f, axis=(0, 2, 3)) for f in feats])

    return fn
