"""FID InceptionV3 (evaluation/inception.py) + weight-export round trip.

Hermetic: builds a synthetic pytorch_fid-style checkpoint (the real
``pt_inception-2015-12-05`` artifact is external), exports it with
``tools/export_eval_weights.py``, and runs the JAX network. Pool/conv
semantics are parity-checked against torch directly.
"""

import sys

import numpy as np
import pytest

from streetunveiler_tpu.evaluation.inception import (conv_shapes,
                                                     inception_pool3,
                                                     load_inception_weights)

sys.path.insert(0, "tools")


def _fake_state_dict(rng):
    import torch
    sd = {}
    for name, (o, i, kh, kw) in conv_shapes().items():
        sd[f"{name}.conv.weight"] = torch.from_numpy(
            rng.normal(0, 0.05, (o, i, kh, kw)).astype(np.float32))
        sd[f"{name}.bn.weight"] = torch.from_numpy(
            rng.uniform(0.5, 1.5, o).astype(np.float32))
        sd[f"{name}.bn.bias"] = torch.from_numpy(
            rng.normal(0, 0.1, o).astype(np.float32))
        sd[f"{name}.bn.running_mean"] = torch.from_numpy(
            rng.normal(0, 0.1, o).astype(np.float32))
        sd[f"{name}.bn.running_var"] = torch.from_numpy(
            rng.uniform(0.5, 1.5, o).astype(np.float32))
    # distractors the exporter must drop
    sd["fc.weight"] = torch.zeros(1000, 2048)
    sd["AuxLogits.conv0.conv.weight"] = torch.zeros(128, 768, 1, 1)
    return sd


def test_export_roundtrip_and_forward(tmp_path, rng):
    torch = pytest.importorskip("torch")
    from export_eval_weights import export_inception
    pth = str(tmp_path / "pt_inception.pth")
    npz = str(tmp_path / "inception_fid.npz")
    torch.save(_fake_state_dict(rng), pth)
    export_inception(pth, npz)

    blob = np.load(npz)
    assert not any(k.startswith(("fc.", "AuxLogits")) for k in blob.files)

    params = load_inception_weights(npz)
    assert len(params) == len(conv_shapes())

    img = rng.uniform(0, 1, (2, 64, 96, 3)).astype(np.float32)
    feats = np.asarray(inception_pool3(params, img))
    assert feats.shape == (2, 2048)
    assert np.isfinite(feats).all()
    # distinct images map to distinct features
    assert not np.allclose(feats[0], feats[1])


def test_loader_rejects_wrong_shapes(tmp_path, rng):
    blob = {}
    for name, (o, i, kh, kw) in conv_shapes().items():
        blob[f"{name}.conv.weight"] = np.zeros((o, i, kh, kw), np.float32)
        for p in ["bn.weight", "bn.bias", "bn.running_mean",
                  "bn.running_var"]:
            blob[f"{name}.{p}"] = np.ones(o, np.float32)
    blob["Conv2d_1a_3x3.conv.weight"] = np.zeros((32, 4, 3, 3), np.float32)
    path = str(tmp_path / "bad.npz")
    np.savez(path, **blob)
    with pytest.raises(ValueError, match="Conv2d_1a_3x3"):
        load_inception_weights(path)


def test_pool_and_conv_semantics_match_torch(rng):
    """The FID-specific pooling flavors and explicit-pad convs must match
    torch's operators exactly (these define pytorch_fid comparability)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    import jax.numpy as jnp
    from streetunveiler_tpu.evaluation.inception import (_avgpool3s1p1,
                                                         _conv,
                                                         _maxpool3s2)

    x = rng.normal(0, 1, (1, 5, 11, 13)).astype(np.float32)
    xt = torch.from_numpy(x)

    # count_include_pad=False average pool (FIDInceptionA/C/E_1)
    want = F.avg_pool2d(xt, 3, stride=1, padding=1,
                        count_include_pad=False).numpy()
    got = np.asarray(_avgpool3s1p1(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    # 3x3 stride-2 VALID max pool
    want = F.max_pool2d(xt, 3, stride=2).numpy()
    got = np.asarray(_maxpool3s2(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    # conv + folded bias + relu with asymmetric explicit padding (1,7)/(0,3)
    w = rng.normal(0, 0.1, (4, 5, 1, 7)).astype(np.float32)
    b = rng.normal(0, 0.1, 4).astype(np.float32)
    want = F.relu(F.conv2d(xt, torch.from_numpy(w), torch.from_numpy(b),
                           padding=(0, 3))).numpy()
    got = np.asarray(_conv(jnp.asarray(x), (jnp.asarray(w), jnp.asarray(b)),
                           padding=(0, 3)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # stride-2 VALID conv (the stem's downsamplers)
    w2 = rng.normal(0, 0.1, (6, 5, 3, 3)).astype(np.float32)
    b2 = np.zeros(6, np.float32)
    want = F.relu(F.conv2d(xt, torch.from_numpy(w2), None, stride=2)).numpy()
    got = np.asarray(_conv(jnp.asarray(x),
                           (jnp.asarray(w2), jnp.asarray(b2)), stride=2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_resize_matches_torch_bilinear(rng):
    """pytorch_fid resizes to 299 with bilinear align_corners=False;
    jax.image.resize('bilinear') must agree."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    import jax
    import jax.numpy as jnp

    x = rng.uniform(0, 1, (1, 3, 17, 23)).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), size=(29, 31),
                         mode="bilinear", align_corners=False).numpy()
    got = np.asarray(jax.image.resize(jnp.asarray(x), (1, 3, 29, 31),
                                      "bilinear"))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
