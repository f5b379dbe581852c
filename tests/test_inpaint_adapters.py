"""Hermetic tests for the ZITS++ / LeftRefill adapter math
(pipeline/zits.py, pipeline/leftrefill.py) — the wrapper-side components
the reference implements in utils/zits_utils.py:74-134,283-306 and
utils/left_refill_utils.py:265-346. The external generative models are
not needed for any of these."""

import numpy as np
import pytest

from streetunveiler_tpu.pipeline.leftrefill import (build_prompt,
                                                    compose_side_by_side,
                                                    pad_to_multiple,
                                                    split_right_half)
from streetunveiler_tpu.pipeline.zits import (edge_nms,
                                              masked_position_encoding,
                                              sharpen, sobel_xy)


# ------------------------------------------------------------ ZITS helpers

def test_masked_position_encoding_known_pixels_zero():
    mask = np.zeros((64, 64), np.uint8)
    mask[20:40, 24:48] = 255
    rel, abs_pos, direct = masked_position_encoding(mask)
    hole = mask != 0
    assert rel.shape == (64, 64) and direct.shape == (64, 64, 4)
    assert np.all(rel[~hole] == 0)
    assert np.all(direct[~hole] == 0)
    # every hole pixel is eventually reached and gets a positive index
    assert np.all(rel[hole] > 0)


def test_masked_position_encoding_monotone_with_depth():
    # distance-from-boundary ordering: the hole center is reached later
    # than pixels at the hole rim (zits_utils.py:92-121 iterative dilation)
    mask = np.zeros((256, 256), np.uint8)
    mask[64:192, 64:192] = 255
    rel, abs_pos, _ = masked_position_encoding(mask)
    center = rel[128, 128]
    rim = rel[65, 128]
    assert center > rim >= 1
    assert abs_pos.max() >= center
    assert rel.max() <= 127            # clip to [0, 128) (:124-126)


def test_masked_position_encoding_direct_channels_orient():
    # a pixel just right of the known region is reached from the left →
    # the up-left/down-left quadrant dilations (channels 0/1) see it first
    mask = np.zeros((256, 256), np.uint8)
    mask[:, 128:] = 255
    _, _, direct = masked_position_encoding(mask)
    first_col = direct[128, 128]
    assert first_col[0] == 1 and first_col[1] == 1
    assert first_col[2] == 0 and first_col[3] == 0


def test_edge_nms_thins_thick_bar():
    # a soft vertical ridge 5px wide → NMS keeps only the maximal column
    e = np.zeros((32, 32), np.float32)
    for off, v in [(-2, 0.3), (-1, 0.6), (0, 1.0), (1, 0.6), (2, 0.3)]:
        e[:, 16 + off] = v
    out = edge_nms(e, binary_threshold=50)
    assert set(np.unique(out)).issubset({0.0, 1.0})
    inner = out[2:-2]
    assert np.all(inner[:, 16] == 1.0)          # ridge survives
    assert np.all(inner[:, [14, 18]] == 0.0)    # flanks suppressed


def test_edge_nms_threshold():
    e = np.full((8, 8), 0.1, np.float32)        # below 50/255 everywhere
    assert edge_nms(e, binary_threshold=50).sum() == 0.0


def test_sharpen_matches_reference_formula():
    x = np.linspace(-4, 4, 9).astype(np.float32)
    ref = 1.0 / (1.0 + np.exp(-(x + 2) * 2))
    np.testing.assert_allclose(sharpen(x), ref, rtol=1e-6)


def test_sobel_gradients_axis_aligned():
    g = np.tile(np.arange(16, dtype=np.float32)[None], (16, 1))
    sx, sy = sobel_xy(g)
    assert np.all(sx[2:-2, 2:-2] > 0)           # increasing along x
    np.testing.assert_allclose(sy[2:-2, 2:-2], 0, atol=1e-5)


# -------------------------------------------------------- LeftRefill geometry

def test_compose_side_by_side_geometry():
    rng = np.random.default_rng(0)
    src = rng.uniform(0, 1, (100, 150, 3)).astype(np.float32)
    ref = rng.uniform(0, 1, (100, 150, 3)).astype(np.float32)
    mask = np.zeros((100, 150), np.uint8)
    mask[30:60, 40:80] = 1
    canvas, m2 = compose_side_by_side(src, mask, ref, size=512)
    assert canvas.shape == (512, 1024, 3)
    assert m2.shape == (512, 1024)
    assert m2[:, :512].sum() == 0               # reference half unmasked
    assert m2[:, 512:].sum() > 0
    assert set(np.unique(m2)).issubset({0.0, 1.0})


def test_split_right_half_roundtrip():
    res = np.zeros((512, 1024, 3), np.float32)
    res[:, 512:] = 0.75                          # repainted source half
    out = split_right_half(res, (100, 150))
    assert out.shape == (100, 150, 3)
    np.testing.assert_allclose(out, 0.75, atol=2 / 255)


def test_pad_to_multiple():
    img = np.zeros((100, 150, 3), np.float32)
    out = pad_to_multiple(img, 32)
    assert out.shape[0] % 32 == 0 and out.shape[1] % 32 == 0
    assert out.shape == (128, 160, 3)
    same = np.zeros((128, 160, 3), np.float32)
    assert pad_to_multiple(same, 32).shape == same.shape


def test_build_prompt_token_structure():
    p = build_prompt(50)
    toks = p.split(" ")
    assert len(toks) == 50
    assert toks[0] == "<special-token0>" and toks[-1] == "<special-token49>"


def test_adapters_raise_without_external_repo(tmp_path):
    from streetunveiler_tpu.pipeline.leftrefill import LeftRefillInpainter
    from streetunveiler_tpu.pipeline.zits import ZitsInpainter
    with pytest.raises(RuntimeError):
        ZitsInpainter(str(tmp_path / "nope"), str(tmp_path))
    with pytest.raises(RuntimeError):
        LeftRefillInpainter(str(tmp_path / "nope"))


def test_cli_inpainter_specs(tmp_path):
    from streetunveiler_tpu.cli.unveil import make_inpainter
    from streetunveiler_tpu.pipeline.inpaint import (DiffuseFillInpainter,
                                                     DirectoryInpainter)
    assert isinstance(make_inpainter("diffuse"), DiffuseFillInpainter)
    assert isinstance(make_inpainter(f"dir:{tmp_path}"), DirectoryInpainter)
    with pytest.raises(ValueError):
        make_inpainter("unknown-model")
    with pytest.raises(RuntimeError):     # repo dir absent
        make_inpainter(f"zits:{tmp_path}/nope:{tmp_path}")
    with pytest.raises(RuntimeError):
        make_inpainter(f"leftrefill:{tmp_path}/nope")
