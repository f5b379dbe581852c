"""ZITS++ inpainting adapter (reference ``utils/zits_utils.py:143``).

The reference wraps the external ZITS-PlusPlus stack (line detector,
edge/line transformers, structure upsampler, FTR generator) behind a
``ZitsGuidance`` class whose single-image ``inpaint`` drives the stage-C
key-frame fills (``1_optimization.py:127-142``).  The generative networks
themselves live in the external repo + checkpoints (not vendored here or
in the reference, ``.gitmodules:23-40``); everything the wrapper adds
*around* them is implemented in this module, dependency-light:

* :func:`masked_position_encoding` — the masked transformer positional
  encoding (``zits_utils.py:82-134``): iterative dilation distance from
  the known region + 4 directional reachability channels.
* :func:`edge_nms` — edge non-max suppression, the TPU-native stand-in
  for the C++ ``nms`` submodule (SURVEY §2.3 N6, ``zits_utils.py:294``):
  thin predicted edge maps before structure upsampling.
* :func:`sharpen` — the post-upsample ``sigmoid((x+2)·2)`` squash
  (``zits_utils.py:296-298``).
* :func:`sobel_xy` — the gradient-branch inputs (``zits_utils.py:249-259``).
* batch preparation at the reference's exact resolutions (512/256 pyramid,
  nearest/area mask policy, ``zits_utils.py:205-240``).

:class:`ZitsInpainter` composes these with lazily-imported external
models and satisfies the ``pipeline.inpaint.Inpainter`` protocol, so it
plugs into ``cli/unveil.py`` directly or into the out-of-band
``tools/inpaint_worker.py`` on a GPU host.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


# ------------------------------------------------------------------ helpers

def _resize(img: np.ndarray, h: int, w: int, nearest: bool = False):
    """PIL-backed resize; AREA-style for downscale, LINEAR for upscale
    (the reference's ``resize`` policy, zits_utils.py:57-72)."""
    from PIL import Image
    if img.shape[:2] == (h, w):
        return img.copy()
    mode = Image.NEAREST if nearest else (
        Image.BOX if img.shape[0] > h and img.shape[1] > w else Image.BILINEAR)
    if img.dtype == np.uint8:
        return np.asarray(Image.fromarray(img).resize((w, h), mode))
    return np.asarray(Image.fromarray(
        (np.clip(img, 0, 1) * 255).astype(np.uint8)).resize((w, h), mode)
    ).astype(np.float32) / 255.0


def _shift(a: np.ndarray, dy: int, dx: int) -> np.ndarray:
    """Zero-filled 2D shift: out[y, x] = a[y + dy, x + dx]."""
    h, w = a.shape
    out = np.zeros_like(a)
    ys = slice(max(0, dy), min(h, h + dy))
    xs = slice(max(0, dx), min(w, w + dx))
    yd = slice(max(0, -dy), min(h, h - dy))
    xd = slice(max(0, -dx), min(w, w - dx))
    out[yd, xd] = a[ys, xs]
    return out


def _dilate(known: np.ndarray, offsets) -> np.ndarray:
    """OR of shifted copies: pixel becomes known if any offset is known."""
    out = known.copy()
    for dy, dx in offsets:
        if (dy, dx) != (0, 0):
            out = np.maximum(out, _shift(known, dy, dx))
    return out


# 3x3 ones filter = full 8-neighborhood dilation; the four directional
# filters of zits_utils.py:74-78 are 2x2 corner neighborhoods (correlation
# anchored at the kernel center: d_filter1's ones at kernel rows 0-1 /
# cols 0-1 read the up-left quadrant, etc.)
_FULL = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
_DIRS = [
    [(-1, -1), (-1, 0), (0, -1), (0, 0)],   # d_filter1 (up-left)
    [(0, -1), (0, 0), (1, -1), (1, 0)],     # d_filter2 (down-left)
    [(-1, 0), (-1, 1), (0, 0), (0, 1)],     # d_filter3 (up-right)
    [(0, 0), (0, 1), (1, 0), (1, 1)],       # d_filter4 (down-right)
]


def masked_position_encoding(mask: np.ndarray, grid: int = 256,
                             max_pos: int = 128):
    """Masked transformer positional encoding (zits_utils.py:82-134).

    ``mask``: [H, W], nonzero = hole.  Returns ``(rel_pos, abs_pos,
    direct)`` at the input resolution: ``rel_pos`` int32 in [0, 128) —
    the dilation-iteration index at which each hole pixel is first
    reached from the known region on the 256-grid; ``abs_pos`` the
    unclipped iteration index on the 256-grid; ``direct`` [H, W, 4] int32
    — which of the 4 quadrant dilations reached the pixel at that step.
    Known pixels are 0 everywhere.
    """
    ori = (np.asarray(mask) != 0)
    h0, w0 = ori.shape
    m = _resize(ori.astype(np.uint8) * 255, grid, grid, nearest=False)
    hole = m > 0
    known = (~hole).astype(np.float32)
    pos = np.zeros((grid, grid), np.int32)
    direct = np.zeros((grid, grid, 4), np.int32)
    i = 0
    while known.min() < 1.0 and i < grid:
        i += 1
        grown = _dilate(known, _FULL)
        newly = (grown - known) == 1
        pos[newly] = i
        for d, offs in enumerate(_DIRS):
            reach = (_dilate(known, offs) - known) == 1
            direct[reach, d] = 1
        known = grown
    abs_pos = pos.copy()
    rel_pos = np.clip(pos, 0, max_pos - 1)
    if (h0, w0) != (grid, grid):
        rel_pos = _resize(rel_pos.astype(np.uint8), h0, w0, nearest=True
                          ).astype(np.int32)
        direct = np.stack(
            [_resize(direct[..., d].astype(np.uint8), h0, w0, nearest=True)
             for d in range(4)], axis=-1).astype(np.int32)
        rel_pos[~ori] = 0
        direct[~ori, :] = 0
    return rel_pos, abs_pos, direct


def sobel_xy(gray: np.ndarray):
    """3x3 Sobel gradients of a [H, W] image (zits_utils.py:249-259)."""
    g = np.asarray(gray, np.float32)
    pad = np.pad(g, 1, mode="edge")
    sx = ((pad[:-2, 2:] + 2 * pad[1:-1, 2:] + pad[2:, 2:])
          - (pad[:-2, :-2] + 2 * pad[1:-1, :-2] + pad[2:, :-2]))
    sy = ((pad[2:, :-2] + 2 * pad[2:, 1:-1] + pad[2:, 2:])
          - (pad[:-2, :-2] + 2 * pad[:-2, 1:-1] + pad[:-2, 2:]))
    return sx, sy


def edge_nms(edge: np.ndarray, binary_threshold: int = 50) -> np.ndarray:
    """Edge non-max suppression (SURVEY §2.3 N6; zits_utils.py:294).

    Thin a soft edge map [H, W] in [0, 1] to ridge pixels: a pixel
    survives iff it clears ``binary_threshold``/255 and is a local
    maximum along its dominant gradient direction (4-way quantized),
    mirroring the C++ NMS the reference builds from the ZITS submodule.
    Returns a 0/1 float32 map.
    """
    e = np.asarray(edge, np.float32)
    keep = e >= (binary_threshold / 255.0)
    gx, gy = sobel_xy(e)
    ang = np.mod(np.degrees(np.arctan2(gy, gx)), 180.0)
    # neighbors across the edge = along the gradient
    pairs = [((0, 1), (0, -1)),     # ~horizontal gradient
             ((-1, 1), (1, -1)),    # ~45°
             ((-1, 0), (1, 0)),     # ~vertical
             ((-1, -1), (1, 1))]    # ~135°
    sector = ((ang + 22.5) // 45).astype(np.int32) % 4
    out = np.zeros_like(e)
    for s, (o1, o2) in enumerate(pairs):
        n1 = _shift(e, *o1)
        n2 = _shift(e, *o2)
        ridge = (e >= n1) & (e >= n2)
        out = np.where((sector == s) & ridge & keep, 1.0, out)
    return out.astype(np.float32)


def sharpen(x: np.ndarray) -> np.ndarray:
    """Post-upsample squash ``sigmoid((x + 2) * 2)`` (zits_utils.py:296-298)."""
    return 1.0 / (1.0 + np.exp(-2.0 * (np.asarray(x, np.float32) + 2.0)))


def _rgb2gray(img: np.ndarray) -> np.ndarray:
    return (0.299 * img[..., 0] + 0.587 * img[..., 1]
            + 0.114 * img[..., 2]).astype(np.float32)


# ------------------------------------------------------------------ adapter

class ZitsInpainter:
    """In-process ZITS++ adapter with the reference's inference flow
    (``zits_utils.py:143-346``): line detection on the 512 pyramid level,
    edge/line transformer completion at 256, NMS + structure upsampling
    to the test size, FTR generation, resize back to the input size.

    Needs the external ZITS-PlusPlus checkout + checkpoints (absent in
    hermetic environments — the models are not vendored by the reference
    either); construction raises ``RuntimeError`` when unavailable. Use
    ``DirectoryInpainter`` + ``tools/inpaint_worker.py --backend zits``
    to run it out-of-band on a GPU host.
    """

    def __init__(self, repo: str, ckpt_root: str, device: str = "cuda",
                 test_size: int = 512, binary_threshold: int = 50,
                 exp_name: str = "model_512"):
        import sys
        if not os.path.isdir(repo):
            raise RuntimeError(f"ZITS-PlusPlus repo not found at {repo!r}")
        sys.path.insert(0, repo)
        import torch  # noqa: F401 — external-model path only
        try:
            from base.parse_config import ConfigParser  # type: ignore
            from dnnlib.util import get_obj_by_name  # type: ignore
            from trainers.pl_trainers import wf_inference_test  # type: ignore
        except ImportError as e:  # pragma: no cover — needs the repo
            raise RuntimeError(f"ZITS-PlusPlus imports failed: {e}") from e
        self._torch = torch
        self._wf_inference = wf_inference_test
        self.device = device
        self.test_size = test_size
        self.binary_threshold = binary_threshold

        import argparse
        ns = argparse.Namespace(
            config=os.path.join(repo, "configs/config_zitspp_finetune.yml"),
            exp_name=exp_name, dynamic_size=False, use_ema=True,
            ckpt_resume=os.path.join(ckpt_root, exp_name, "models",
                                     "last.ckpt"),
            wf_ckpt=os.path.join(ckpt_root, "best_lsm_hawp.pth"),
            save_path="outputs", test_size=test_size, eval=False,
            save_image_only=True, obj_removal=True, resume=None)
        cfg = ConfigParser.from_args(ns, mkdir=False)
        build = lambda key, **kw: get_obj_by_name(cfg[key])(**kw)
        self.model = get_obj_by_name(cfg["PLTrainer"]
                                     if cfg.config.get("PLTrainer")
                                     else "trainers.pl_trainers."
                                          "FinetunePLTrainer")(
            build("structure_upsample_class"), build("edgeline_tsr_class"),
            build("grad_tsr_class"), build("g_class", config=cfg["g_args"]),
            build("d_class", config=cfg["d_args"]), cfg,
            os.path.join(ckpt_root, exp_name), use_ema=True,
            dynamic_size=False, test_only=True)
        self.model.reset_ema()
        sd = torch.load(ns.ckpt_resume, map_location="cpu")
        self.model.load_state_dict(sd.get("state_dict", sd), strict=False)
        if hasattr(self.model, "wf"):
            self.model.wf.load_state_dict(
                torch.load(ns.wf_ckpt, map_location="cpu")["model"])
        self.model.to(device)
        (self.model.ftr_ema if hasattr(self.model, "ftr_ema")
         else self.model.ftr).eval()
        self.use_gradient = bool(cfg["g_args"].get("use_gradient", False))
        if self.use_gradient and test_size != 512:
            # the reference's 256 path swaps edgeline_tsr for grad_tsr
            # (zits_utils.py:308-319) — not implemented here
            raise NotImplementedError(
                "use_gradient requires test_size=512 (the grad_tsr "
                "completion branch for test_size=256 is not implemented)")

    # -- batch preparation (zits_utils.py:205-262), arrays in memory
    def _batch(self, image: np.ndarray, mask: np.ndarray):
        torch = self._torch
        t = lambda a: torch.from_numpy(np.ascontiguousarray(a)).float()
        chw = lambda a: t(a).permute(2, 0, 1)[None]
        norm = lambda a: (chw(a) - 0.5) / 0.5
        ts = self.test_size
        img = _resize(np.asarray(image, np.float32), ts, ts)
        m = _resize((np.asarray(mask) != 0).astype(np.uint8) * 255, ts, ts,
                    nearest=True)
        img256 = _resize(img, 256, 256)
        m256 = (_resize(m, 256, 256) > 0).astype(np.float32)
        # the HAWP line detector always consumes a FIXED 512x512 tensor
        # regardless of test_size (zits_utils.py:213,223)
        img512 = img if ts == 512 else _resize(
            np.asarray(image, np.float32), 512, 512)
        m512 = m if ts == 512 else _resize(
            (np.asarray(mask) != 0).astype(np.uint8) * 255, 512, 512,
            nearest=True)
        # abs_pos stays on the 256 grid; rel_pos/direct return at the mask
        # resolution (zits_utils.py:122-133 resizes only those two back)
        rel_pos, abs_pos, direct = masked_position_encoding(m)
        b = dict(
            image=norm(img), img_256=norm(img256),
            mask=chw(((m > 127)[..., None]).astype(np.float32)),
            mask_256=chw(m256[..., None]),
            mask_512=chw(((m512 > 127)[..., None]).astype(np.float32)),
            img_512=chw(img512),
            rel_pos=t(rel_pos)[None].long(),
            abs_pos=t(abs_pos)[None].long(),
            direct=t(direct)[None].long(),
            imgh=torch.tensor([[ts]]), imgw=torch.tensor([[ts]]),
            size_ratio=-1, H=-1)
        if self.use_gradient:
            sx, sy = sobel_xy(_rgb2gray(img256) * 255.0)
            sxh, syh = sobel_xy(_rgb2gray(img) * 255.0)
            b.update(gradientx=t(sx)[None, None], gradienty=t(sy)[None, None],
                     gradientx_hr=t(sxh)[None, None],
                     gradienty_hr=t(syh)[None, None])
        return {k: (v.to(self.device) if hasattr(v, "to") else v)
                for k, v in b.items()}

    def inpaint(self, image: np.ndarray, mask: np.ndarray,
                reference: Optional[np.ndarray] = None) -> np.ndarray:
        torch = self._torch
        torch.manual_seed(123456)
        h0, w0 = np.asarray(image).shape[:2]
        with torch.no_grad():
            b = self._batch(image, mask)
            b["line_256"] = self._wf_inference(
                self.model.wf, b["img_512"], h=256, w=256,
                masks=b["mask_512"], valid_th=0.85, mask_th=0.85,
                obj_remove=True)
            edge, line = self.model.edgeline_tsr(
                b["img_256"], b["line_256"], masks=b["mask_256"])
            line = b["line_256"] * (1 - b["mask_256"]) + line * b["mask_256"]
            size, ts = 256, self.test_size
            F = torch.nn.functional
            edge_nms_t = None
            while size * 2 <= ts:          # HR structure loop (:291-301)
                line = self.model.structure_upsample(line)[0]
                nms_np = np.stack(
                    [edge_nms(e, self.binary_threshold)
                     for e in edge.detach().cpu().numpy()[:, 0]])
                edge_nms_t = torch.from_numpy(nms_np)[:, None].to(edge)
                edge_nms_t = self.model.structure_upsample(edge_nms_t)[0]
                edge_nms_t = torch.sigmoid((edge_nms_t + 2) * 2)
                line = torch.sigmoid((line + 2) * 2)
                size *= 2
            up = lambda x: F.interpolate(x, size=(ts, ts), mode="bilinear",
                                         align_corners=False)
            edge = up(edge)
            if edge_nms_t is not None:
                edge_nms_t = up(edge_nms_t)
                edge = torch.where(edge >= 0.25, edge_nms_t, edge)
            b["edge"], b["line"] = edge.detach(), up(line).detach()
            runner = (self.model.run_G_ema if hasattr(self.model, "run_G_ema")
                      else self.model.run_G)
            out, _ = runner(b)
            out = (torch.clamp(out, -1, 1) + 1) / 2
            out_np = out[0].permute(1, 2, 0).cpu().numpy()
        return _resize(out_np.astype(np.float32), h0, w0)
