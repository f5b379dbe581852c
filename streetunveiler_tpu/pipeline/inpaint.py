"""Inpainter interface — external 2D inpainting models as host-side services.

The reference drives two torch/CUDA diffusion stacks (SURVEY.md §2.4 N6/N8):
ZITS++ for the first key frame (``utils/zits_utils.py:143``) and LeftRefill,
a reference-guided SD-2 inpainting model, for propagation
(``utils/left_refill_utils.py:25,277``). Both run outside the jitted TPU
step and re-enter as constant supervision images (``refine():175,199``) —
exactly the contract kept here:

* ``Inpainter`` protocol: ``inpaint(image, mask, reference=None)``;
  image/reference [H,W,3] float in [0,1], mask [H,W] bool (True = fill).
* ``DiffuseFillInpainter`` — hermetic fallback that smoothly diffuses
  border colors into the hole (Jacobi iterations). Keeps the full
  unveiling pipeline runnable and testable without model checkpoints.
* ``TorchScriptInpainter`` — adapter for a user-supplied callable or
  torchscript module (how ZITS++/LeftRefill plug in on a host with their
  checkpoints; this environment ships no weights).
* ``DirectoryInpainter`` — the out-of-band *file-exchange* protocol: the
  TPU host writes each request as image/mask(/reference) PNGs and polls
  for the result PNG, so the real ZITS++/LeftRefill models can run on a
  separate GPU host watching the directory. This mirrors how the
  reference itself already moves every inpaint through the filesystem
  (``zits_utils.inpaint(img_path, mask_path, out_path)``,
  ``1_optimization.py:127-199``).
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional, Protocol

import numpy as np


class Inpainter(Protocol):
    def inpaint(self, image: np.ndarray, mask: np.ndarray,
                reference: Optional[np.ndarray] = None) -> np.ndarray:
        ...


class DiffuseFillInpainter:
    """Smooth diffusion fill (Jacobi relaxation of Laplace's equation with
    known-pixel Dirichlet boundary). Reference-guided mode blends the
    guide image into the interior, mimicking LeftRefill's role of keeping
    temporal consistency between frames."""

    def __init__(self, iterations: int = 300, reference_weight: float = 0.5):
        self.iterations = iterations
        self.reference_weight = reference_weight

    def inpaint(self, image, mask, reference=None):
        img = np.array(image, np.float32, copy=True)
        m = np.asarray(mask, bool)
        if not m.any():
            return img
        fill = img.copy()
        # init hole: mean of known pixels (or the reference)
        if reference is not None:
            fill[m] = (self.reference_weight * np.asarray(reference)[m]
                       + (1 - self.reference_weight)
                       * img[~m].mean(axis=0, keepdims=True))
        else:
            fill[m] = img[~m].mean(axis=0, keepdims=True)
        # edge-clamped neighbor shifts (np.roll would wrap, diffusing
        # colors from the opposite image border into edge-touching holes)
        pad = lambda a: np.pad(a, ((1, 1), (1, 1), (0, 0)), mode="edge")
        for _ in range(self.iterations):
            p = pad(fill)
            avg = 0.25 * (p[2:, 1:-1] + p[:-2, 1:-1]
                          + p[1:-1, 2:] + p[1:-1, :-2])
            fill[m] = avg[m]
        return np.clip(fill, 0.0, 1.0)


class DirectoryInpainter:
    """File-exchange inpainter: requests under ``<root>/requests/``,
    results under ``<root>/results/``.

    Request k is the file set ``{k:06d}_image.png``, ``{k:06d}_mask.png``,
    optionally ``{k:06d}_reference.png``, plus ``{k:06d}.json`` metadata
    written LAST (the worker's ready signal). The worker answers with
    ``results/{k:06d}.png``. On timeout the ``fallback`` inpainter is used
    (or TimeoutError raised if none is given), so the pipeline still
    completes when no worker is attached.
    """

    def __init__(self, root: str, poll_interval: float = 0.5,
                 timeout: float = 600.0, fallback: Optional[Inpainter] = None):
        self.root = root
        self.requests = os.path.join(root, "requests")
        self.results = os.path.join(root, "results")
        os.makedirs(self.requests, exist_ok=True)
        os.makedirs(self.results, exist_ok=True)
        self.poll_interval = poll_interval
        self.timeout = timeout
        self.fallback = fallback
        self.seq = 0

    @staticmethod
    def _write_png(path, arr):
        from PIL import Image
        a = np.asarray(arr)
        if a.dtype != np.uint8:
            a = (np.clip(a.astype(np.float32), 0, 1) * 255).astype(np.uint8)
        Image.fromarray(a).save(path)

    @staticmethod
    def _read_png(path):
        from PIL import Image
        return np.asarray(Image.open(path).convert("RGB"),
                          np.float32) / 255.0

    def inpaint(self, image, mask, reference=None):
        k = self.seq
        self.seq += 1
        stem = os.path.join(self.requests, f"{k:06d}")
        self._write_png(stem + "_image.png", image)
        self._write_png(stem + "_mask.png",
                        np.asarray(mask, bool).astype(np.uint8) * 255)
        meta = {"id": k, "mode": "inpaint"}
        if reference is not None:
            self._write_png(stem + "_reference.png", reference)
            meta["mode"] = "reference_guided"
        tmp = stem + ".json.tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, stem + ".json")   # atomic ready signal

        result = os.path.join(self.results, f"{k:06d}.png")
        deadline = time.monotonic() + self.timeout
        while time.monotonic() < deadline:
            if os.path.exists(result):
                # the worker may still be writing; retry a partial file
                try:
                    return np.clip(self._read_png(result), 0.0, 1.0)
                except OSError:
                    pass
            time.sleep(self.poll_interval)
        if self.fallback is not None:
            return self.fallback.inpaint(image, mask, reference=reference)
        raise TimeoutError(
            f"no inpaint worker answered request {k} under {self.root} "
            f"within {self.timeout}s (attach a worker that reads "
            f"requests/ and writes results/, or pass a fallback)")


class TorchScriptInpainter:
    """Adapter for an external model callable(image, mask, reference) —
    e.g. a ZITS++ or LeftRefill wrapper running on a GPU host. The callable
    owns device placement; this class only normalizes dtypes/layout."""

    def __init__(self, fn):
        self.fn = fn

    def inpaint(self, image, mask, reference=None):
        out = self.fn(np.asarray(image, np.float32),
                      np.asarray(mask, bool),
                      None if reference is None
                      else np.asarray(reference, np.float32))
        return np.clip(np.asarray(out, np.float32), 0.0, 1.0)
