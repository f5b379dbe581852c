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
"""

from __future__ import annotations

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
        for _ in range(self.iterations):
            up = np.roll(fill, -1, 0)
            dn = np.roll(fill, 1, 0)
            lf = np.roll(fill, -1, 1)
            rt = np.roll(fill, 1, 1)
            avg = 0.25 * (up + dn + lf + rt)
            fill[m] = avg[m]
        return np.clip(fill, 0.0, 1.0)


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
