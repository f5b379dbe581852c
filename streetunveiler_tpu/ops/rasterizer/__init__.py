"""Differentiable 2D Gaussian surfel (2DGS) rasterization for TPU.

TPU-native re-creation of the reference's CUDA ``diff-surfel-rasterization``
submodule (SURVEY.md §2.3 N1; API contract observed at
``/root/reference/gaussian_renderer/__init__.py:11,39-54,129-174``).

Structure:
  preprocess.py — world→ray-space surfel transform, culling, radii, SH decode
  oracle.py     — pure-jnp reference renderer (the correctness oracle; full
                  autodiff; CPU-runnable)
  tiles.py      — tile binning: duplicate surfels into the image tiles their
                  AABB overlaps, sort by (tile, depth), CSR offsets
  kernel.py     — Pallas TPU forward/backward blend kernels + custom VJP

Output contract (channels-last here; the reference uses a packed 7-channel
``allmap``, decoded at ``gaussian_renderer/__init__.py:149-169``):
  color [H,W,C], alpha [H,W], expected-depth (alpha-weighted, unnormalized)
  [H,W], view-space normal (alpha-weighted) [H,W,3], median depth [H,W],
  depth-distortion accumulator [H,W], plus per-surfel ``radii`` and the
  screen-space position gradient tap used by densification.
"""

from .types import RasterizeSettings, RenderOutput
from .oracle import rasterize_oracle
from .api import rasterize
