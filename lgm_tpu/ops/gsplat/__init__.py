"""Differentiable 3D Gaussian splat rendering for TPU.

TPU-native replacement for the CUDA ``diff_gaussian_rasterization``
extension the reference wraps (ref: core/gs.py:7-10, SURVEY.md §2b N1).

Two backends behind one API:

- ``reference``: pure-XLA renderer (chunked scan compositing). Runs on any
  backend, differentiable by autodiff; the correctness oracle.
- ``pallas``: tiled Pallas TPU kernel with XLA-side binning, MXU quadratic
  evaluation and prefix-product compositing; custom VJP.

Gaussians are packed [N, 14] exactly as the reference's splatter images:
pos(3) | opacity(1) | scale(3) | quat wxyz(4) | rgb(3).
"""

from lgm_tpu.ops.gsplat.projection import project_gaussians  # noqa: F401
from lgm_tpu.ops.gsplat.reference import render_reference  # noqa: F401
from lgm_tpu.ops.gsplat.api import render, render_views  # noqa: F401
