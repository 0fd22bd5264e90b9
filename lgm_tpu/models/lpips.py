"""LPIPS perceptual loss (VGG-16 backbone) in Flax.

TPU-native replacement for the reference's kiui.lpips VGG metric
(ref: core/models.py:46-49,156-163; SURVEY.md §2b N7). The network is a
frozen feature extractor: VGG-16 conv stack with taps after
relu1_2/relu2_2/relu3_3/relu4_3/relu5_3, per-channel unit-normalized
feature differences squared, 1x1 non-negative linear heads, spatially
averaged and summed over taps.

This environment has no network egress and no torchvision, so pretrained
VGG weights cannot be downloaded. The module therefore supports two modes:

- ``load_lpips_params(npz_path)``: load converted weights (a converter from
  the standard torch LPIPS checkpoint is in tools/convert_lpips.py); gives
  metric parity with the reference.
- deterministic random init: multi-scale random-VGG features are a known
  usable perceptual surrogate (random-feature perceptual metrics match
  trained ones within a few percent on 2AFC); training still gets a
  structured multi-scale gradient. Clearly not checkpoint-parity — swap in
  converted weights for eval parity.

Inputs are NHWC RGB in [-1, 1], matching the reference call contract.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# Channel normalization constants used by the standard LPIPS scaling layer.
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# VGG-16 conv plan: (num_convs, channels) per stage; tap after each stage.
_STAGES = ((2, 64), (2, 128), (3, 256), (3, 512), (3, 512))


class VGG16Features(nn.Module):
    """VGG-16 conv tower returning the 5 LPIPS tap activations.

    ``stages`` keeps the VGG-16 structure (conv counts, pool positions,
    torchvision naming) at configurable widths — the converter golden
    (tests/test_lpips.py) runs the full canonical-name pipeline at
    reduced widths so the fixture stays small."""

    dtype: Any = jnp.float32
    stages: tuple = _STAGES

    @nn.compact
    def __call__(self, x):
        taps = []
        for si, (n_convs, ch) in enumerate(self.stages):
            for ci in range(n_convs):
                x = nn.Conv(ch, (3, 3), dtype=self.dtype,
                            name=f"conv{si}_{ci}")(x)
                x = nn.relu(x)
            taps.append(x)
            if si < len(self.stages) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


def load_lpips_params(npz_path: str, lpips_params):
    """Merge converted LPIPS weights (tools/convert_lpips.py output) into
    an initialized LPIPS param subtree. Keys are '/'-joined flax paths;
    missing keys keep their init values, shape mismatches raise."""
    import flax

    flat = flax.traverse_util.flatten_dict(
        flax.core.unfreeze(lpips_params), sep="/"
    )
    loaded = np.load(npz_path)
    for k in loaded.files:
        if k not in flat:
            raise KeyError(f"converted LPIPS key {k!r} not in param tree")
        if tuple(loaded[k].shape) != tuple(flat[k].shape):
            raise ValueError(
                f"{k}: shape {loaded[k].shape} != {flat[k].shape}"
            )
        flat[k] = jnp.asarray(loaded[k], flat[k].dtype)
    return flax.traverse_util.unflatten_dict(flat, sep="/")


class LPIPS(nn.Module):
    """lpips(a, b) -> [B] distance. a, b: [B, H, W, 3] in [-1, 1]."""

    dtype: Any = jnp.float32
    stages: tuple = _STAGES

    @nn.compact
    def __call__(self, a, b):
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        vgg = VGG16Features(dtype=self.dtype, stages=self.stages,
                            name="vgg")
        fa = vgg((a - shift) / scale)
        fb = vgg((b - shift) / scale)

        total = 0.0
        for si, (xa, xb) in enumerate(zip(fa, fb)):
            # Tap normalization and diffs in f32 regardless of the conv
            # compute dtype (the unit-normalize ratio is precision
            # sensitive; the conv tower itself is fine in bf16 — the
            # reference runs it under Accelerate bf16 autocast,
            # main.py:18-22).
            xa = xa.astype(jnp.float32)
            xb = xb.astype(jnp.float32)
            na = xa / jnp.sqrt(
                jnp.sum(xa * xa, axis=-1, keepdims=True) + 1e-10
            )
            nb = xb / jnp.sqrt(
                jnp.sum(xb * xb, axis=-1, keepdims=True) + 1e-10
            )
            diff = (na - nb) ** 2
            # Non-negative 1x1 linear head (weights stored as raw, squared
            # on use so converted torch weights load directly as-is).
            w = self.param(
                f"lin{si}",
                nn.initializers.constant(1.0 / diff.shape[-1]),
                (diff.shape[-1],),
                jnp.float32,
            )
            contrib = jnp.sum(diff * jnp.abs(w), axis=-1)   # [B, H, W]
            total = total + jnp.mean(contrib, axis=(1, 2))  # [B]
        return total
