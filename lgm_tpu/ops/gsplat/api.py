"""Public rendering API: all (batch, view) pairs in one batched computation.

The reference dispatches B*V sequential CUDA launches from a Python double
loop (ref: core/gs.py:42-51) — its biggest performance sin. Here the whole
[B, V] grid renders as a single traced computation: vmap over views/batch
for the XLA backend, a flattened BV grid axis for the Pallas backend.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from lgm_tpu.ops.gsplat.reference import render_reference


def _backend_default() -> str:
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def render_views(
    gaussians: jnp.ndarray,
    cam_view: jnp.ndarray,
    image_size: int,
    tan_half_fov: float,
    bg_color: Optional[jnp.ndarray] = None,
    scale_modifier: float = 1.0,
    backend: str = "auto",
    with_depth: bool = True,
    tile_h: Optional[int] = None,
    tile_w: Optional[int] = None,
    max_per_tile: Optional[int] = None,
    dup: Optional[int] = None,
):
    """Render [B, V] views of per-scene Gaussians.

    Args:
      gaussians: [B, N, 14] packed activated Gaussians.
      cam_view: [B, V, 4, 4] transposed w2c matrices (reference layout).
      image_size: output resolution S (square).
      tan_half_fov: tan(fovy / 2).
      bg_color: [3] or [B, V, 3] background; defaults to white
        (ref: core/gs.py:20).
      scale_modifier: multiplier on Gaussian scales (ref: core/gs.py:31).
      backend: "auto" | "pallas" | "xla".
      with_depth: emit the depth channel. The training loss never reads
        it; passing False keeps z out of the Pallas backend's per-slot
        gather/scatter (~10% off the backward scatter-add).
      tile_h, tile_w, max_per_tile: Pallas tiling overrides (pixels per
        tile and the static per-tile binning cap). None keeps each
        backend's measured default; the XLA backend has no tiles and
        ignores them.
      dup: per-splat live-tile cap of the flatsort backend. The default
        16 can truncate large splats on dense scenes (visible as color
        deltas vs the exact oracle; alpha saturates identically — see
        BENCHMARKS.md); quality-sensitive inference surfaces pass 32
        (fwd +~1.9 ms/view @512²/65k, exact to 3e-3 at 64).

    Returns dict of ``image`` [B, V, S, S, 3] (clamped to [0,1]),
    ``alpha`` [B, V, S, S, 1] and — for the ``pallas``/``xla`` backends —
    ``depth`` [B, V, S, S, 1] (alpha-weighted accumulated camera-space z,
    the reference rasterizer fork's extra channel) — NHWC, unlike the
    reference's NCHW.
    """
    B, V = cam_view.shape[:2]
    if bg_color is None:
        bg_color = jnp.ones((3,), jnp.float32)
    bg = jnp.broadcast_to(bg_color, (B, V, 3)).astype(jnp.float32)

    if backend == "auto":
        backend = _backend_default()

    tile_kw = {}
    if tile_h is not None:
        tile_kw["tile_h"] = tile_h
    if tile_w is not None:
        tile_kw["tile_w"] = tile_w
    if max_per_tile is not None:
        tile_kw["max_per_tile"] = max_per_tile

    if backend == "pallas" and dup is not None:
        tile_kw["dup"] = dup

    if backend == "pallas":
        from lgm_tpu.ops.gsplat.flatsort import render_views_flatsort

        out = render_views_flatsort(
            gaussians, cam_view, image_size, tan_half_fov, bg,
            scale_modifier, with_depth=with_depth, **tile_kw,
        )
    elif backend == "pallas_v1":
        from lgm_tpu.ops.gsplat.tiled import render_views_tiled

        out = render_views_tiled(
            gaussians, cam_view, image_size, tan_half_fov, bg,
            scale_modifier, **tile_kw,
        )
    else:
        one = partial(
            render_reference,
            image_size=image_size,
            tan_half_fov=tan_half_fov,
            scale_modifier=scale_modifier,
        )
        # vmap over views (shared gaussians), then over batch.
        per_scene = jax.vmap(
            lambda g, views, bgs: jax.vmap(
                lambda v, b: one(g, v, bg_color=b)
            )(views, bgs)
        )
        out = per_scene(gaussians, cam_view, bg)

    image = jnp.clip(out["image"], 0.0, 1.0)
    result = {"image": image, "alpha": out["alpha"][..., None]}
    if with_depth and "depth" in out:
        result["depth"] = out["depth"][..., None]
    return result


def render(
    gaussians: jnp.ndarray,
    cam_view: jnp.ndarray,
    image_size: int,
    tan_half_fov: float,
    bg_color: Optional[jnp.ndarray] = None,
    scale_modifier: float = 1.0,
    backend: str = "auto",
):
    """Single-view convenience wrapper: [N, 14] + [4, 4] -> [S, S, 3]."""
    out = render_views(
        gaussians[None],
        cam_view[None, None],
        image_size,
        tan_half_fov,
        None if bg_color is None else jnp.asarray(bg_color),
        scale_modifier,
        backend,
    )
    result = {
        "image": out["image"][0, 0],
        "alpha": out["alpha"][0, 0, ..., 0],
    }
    if "depth" in out:
        result["depth"] = out["depth"][0, 0, ..., 0]
    return result
