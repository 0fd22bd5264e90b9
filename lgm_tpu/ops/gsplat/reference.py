"""Pure-XLA differentiable Gaussian splat renderer (the correctness oracle).

Replaces the CUDA rasterizer call for one view (ref: core/gs.py:73-85) with
dense, statically-shaped XLA ops: project all N Gaussians, depth-sort once
(XLA sort), then alpha-composite front-to-back in fixed-size chunks under
``lax.scan`` — the sequential per-Gaussian recurrence is replaced by an
exclusive cumulative product over the chunk axis, so every step is a dense
[G, P] vector op. Differentiable end-to-end by autodiff.

Semantics note: the CUDA kernel stops a pixel once transmittance would drop
below 1e-4; we composite the full depth-ordered list instead. The resulting
image difference is bounded by the remaining transmittance (< 1e-4 per
channel), well below bf16 training noise. The Pallas backend applies the
same bound via chunk-level early-out.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lgm_tpu.ops.gsplat.projection import (
    ALPHA_MAX,
    ALPHA_MIN,
    Projected,
    project_gaussians,
)


def composite_depth_sorted(
    proj: Projected, image_size: int, chunk: int = 512
):
    """Front-to-back composite depth-sorted screen Gaussians over the full
    image. Returns (rgb [S, S, 3], alpha [S, S], depth [S, S], T [S, S]).

    ``depth`` is the alpha-weighted accumulated camera-space depth
    sum_i w_i * z_i (the reference's CUDA fork adds exactly this depth
    channel to the stock 3DGS rasterizer; ref: core/gs.py:7-10 import of
    the ashawkey diff-gaussian-rasterization fork).
    """
    S = image_size
    N = proj.mean2d.shape[0]
    P = S * S

    # Depth sort; culled Gaussians to the back with +inf keys.
    active = proj.valid & (proj.radius > 0)
    keys = jnp.where(active, proj.depth, jnp.inf)
    order = jnp.argsort(keys)

    mean2d = proj.mean2d[order]
    conic = proj.conic[order]
    color = proj.color[order]
    opacity = proj.opacity[order]
    zdepth = proj.depth[order]
    active = active[order]

    px = jnp.arange(S, dtype=jnp.float32)
    # Pixel sample positions are integer indices (the half-pixel shift is
    # folded into the ndc->pixel mapping in projection.py).
    pys, pxs = jnp.meshgrid(px, px, indexing="ij")
    pxs = pxs.reshape(-1)  # [P]
    pys = pys.reshape(-1)

    pad = (-N) % chunk
    if pad:
        mean2d = jnp.pad(mean2d, ((0, pad), (0, 0)))
        conic = jnp.pad(conic, ((0, pad), (0, 0)), constant_values=1.0)
        color = jnp.pad(color, ((0, pad), (0, 0)))
        opacity = jnp.pad(opacity, ((0, pad),))
        zdepth = jnp.pad(zdepth, ((0, pad),))
        active = jnp.pad(active, ((0, pad),))
    n_chunks = (N + pad) // chunk

    def reshape_chunks(x):
        return x.reshape((n_chunks, chunk) + x.shape[1:])

    chunks = jax.tree.map(
        reshape_chunks, (mean2d, conic, color, opacity, zdepth, active)
    )

    def body(carry, ch):
        T, rgb_acc, a_acc, d_acc = carry
        mean2d, conic, color, opacity, zdepth, act = ch
        dx = pxs[None, :] - mean2d[:, 0:1]  # [G, P]
        dy = pys[None, :] - mean2d[:, 1:2]
        power = (
            -0.5 * (conic[:, 0:1] * dx * dx + conic[:, 2:3] * dy * dy)
            - conic[:, 1:2] * dx * dy
        )
        alpha = jnp.minimum(ALPHA_MAX, opacity[:, None] * jnp.exp(power))
        use = act[:, None] & (power <= 0.0) & (alpha >= ALPHA_MIN)
        alpha = jnp.where(use, alpha, 0.0)
        om = 1.0 - alpha
        cp = jnp.cumprod(om, axis=0)  # inclusive, [G, P]
        t_excl = jnp.concatenate([jnp.ones_like(cp[:1]), cp[:-1]], axis=0)
        w = alpha * t_excl * T[None, :]  # [G, P]
        rgb_acc = rgb_acc + w.T @ color  # [P, 3]
        a_acc = a_acc + jnp.sum(w, axis=0)
        d_acc = d_acc + jnp.sum(w * zdepth[:, None], axis=0)
        T = T * cp[-1]
        return (T, rgb_acc, a_acc, d_acc), None

    init = (
        jnp.ones((P,), jnp.float32),
        jnp.zeros((P, 3), jnp.float32),
        jnp.zeros((P,), jnp.float32),
        jnp.zeros((P,), jnp.float32),
    )
    (T, rgb, alpha, depth), _ = jax.lax.scan(body, init, chunks)
    return (rgb.reshape(S, S, 3), alpha.reshape(S, S),
            depth.reshape(S, S), T.reshape(S, S))


def render_reference(
    gaussians: jnp.ndarray,
    view: jnp.ndarray,
    image_size: int,
    tan_half_fov: float,
    bg_color: jnp.ndarray,
    scale_modifier: float = 1.0,
    chunk: int = 512,
):
    """Render one view of packed Gaussians [N, 14].

    Returns dict with ``image`` [S, S, 3] (bg-composited, unclamped),
    ``alpha`` [S, S] and ``depth`` [S, S] (accumulated w·z). Matches the
    CUDA call contract of core/gs.py:73-98 (whose rasterizer fork returns
    image, radii, depth, alpha) but in NHWC with no B/V python loops
    (batch via vmap in api.py).
    """
    proj = project_gaussians(
        gaussians, view, image_size, tan_half_fov, scale_modifier
    )
    rgb, alpha, depth, T = composite_depth_sorted(
        proj, image_size, chunk=chunk
    )
    image = rgb + T[..., None] * bg_color[None, None, :]
    return {"image": image, "alpha": alpha, "depth": depth}
