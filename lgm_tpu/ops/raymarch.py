"""Occupancy-grid ray marching + volume rendering (pure XLA).

TPU-native replacement for nerfacc's OccGridEstimator sampling and
render_weight_from_density compositing (ref: convert.py:131-184;
SURVEY.md §2b N4). nerfacc produces variable-length sample lists; here
every ray takes a fixed number of stratified samples inside its AABB
interval with occupancy masking — static shapes, dense math, and the
same front-to-back weights w_i = (1 - exp(-sigma_i dt_i)) * T_i.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class OccupancyGrid(NamedTuple):
    """Binary occupancy over an AABB, resolution R^3."""

    occ: jnp.ndarray       # [R, R, R] bool
    aabb_min: jnp.ndarray  # [3]
    aabb_max: jnp.ndarray  # [3]

    @staticmethod
    def dense(resolution: int = 64, aabb: float = 1.0) -> "OccupancyGrid":
        return OccupancyGrid(
            jnp.ones((resolution,) * 3, bool),
            jnp.full((3,), -aabb), jnp.full((3,), aabb),
        )

    def update(self, density_fn: Callable, threshold: float = 0.01,
               chunk: int = 1 << 16) -> "OccupancyGrid":
        """Re-evaluate occupancy at cell centers (ref: convert.py:140-146
        periodic update_every_n_steps)."""
        R = self.occ.shape[0]
        g = (jnp.arange(R) + 0.5) / R
        X, Y, Z = jnp.meshgrid(g, g, g, indexing="ij")
        pts = jnp.stack([X, Y, Z], axis=-1).reshape(-1, 3)
        pts = self.aabb_min + pts * (self.aabb_max - self.aabb_min)
        sig = jax.lax.map(
            density_fn, pts.reshape(-1, chunk, 3)
        ).reshape(-1)
        return self._replace(occ=(sig > threshold).reshape(R, R, R))

    def query(self, pts: jnp.ndarray) -> jnp.ndarray:
        """Occupancy at world points [N, 3] (False outside the AABB)."""
        R = self.occ.shape[0]
        u = (pts - self.aabb_min) / (self.aabb_max - self.aabb_min)
        inside = jnp.all((u >= 0.0) & (u < 1.0), axis=-1)
        idx = jnp.clip((u * R).astype(jnp.int32), 0, R - 1)
        return inside & self.occ[idx[:, 0], idx[:, 1], idx[:, 2]]


def ray_aabb(rays_o, rays_d, aabb_min, aabb_max):
    """Entry/exit distances of rays into the AABB (clamped >= 0)."""
    inv = 1.0 / jnp.where(jnp.abs(rays_d) < 1e-9,
                          jnp.sign(rays_d) * 1e-9 + 1e-12, rays_d)
    t0 = (aabb_min - rays_o) * inv
    t1 = (aabb_max - rays_o) * inv
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    tmin = jnp.maximum(tmin, 0.0)
    return tmin, jnp.maximum(tmax, tmin)


def render_rays(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    field_fn: Callable[[jnp.ndarray, jnp.ndarray], Tuple[jnp.ndarray,
                                                         jnp.ndarray]],
    grid: OccupancyGrid,
    num_samples: int = 128,
    rng: Optional[jax.Array] = None,
):
    """Volume-render rays [N, 3] against a radiance field.

    ``field_fn(pts [M, 3], dirs [M, 3]) -> (sigma [M], rgb [M, 3])``.
    Returns dict(rgb [N, 3], alpha [N], depth [N]).
    """
    N = rays_o.shape[0]
    tmin, tmax = ray_aabb(rays_o, rays_d, grid.aabb_min, grid.aabb_max)
    span = (tmax - tmin) / num_samples
    frac = (jnp.arange(num_samples) + 0.5) / num_samples
    if rng is not None:  # stratified jitter during training
        frac = frac + (
            jax.random.uniform(rng, (N, num_samples)) - 0.5
        ) / num_samples
    t = tmin[:, None] + frac * (tmax - tmin)[:, None]  # [N, S]
    pts = rays_o[:, None, :] + t[..., None] * rays_d[:, None, :]

    flat = pts.reshape(-1, 3)
    occ = grid.query(flat)
    sigma, rgb = field_fn(flat, jnp.broadcast_to(
        rays_d[:, None, :], pts.shape).reshape(-1, 3))
    sigma = jnp.where(occ, sigma, 0.0).reshape(N, num_samples)
    rgb = rgb.reshape(N, num_samples, 3)

    dt = span[:, None]
    alpha = 1.0 - jnp.exp(-sigma * dt)  # [N, S]
    t_excl = jnp.concatenate(
        [jnp.ones_like(alpha[:, :1]),
         jnp.cumprod(1.0 - alpha[:, :-1] + 1e-10, axis=1)], axis=1,
    )
    w = alpha * t_excl
    return {
        "rgb": jnp.sum(w[..., None] * rgb, axis=1),
        "alpha": jnp.sum(w, axis=1),
        "depth": jnp.sum(w * t, axis=1),
    }
