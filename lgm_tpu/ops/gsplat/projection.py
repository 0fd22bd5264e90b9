"""EWA projection of 3D Gaussians to screen space.

Pure jnp, fully differentiable via autodiff, vectorized over all N Gaussians
(the expensive per-pixel compositing lives in reference.py / the Pallas
kernel; gradients through projection come for free from XLA).

Math follows the standard 3DGS formulation implemented by the CUDA
rasterizer the reference calls (ref: core/gs.py:58-85): camera-space
transform -> perspective Jacobian (with frustum clamping) -> 2D covariance
with +0.3 px low-pass dilation -> conic + 3-sigma radius.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# The per-Gaussian matrices here are tiny (2x3, 3x3); run them at full f32
# on the MXU — bf16 default precision visibly distorts conics/radii.
_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HI)

# Same constants as the CUDA rasterizer's behavior.
NEAR_CULL = 0.2          # camera-space z below which Gaussians are culled
FRUSTUM_CLAMP = 1.3      # clamp x/z, y/z to 1.3 * tan_half_fov before J
COV2D_DILATE = 0.3       # pixel-space covariance dilation (antialias lpf)
ALPHA_MIN = 1.0 / 255.0  # contribution threshold
ALPHA_MAX = 0.99         # saturation cap per splat


class Projected(NamedTuple):
    """Screen-space Gaussians, all [N, ...]."""

    mean2d: jnp.ndarray   # [N, 2] pixel coords (pixel i spans [i-.5, i+.5))
    conic: jnp.ndarray    # [N, 3] inverse 2D covariance (a, b, c)
    depth: jnp.ndarray    # [N] camera-space z
    radius: jnp.ndarray   # [N] 3-sigma screen radius in pixels (0 if culled)
    color: jnp.ndarray    # [N, 3]
    opacity: jnp.ndarray  # [N]
    valid: jnp.ndarray    # [N] bool, survives near/degenerate culling


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) [..., 4] -> rotation matrix [..., 3, 3]."""
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-8)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack(
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                axis=-1,
            ),
            jnp.stack(
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                axis=-1,
            ),
            jnp.stack(
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
                axis=-1,
            ),
        ],
        axis=-2,
    )


def covariance3d(scale: jnp.ndarray, quat: jnp.ndarray) -> jnp.ndarray:
    """Sigma = R S S^T R^T; scale [..., 3], quat [..., 4] -> [..., 3, 3]."""
    R = quat_to_rotmat(quat)
    RS = R * scale[..., None, :]  # R @ diag(s)
    return _mm(RS, jnp.swapaxes(RS, -1, -2))


def project_gaussians(
    gaussians: jnp.ndarray,
    view: jnp.ndarray,
    image_size: int,
    tan_half_fov: float,
    scale_modifier: float = 1.0,
) -> Projected:
    """Project packed Gaussians [N, 14] through one camera.

    ``view`` is the transposed world-to-camera matrix [4, 4] in the
    reference's layout (cam_view from the data pipeline, ref:
    core/provider_objaverse.py:166): row-vector convention, so the
    standard w2c is ``view.T``.
    """
    w2c = view.T
    S = image_size
    focal = 0.5 * S / tan_half_fov

    pos = gaussians[:, 0:3]
    opacity = gaussians[:, 3]
    scale = gaussians[:, 4:7] * scale_modifier
    quat = gaussians[:, 7:11]
    color = gaussians[:, 11:14]

    # Camera-space position.
    t = _mm(pos, w2c[:3, :3].T) + w2c[:3, 3]  # [N, 3]
    depth = t[:, 2]
    valid = depth > NEAR_CULL
    # Safe depth for downstream math on culled points.
    zs = jnp.where(valid, depth, 1.0)

    # Frustum-clamped point for the Jacobian (standard EWA trick).
    lim = FRUSTUM_CLAMP * tan_half_fov
    txz = jnp.clip(t[:, 0] / zs, -lim, lim) * zs
    tyz = jnp.clip(t[:, 1] / zs, -lim, lim) * zs

    # J @ W: 2x3 perspective Jacobian times w2c rotation.
    inv_z = 1.0 / zs
    inv_z2 = inv_z * inv_z
    J = jnp.stack(
        [
            jnp.stack(
                [focal * inv_z, jnp.zeros_like(inv_z), -focal * txz * inv_z2],
                axis=-1,
            ),
            jnp.stack(
                [jnp.zeros_like(inv_z), focal * inv_z, -focal * tyz * inv_z2],
                axis=-1,
            ),
        ],
        axis=-2,
    )  # [N, 2, 3]
    JW = _mm(J, w2c[:3, :3])  # [N, 2, 3]

    cov3d = covariance3d(scale, quat)  # [N, 3, 3]
    cov2d = _mm(_mm(JW, cov3d), jnp.swapaxes(JW, -1, -2))  # [N, 2, 2]
    a = cov2d[:, 0, 0] + COV2D_DILATE
    b = cov2d[:, 0, 1]
    c = cov2d[:, 1, 1] + COV2D_DILATE

    det = a * c - b * b
    valid = valid & (det > 0.0)
    det_safe = jnp.where(det > 0, det, 1.0)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    # 3-sigma radius from the larger covariance eigenvalue.
    mid = 0.5 * (a + c)
    lam_max = mid + jnp.sqrt(jnp.maximum(mid * mid - det_safe, 0.1))
    radius = jnp.where(valid, jnp.ceil(3.0 * jnp.sqrt(lam_max)), 0.0)

    # Pixel-space mean: u = f x/z + (S-1)/2  (ndc2Pix convention).
    center = 0.5 * (S - 1)
    mean2d = jnp.stack(
        [
            focal * t[:, 0] * inv_z + center,
            focal * t[:, 1] * inv_z + center,
        ],
        axis=-1,
    )

    return Projected(
        mean2d=mean2d,
        conic=conic,
        depth=depth,
        radius=radius,
        color=color,
        opacity=opacity,
        valid=valid,
    )
