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
    radius: jnp.ndarray   # [N] visibility radius in pixels (0 if culled)
    color: jnp.ndarray    # [N, 3]
    opacity: jnp.ndarray  # [N]
    valid: jnp.ndarray    # [N] bool, survives near/degenerate culling
    radius_x: jnp.ndarray = None  # [N] exact AABB half-width in pixels
    radius_y: jnp.ndarray = None  # [N] exact AABB half-height in pixels
    # [9, N] rows (x̄, ȳ, A, B, C, op, r, g, b): the flatsort slot
    # attributes, stacked CHANNEL-MAJOR directly from the SoA scalar
    # vectors. The per-field [N, k] views above stack along the minor
    # dim, whose BACKWARD materializes one [N, 1] layout-converted copy
    # per component (traced at ~7 ms/step at big-bs2); a consumer that
    # needs the packed block should take this one (its cotangent slices
    # [1, N] rows in the natural lane layout) instead of concatenating
    # the per-field views.
    attrs_t: jnp.ndarray = None


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (w, x, y, z) [..., 4] -> matrix [..., 3, 3] via the
    unit-quat formula on the RAW values — matching the reference CUDA
    rasterizer, which does not normalize (and the reference model's
    F.normalize(dim=1) activation leaves per-quat norms ~1/sqrt(N); see
    project_gaussians' rotation note and models/lgm.py). Exact rotation
    for unit input; near-identity for the near-zero quats of trained
    reference checkpoints."""
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

    opacity = gaussians[:, 3]
    color = gaussians[:, 11:14]

    # Structure-of-arrays scalar-channel math throughout: every quantity is
    # an [N] vector (full 128-lane utilization). The naive formulation —
    # batched [N,2,3]@[N,3,3] matmuls — keeps the lane axis at 3 and runs
    # ~16x below VPU peak; measured 3.5 ms -> sub-ms for N=65k on a v5e.
    px, py, pz = gaussians[:, 0], gaussians[:, 1], gaussians[:, 2]
    sx = gaussians[:, 4] * scale_modifier
    sy = gaussians[:, 5] * scale_modifier
    sz = gaussians[:, 6] * scale_modifier
    qw, qx, qy, qz = (gaussians[:, 7], gaussians[:, 8],
                      gaussians[:, 9], gaussians[:, 10])

    # w2c rotation rows (static scalars) and translation.
    W = w2c[:3, :3]
    tx_w, ty_w, tz_w = w2c[0, 3], w2c[1, 3], w2c[2, 3]

    # Camera-space position t = W @ p + t_vec, per component.
    tx = W[0, 0] * px + W[0, 1] * py + W[0, 2] * pz + tx_w
    ty = W[1, 0] * px + W[1, 1] * py + W[1, 2] * pz + ty_w
    tz = W[2, 0] * px + W[2, 1] * py + W[2, 2] * pz + tz_w
    depth = tz
    valid = depth > NEAR_CULL
    zs = jnp.where(valid, depth, 1.0)

    # Frustum-clamped point for the Jacobian (standard EWA trick).
    lim = FRUSTUM_CLAMP * tan_half_fov
    txz = jnp.clip(tx / zs, -lim, lim) * zs
    tyz = jnp.clip(ty / zs, -lim, lim) * zs

    # Rotation-matrix entries from the quaternion AS GIVEN (no
    # normalization): the reference's CUDA rasterizer consumes the raw
    # quaternion through the unit-quat formula (its Python side is
    # expected to normalize — but LGM's rot activation is F.normalize
    # with torch's default dim=1, which on [B, N, 4] normalizes each
    # component across the N Gaussians, ref: core/models.py:43,112 —
    # leaving per-quat norms ~1/sqrt(N), i.e. R ~ identity). Reproducing
    # released-checkpoint renders requires consuming the same raw values
    # here; see models/lgm.py::activate_gaussians. For unit quaternions
    # (standard 3DGS PLYs) this is the exact rotation either way.
    r00 = 1 - 2 * (qy * qy + qz * qz)
    r01 = 2 * (qx * qy - qw * qz)
    r02 = 2 * (qx * qz + qw * qy)
    r10 = 2 * (qx * qy + qw * qz)
    r11 = 1 - 2 * (qx * qx + qz * qz)
    r12 = 2 * (qy * qz - qw * qx)
    r20 = 2 * (qx * qz - qw * qy)
    r21 = 2 * (qy * qz + qw * qx)
    r22 = 1 - 2 * (qx * qx + qy * qy)

    # M = R @ diag(s): column k of R scaled by s_k. cov3d = M @ M^T.
    m00, m01, m02 = r00 * sx, r01 * sy, r02 * sz
    m10, m11, m12 = r10 * sx, r11 * sy, r12 * sz
    m20, m21, m22 = r20 * sx, r21 * sy, r22 * sz
    c00 = m00 * m00 + m01 * m01 + m02 * m02
    c01 = m00 * m10 + m01 * m11 + m02 * m12
    c02 = m00 * m20 + m01 * m21 + m02 * m22
    c11 = m10 * m10 + m11 * m11 + m12 * m12
    c12 = m10 * m20 + m11 * m21 + m12 * m22
    c22 = m20 * m20 + m21 * m21 + m22 * m22

    # JW rows: JW[0,:] = (f/z) W0 - (f txz / z^2) W2,
    #          JW[1,:] = (f/z) W1 - (f tyz / z^2) W2.
    inv_z = 1.0 / zs
    inv_z2 = inv_z * inv_z
    g0 = focal * inv_z
    gx = focal * txz * inv_z2
    gy = focal * tyz * inv_z2
    j00 = g0 * W[0, 0] - gx * W[2, 0]
    j01 = g0 * W[0, 1] - gx * W[2, 1]
    j02 = g0 * W[0, 2] - gx * W[2, 2]
    j10 = g0 * W[1, 0] - gy * W[2, 0]
    j11 = g0 * W[1, 1] - gy * W[2, 1]
    j12 = g0 * W[1, 2] - gy * W[2, 2]

    # cov2d = JW Σ JW^T via u = Σ JW0, v = Σ JW1 (Σ symmetric).
    u0 = c00 * j00 + c01 * j01 + c02 * j02
    u1 = c01 * j00 + c11 * j01 + c12 * j02
    u2 = c02 * j00 + c12 * j01 + c22 * j02
    v0 = c00 * j10 + c01 * j11 + c02 * j12
    v1 = c01 * j10 + c11 * j11 + c12 * j12
    v2 = c02 * j10 + c12 * j11 + c22 * j12
    a = j00 * u0 + j01 * u1 + j02 * u2 + COV2D_DILATE
    b = j10 * u0 + j11 * u1 + j12 * u2
    c = j10 * v0 + j11 * v1 + j12 * v2 + COV2D_DILATE

    det = a * c - b * b
    valid = valid & (det > 0.0)
    det_safe = jnp.where(det > 0, det, 1.0)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    # Opacity-aware exact extent: the compositor's cutoff is
    # op*exp(-q/2) >= ALPHA_MIN, i.e. the splat is invisible outside the
    # ellipse q <= tau with tau = 2 ln(op/ALPHA_MIN). The ellipse's exact
    # axis-aligned bounding box has half-widths sqrt(tau * Sigma_xx) and
    # sqrt(tau * Sigma_yy) (Sigma = 2D covariance — a/c here, already
    # dilated). This is tight per axis, unlike the CUDA rasterizer's
    # square 3-sigma-of-lam_max box, which errs both ways: it crops the
    # visible 3..3.33-sigma ring of opaque splats and wastes tiles on
    # low-opacity and anisotropic ones. Splats with op <= ALPHA_MIN can
    # never pass the cutoff and are culled outright.
    tau = 2.0 * (
        jnp.log(jnp.maximum(opacity, 1e-12)) - jnp.log(ALPHA_MIN)
    )
    valid = valid & (tau > 0.0)
    tau_s = jnp.maximum(tau, 0.0)
    zero = jnp.zeros_like(tau)
    radius_x = jnp.where(
        valid, jnp.ceil(jnp.sqrt(tau_s * jnp.maximum(a, 0.0))), zero
    )
    radius_y = jnp.where(
        valid, jnp.ceil(jnp.sqrt(tau_s * jnp.maximum(c, 0.0))), zero
    )
    radius = jnp.maximum(radius_x, radius_y)

    # Pixel-space mean: u = f x/z + (S-1)/2  (ndc2Pix convention).
    center = 0.5 * (S - 1)
    mx = focal * tx * inv_z + center
    my = focal * ty * inv_z + center
    mean2d = jnp.stack([mx, my], axis=-1)

    # Channel-major packed attributes (see Projected.attrs_t).
    attrs_t = jnp.stack(
        [mx, my, c * inv_det, -b * inv_det, a * inv_det, opacity,
         gaussians[:, 11], gaussians[:, 12], gaussians[:, 13]],
        axis=0,
    )

    return Projected(
        mean2d=mean2d,
        conic=conic,
        depth=depth,
        radius=radius,
        color=color,
        opacity=opacity,
        valid=valid,
        radius_x=radius_x,
        radius_y=radius_y,
        attrs_t=attrs_t,
    )
