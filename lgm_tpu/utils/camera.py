"""Camera math: orbit poses, ray generation, projection, convention changes.

Conventions (matching the reference semantics so that checkpoints/datasets
interoperate — ref: core/utils.py:10-43, core/provider_objaverse.py:94-170,
core/gs.py:23-29):

- World: y-up. Object fits in [-1, 1]^3; orbit cameras at ``cam_radius``.
- OpenGL camera (c2w "pose"): x right, y up, camera looks along -z.
- COLMAP/OpenCV camera: x right, y down, z forward. Conversion from OpenGL
  negates pose columns 1 and 2.
- Pixels are indexed 0..S-1; the continuous center of pixel i is i + 0.5.
  The projection used by the rasterizer maps camera-space (x, y, z) to
  u = f * x/z + (S-1)/2 with f = S / (2 tan(fovy/2)).

All functions are pure and work on either numpy or jax.numpy arrays
(host-side data pipeline uses numpy; in-graph code passes jnp arrays).
"""

from __future__ import annotations

import numpy as np

_NP_F32 = np.float32


def _xp(*arrays):
    """Pick numpy or jax.numpy based on the inputs."""
    for a in arrays:
        if a is not None and type(a).__module__.startswith("jax"):
            import jax.numpy as jnp

            return jnp
    return np


def look_at(campos, target, opengl: bool = True):
    """Rotation matrix for a camera at ``campos`` looking at ``target``.

    OpenGL mode: camera z-axis points from target toward the camera
    (forward = campos - target), so the view direction is -z.
    """
    xp = _xp(campos, target)
    campos = xp.asarray(campos, dtype=_NP_F32)
    target = xp.asarray(target, dtype=_NP_F32)
    if opengl:
        forward = campos - target
    else:
        forward = target - campos
    forward = forward / xp.maximum(xp.linalg.norm(forward), 1e-8)
    up = xp.asarray([0.0, 1.0, 0.0], dtype=_NP_F32)
    if opengl:
        right = xp.cross(up, forward)
    else:
        right = xp.cross(forward, up)
    right = right / xp.maximum(xp.linalg.norm(right), 1e-8)
    if opengl:
        up = xp.cross(forward, right)
    else:
        up = xp.cross(right, forward)
    up = up / xp.maximum(xp.linalg.norm(up), 1e-8)
    return xp.stack([right, up, forward], axis=-1)


def orbit_camera(elevation: float, azimuth: float, radius: float = 1.0,
                 is_degree: bool = True, target=None, opengl: bool = True):
    """OpenGL c2w pose for an orbit camera.

    Matches the kiui.cam.orbit_camera convention used throughout the
    reference (ref: core/models.py:61-70, core/provider_lvis.py:132-136):
    elevation > 0 puts the camera *below* the equator (y = -r sin(el)),
    azimuth 0 on +z, azimuth 90 on +x.
    """
    if is_degree:
        elevation = np.deg2rad(elevation)
        azimuth = np.deg2rad(azimuth)
    x = radius * np.cos(elevation) * np.sin(azimuth)
    y = -radius * np.sin(elevation)
    z = radius * np.cos(elevation) * np.cos(azimuth)
    if target is None:
        target = np.zeros(3, dtype=_NP_F32)
    campos = np.array([x, y, z], dtype=_NP_F32) + np.asarray(target, _NP_F32)
    T = np.eye(4, dtype=_NP_F32)
    T[:3, :3] = np.asarray(look_at(campos, np.asarray(target, _NP_F32), opengl))
    T[:3, 3] = campos
    return T


def focal_from_fovy(fovy_deg: float, size: int) -> float:
    return 0.5 * size / np.tan(0.5 * np.deg2rad(fovy_deg))


import functools


@functools.lru_cache(maxsize=8)
def _pixel_dirs_cached(h: int, w: int, focal: float, sign: float):
    ii, jj = np.meshgrid(
        np.arange(w, dtype=_NP_F32), np.arange(h, dtype=_NP_F32),
        indexing="xy",
    )
    dirs = np.stack(
        [
            (ii - w * 0.5 + 0.5) / focal,
            (jj - h * 0.5 + 0.5) / focal * sign,
            np.full_like(ii, sign),
        ],
        axis=-1,
    )
    dirs.setflags(write=False)  # shared across callers
    return dirs


def get_rays(pose, h: int, w: int, fovy_deg: float, opengl: bool = True):
    """Per-pixel ray origins and unit directions in world space.

    ``pose`` is a c2w matrix [4,4]. Returns (rays_o, rays_d), each [h, w, 3].
    Semantics match ref core/utils.py:10-43 (pixel centers at +0.5, OpenGL
    camera looks along -z).
    """
    xp = _xp(pose)
    pose = xp.asarray(pose, dtype=_NP_F32)
    focal = focal_from_fovy(fovy_deg, h)
    sign = -1.0 if opengl else 1.0
    if xp is np:
        # The camera-space direction grid is pose-independent; the
        # loader calls this per view per sample, so memoize it (the
        # meshgrid+stack build dominates get_rays on the host).
        dirs = _pixel_dirs_cached(h, w, float(focal), sign)
    else:
        ii, jj = xp.meshgrid(
            xp.arange(w, dtype=_NP_F32), xp.arange(h, dtype=_NP_F32),
            indexing="xy",
        )  # ii: x/col, jj: y/row, each [h, w]
        dirs = xp.stack(
            [
                (ii - w * 0.5 + 0.5) / focal,
                (jj - h * 0.5 + 0.5) / focal * sign,
                xp.full_like(ii, sign),
            ],
            axis=-1,
        )  # [h, w, 3] camera-space
    rays_d = dirs @ pose[:3, :3].T  # [h, w, 3]
    rays_d = rays_d / xp.maximum(
        xp.linalg.norm(rays_d, axis=-1, keepdims=True), 1e-8
    )
    rays_o = xp.broadcast_to(pose[:3, 3], rays_d.shape)
    return rays_o, rays_d


def plucker_rays(pose, h: int, w: int, fovy_deg: float):
    """6-channel Plücker ray embedding [h, w, 6]: (o x d, d).

    Ref: core/models.py:74-75, core/provider_objaverse.py:149-157.
    """
    xp = _xp(pose)
    rays_o, rays_d = get_rays(pose, h, w, fovy_deg)
    return xp.concatenate([xp.cross(rays_o, rays_d), rays_d], axis=-1)


def perspective_matrix(fovy_deg: float, znear: float, zfar: float):
    """Row-vector-convention perspective matrix, identical in layout to the
    reference's (ref: core/gs.py:23-29): clip = P^T @ [x,y,z,1]_view with
    w_clip = z_view. Stored so that cam_view_proj = cam_view @ P composes in
    the reference's transposed format.
    """
    t = np.tan(0.5 * np.deg2rad(fovy_deg))
    P = np.zeros((4, 4), dtype=_NP_F32)
    P[0, 0] = 1.0 / t
    P[1, 1] = 1.0 / t
    P[2, 2] = (zfar + znear) / (zfar - znear)
    P[3, 2] = -(zfar * znear) / (zfar - znear)
    P[2, 3] = 1.0
    return P


def opengl_to_colmap(poses):
    """Negate up/forward columns: OpenGL c2w -> COLMAP/OpenCV c2w.

    Ref: core/provider_objaverse.py:161-162. Works on [..., 4, 4].
    """
    xp = _xp(poses)
    poses = xp.asarray(poses, dtype=_NP_F32)
    flip = xp.asarray([1.0, -1.0, -1.0, 1.0], dtype=_NP_F32)
    return poses * flip[None, :]  # scales columns 1,2 of the 3x3 + keeps t


def invert_pose(poses):
    """Fast rigid-transform inverse for c2w [..., 4, 4] -> w2c."""
    xp = _xp(poses)
    poses = xp.asarray(poses, dtype=_NP_F32)
    R = poses[..., :3, :3]
    t = poses[..., :3, 3:]
    Rt = xp.swapaxes(R, -1, -2)
    top = xp.concatenate([Rt, -Rt @ t], axis=-1)  # [..., 3, 4]
    bottom = xp.broadcast_to(
        xp.asarray([0.0, 0.0, 0.0, 1.0], dtype=_NP_F32),
        top.shape[:-2] + (1, 4),
    )
    return xp.concatenate([top, bottom], axis=-2)


def canonicalize_poses(poses, cam_radius: float):
    """Rigidly transform all poses so pose[0] sits at the canonical front
    position (identity rotation, translation (0, 0, cam_radius)).

    Ref: core/provider_objaverse.py:127-128.
    """
    xp = _xp(poses)
    poses = xp.asarray(poses, dtype=_NP_F32)
    target = np.eye(4, dtype=_NP_F32)
    target[2, 3] = cam_radius
    transform = xp.asarray(target) @ invert_pose(poses[0])
    return transform[None] @ poses


def build_camera_inputs(poses_opengl, fovy_deg: float, znear: float, zfar: float):
    """From OpenGL c2w poses [..., 4, 4] build the rasterizer camera dict in
    the reference's transposed layout (ref: core/provider_objaverse.py:160-170):

    - ``cam_view``      [..., 4, 4] = (w2c of the COLMAP pose)^T
    - ``cam_view_proj`` [..., 4, 4] = cam_view @ P
    - ``cam_pos``       [..., 3]     camera world position
    """
    xp = _xp(poses_opengl)
    colmap = opengl_to_colmap(poses_opengl)
    w2c = invert_pose(colmap)
    cam_view = xp.swapaxes(w2c, -1, -2)
    P = xp.asarray(perspective_matrix(fovy_deg, znear, zfar))
    cam_view_proj = cam_view @ P
    cam_pos = xp.asarray(poses_opengl, dtype=_NP_F32)[..., :3, 3]
    return {
        "cam_view": cam_view,
        "cam_view_proj": cam_view_proj,
        "cam_pos": cam_pos,
    }


def orbit_camera_ring(num_views: int, elevation: float, radius: float,
                      start_azimuth: float = 0.0):
    """Stack of ``num_views`` equally spaced orbit poses [V, 4, 4]."""
    azimuths = start_azimuth + np.arange(num_views) * (360.0 / num_views)
    return np.stack(
        [orbit_camera(elevation, float(a), radius) for a in azimuths], axis=0
    )


def default_plucker_embedding(opt, elevation: float = 0.0, num_views: int = 4):
    """Plücker embeddings for the canonical 4 orbit views (az 0/90/180/270)
    used at inference (ref: core/models.py:61-85). Returns [V, H, W, 6]
    (NHWC; the reference returns channels-first)."""
    poses = np.stack(
        [
            orbit_camera(elevation, az, radius=opt.cam_radius)
            for az in np.arange(num_views) * (360.0 / num_views)
        ],
        axis=0,
    )
    emb = np.stack(
        [
            plucker_rays(p, opt.input_size, opt.input_size, opt.fovy)
            for p in poses
        ],
        axis=0,
    ).astype(_NP_F32)
    return emb, poses
