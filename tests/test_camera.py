"""Golden-value and invariant tests for camera math (ref semantics:
core/utils.py:10-43, core/provider_objaverse.py:127-170, core/gs.py:23-29)."""

import numpy as np
import pytest

from lgm_tpu.utils import camera


def test_orbit_camera_front():
    # azimuth 0, elevation 0 -> camera at (0, 0, r) looking at origin.
    T = camera.orbit_camera(0.0, 0.0, radius=1.5)
    assert T.shape == (4, 4)
    np.testing.assert_allclose(T[:3, 3], [0, 0, 1.5], atol=1e-6)
    # OpenGL look_at from +z: axes align with world.
    np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-6)


def test_orbit_camera_side():
    T = camera.orbit_camera(0.0, 90.0, radius=2.0)
    np.testing.assert_allclose(T[:3, 3], [2, 0, 0], atol=1e-6)
    # forward (camera z col) points from origin to camera: +x.
    np.testing.assert_allclose(T[:3, 2], [1, 0, 0], atol=1e-6)


def test_orbit_camera_elevation_sign():
    # Reference convention: positive elevation -> camera below equator.
    T = camera.orbit_camera(30.0, 0.0, radius=1.0)
    assert T[1, 3] < 0


def test_orbit_orthonormal():
    rng = np.random.default_rng(0)
    for _ in range(5):
        el, az = rng.uniform(-80, 80), rng.uniform(0, 360)
        T = camera.orbit_camera(el, az, radius=1.5)
        R = T[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_get_rays_center_direction():
    T = camera.orbit_camera(0.0, 0.0, radius=1.5)
    h = w = 8
    rays_o, rays_d = camera.get_rays(T, h, w, 49.1)
    assert rays_o.shape == (h, w, 3) and rays_d.shape == (h, w, 3)
    np.testing.assert_allclose(rays_o[0, 0], T[:3, 3], atol=1e-6)
    np.testing.assert_allclose(
        np.linalg.norm(rays_d, axis=-1), np.ones((h, w)), atol=1e-5
    )
    # Mean direction ~ view direction (-z for this pose).
    mean_d = rays_d.mean(axis=(0, 1))
    mean_d /= np.linalg.norm(mean_d)
    np.testing.assert_allclose(mean_d, [0, 0, -1], atol=1e-3)


def test_get_rays_fov_extent():
    # Corner ray angle from axis should be ~ sqrt(2)*fov/2 for square image.
    fovy = 60.0
    T = np.eye(4, dtype=np.float32)
    _, rays_d = camera.get_rays(T, 64, 64, fovy)
    # Edge-center pixel (first row center) vertical half-angle ~ fovy/2.
    d = rays_d[0, 32]
    ang = np.degrees(np.arccos(-d[2]))
    assert abs(ang - fovy / 2) < 2.0  # within pixel discretization


def test_plucker_invariant():
    # Plücker moment is origin-independent along the ray: m = o x d.
    T = camera.orbit_camera(15.0, 40.0, radius=1.5)
    emb = camera.plucker_rays(T, 16, 16, 49.1)
    m, d = emb[..., :3], emb[..., 3:]
    rays_o, rays_d = camera.get_rays(T, 16, 16, 49.1)
    o2 = rays_o + 0.7 * rays_d  # move origin along ray
    np.testing.assert_allclose(np.cross(o2, rays_d), m, atol=1e-5)
    np.testing.assert_allclose(d, rays_d, atol=1e-6)


def test_canonicalize_poses():
    rng = np.random.default_rng(1)
    poses = np.stack(
        [
            camera.orbit_camera(rng.uniform(-30, 30), rng.uniform(0, 360), 1.5)
            for _ in range(4)
        ]
    )
    canon = camera.canonicalize_poses(poses, cam_radius=1.5)
    np.testing.assert_allclose(canon[0][:3, :3], np.eye(3), atol=1e-5)
    np.testing.assert_allclose(canon[0][:3, 3], [0, 0, 1.5], atol=1e-5)
    # Relative transforms preserved.
    rel_before = np.linalg.inv(poses[0]) @ poses[2]
    rel_after = np.linalg.inv(canon[0]) @ canon[2]
    np.testing.assert_allclose(rel_before, rel_after, atol=1e-5)


def test_invert_pose():
    T = camera.orbit_camera(20.0, 123.0, radius=1.5)
    inv = camera.invert_pose(T)
    np.testing.assert_allclose(inv @ T, np.eye(4), atol=1e-5)


def test_perspective_matrix_layout():
    # Reference layout (ref core/gs.py:23-29): row-vector convention.
    P = camera.perspective_matrix(49.1, 0.5, 2.5)
    t = np.tan(np.deg2rad(49.1) * 0.5)
    assert abs(P[0, 0] - 1 / t) < 1e-6
    assert abs(P[2, 3] - 1.0) < 1e-6
    assert P[3, 2] != 0 and P[2, 2] != 0
    # A view-space point maps to w_clip == z_view under clip = P^T x.
    x = np.array([0.3, -0.2, 1.7, 1.0], dtype=np.float32)
    clip = P.T @ x
    assert abs(clip[3] - 1.7) < 1e-6


def test_build_camera_inputs_shapes_and_projection():
    poses = np.stack(
        [camera.orbit_camera(0.0, az, 1.5) for az in (0, 90, 180, 270)]
    )
    cams = camera.build_camera_inputs(poses, 49.1, 0.5, 2.5)
    assert cams["cam_view"].shape == (4, 4, 4)
    assert cams["cam_view_proj"].shape == (4, 4, 4)
    assert cams["cam_pos"].shape == (4, 3)
    # World origin should project to the image center direction for every
    # orbit view: view-space (0, 0, radius).
    for v in range(4):
        w2c = cams["cam_view"][v].T
        p = w2c @ np.array([0, 0, 0, 1.0], dtype=np.float32)
        np.testing.assert_allclose(p[:3], [0, 0, 1.5], atol=1e-5)


def test_orbit_ring():
    ring = camera.orbit_camera_ring(8, elevation=0.0, radius=1.5)
    assert ring.shape == (8, 4, 4)
    # All cameras at the given radius.
    np.testing.assert_allclose(
        np.linalg.norm(ring[:, :3, 3], axis=-1), np.full(8, 1.5), atol=1e-5
    )
