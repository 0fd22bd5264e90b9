"""Tiled Pallas rasterizer vs the XLA oracle (interpret mode on CPU).

The real-TPU path is exercised by bench.py and __graft_entry__.py; these
tests pin forward parity and the hand-derived custom-VJP backward against
autodiff of the reference compositor.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lgm_tpu.ops.gsplat.reference import render_reference
from lgm_tpu.ops.gsplat.tiled import render_tiled, render_views_tiled
from lgm_tpu.utils import camera

FOVY = 49.1
TAN = float(np.tan(0.5 * np.deg2rad(FOVY)))


def scene(n=120, seed=3):
    rng = np.random.default_rng(seed)
    g = np.zeros((n, 14), np.float32)
    g[:, 0:3] = rng.normal(0, 0.3, (n, 3))
    g[:, 3] = rng.uniform(0.2, 1.0, n)
    g[:, 4:7] = rng.uniform(0.02, 0.1, (n, 3))
    q = rng.normal(0, 1, (n, 4))
    g[:, 7:11] = q / np.linalg.norm(q, axis=1, keepdims=True)
    g[:, 11:14] = rng.uniform(0, 1, (n, 3))
    return jnp.asarray(g)


def view_of(el=10.0, az=30.0):
    pose = camera.orbit_camera(el, az, 1.5)
    cams = camera.build_camera_inputs(pose[None], FOVY, 0.5, 2.5)
    return jnp.asarray(cams["cam_view"][0])


def test_tiled_matches_reference_forward():
    g, view = scene(), view_of()
    bg = jnp.asarray([0.2, 0.4, 0.6])
    S = 64
    ref = render_reference(g, view, S, TAN, bg)
    til = render_tiled(
        g, view, S, TAN, bg, tile_h=16, tile_w=16, max_per_tile=256,
        interpret=True,
    )
    # Early-out bound + quadratic-expansion error: < 1e-3.
    np.testing.assert_allclose(
        np.asarray(til["image"]), np.asarray(ref["image"]), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(til["alpha"]), np.asarray(ref["alpha"]), atol=1e-3
    )


def test_tiled_overflow_drops_farthest():
    # More splats on one tile than max_per_tile: nearest-K must win, so the
    # image stays close to the unconstrained oracle (farthest are occluded).
    rng = np.random.default_rng(0)
    n = 200
    g = np.zeros((n, 14), np.float32)
    g[:, 2] = np.linspace(0.5, -0.5, n)  # stacked along view axis
    g[:, 3] = 0.9
    g[:, 4:7] = 0.08
    g[:, 7] = 1.0
    g[:, 11:14] = rng.uniform(0, 1, (n, 3))
    gj = jnp.asarray(g)
    view = view_of(0.0, 0.0)
    bg = jnp.zeros(3)
    S = 32
    ref = render_reference(gj, view, S, TAN, bg)
    til = render_tiled(
        gj, view, S, TAN, bg, tile_h=8, tile_w=32, max_per_tile=128,
        interpret=True,
    )
    # With opacity .9 the 128 nearest splats leave T ~ 0 at splat centers;
    # edge pixels (gaussian falloff) keep a few-1e-3 of dropped-tail light.
    np.testing.assert_allclose(
        np.asarray(til["image"]), np.asarray(ref["image"]), atol=5e-3
    )


def test_tiled_grad_matches_reference():
    g, view = scene(60, seed=11), view_of()
    bg = jnp.asarray([0.2, 0.4, 0.6])
    S = 32
    rng = np.random.default_rng(5)
    tgt = jnp.asarray(rng.uniform(0, 1, (S, S, 3)).astype(np.float32))

    def loss_ref(gs):
        o = render_reference(gs, view, S, TAN, bg)
        return jnp.mean((o["image"] - tgt) ** 2) + 0.1 * jnp.mean(o["alpha"])

    def loss_til(gs):
        o = render_tiled(
            gs, view, S, TAN, bg, tile_h=8, tile_w=32, max_per_tile=128,
            interpret=True,
        )
        return jnp.mean((o["image"] - tgt) ** 2) + 0.1 * jnp.mean(o["alpha"])

    g1 = np.asarray(jax.grad(loss_ref)(g))
    g2 = np.asarray(jax.grad(loss_til)(g))
    assert np.isfinite(g2).all()
    scale = np.abs(g1).max()
    np.testing.assert_allclose(g2, g1, atol=2e-3 * scale)


def test_tiled_batched_views():
    g = scene(80)
    poses = np.stack([camera.orbit_camera(0, az, 1.5) for az in (0, 90)])
    cams = camera.build_camera_inputs(poses, FOVY, 0.5, 2.5)
    cam_view = jnp.asarray(cams["cam_view"])[None]  # [1, 2, 4, 4]
    bg = jnp.ones((1, 2, 3))
    out = render_views_tiled(
        g[None], cam_view, 32, TAN, bg, tile_h=8, tile_w=32,
        max_per_tile=128, interpret=True,
    )
    assert out["image"].shape == (1, 2, 32, 32, 3)
    assert np.isfinite(np.asarray(out["image"])).all()
    # Views must differ.
    assert not np.allclose(
        np.asarray(out["image"][0, 0]), np.asarray(out["image"][0, 1])
    )
