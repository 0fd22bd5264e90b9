"""Flat-sort (v2) rasterizer vs the XLA oracle (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from lgm_tpu.ops.gsplat.flatsort import render_flatsort
from lgm_tpu.ops.gsplat.reference import render_reference
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


def test_flatsort_matches_reference():
    g, view = scene(), view_of()
    bg = jnp.asarray([0.2, 0.4, 0.6])
    S = 64
    ref = render_reference(g, view, S, TAN, bg)
    fla = render_flatsort(g, view, S, TAN, bg, tile_h=16, tile_w=16,
                          dup=16, interpret=True)
    np.testing.assert_allclose(np.asarray(fla["image"]),
                               np.asarray(ref["image"]), atol=1e-3)
    np.testing.assert_allclose(np.asarray(fla["alpha"]),
                               np.asarray(ref["alpha"]), atol=1e-3)
    np.testing.assert_allclose(np.asarray(fla["depth"]),
                               np.asarray(ref["depth"]), atol=3e-3)


def test_depth_channel_semantics():
    """One opaque splat in front of the camera: accumulated depth at the
    center pixel ~= alpha * camera-space z (the reference fork's
    accumulated w*z depth convention)."""
    g = np.zeros((1, 14), np.float32)
    g[0, 3] = 1.0          # opacity
    g[0, 4:7] = 0.05       # scale
    g[0, 7] = 1.0          # identity quat
    g[0, 11:14] = 0.5
    view = view_of(0.0, 0.0)
    S = 32
    ref = render_reference(jnp.asarray(g), view, S, TAN, jnp.zeros(3))
    fla = render_flatsort(jnp.asarray(g), view, S, TAN, jnp.zeros(3),
                          tile_h=8, tile_w=32, dup=16, interpret=True)
    c = S // 2
    a = float(ref["alpha"][c, c])
    assert a > 0.5
    # Camera at radius 1.5 looking at the origin -> z ~= 1.5.
    np.testing.assert_allclose(float(ref["depth"][c, c]), a * 1.5,
                               rtol=0.05)
    np.testing.assert_allclose(np.asarray(fla["depth"]),
                               np.asarray(ref["depth"]), atol=1e-3)


def test_with_depth_false_drops_channel_and_matches():
    """The training path renders with with_depth=False: no depth key,
    image/alpha identical to the depth-enabled render."""
    g, view = scene(), view_of()
    bg = jnp.asarray([0.2, 0.4, 0.6])
    kw = dict(tile_h=16, tile_w=16, dup=16, interpret=True)
    full = render_flatsort(g, view, 64, TAN, bg, **kw)
    lean = render_flatsort(g, view, 64, TAN, bg, with_depth=False, **kw)
    assert "depth" not in lean
    np.testing.assert_allclose(np.asarray(lean["image"]),
                               np.asarray(full["image"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(lean["alpha"]),
                               np.asarray(full["alpha"]), atol=1e-6)


def test_depth_channel_grad():
    """Gradients flow from a depth-only loss back to Gaussian positions
    (the backward's U_total must include the depth channel)."""
    g, view = scene(60, seed=11), view_of()
    S = 32

    def loss_d(gs, render):
        o = render(gs)
        return jnp.mean(o["depth"] ** 2)

    ref_fn = lambda gs: render_reference(gs, view, S, TAN, jnp.zeros(3))
    fla_fn = lambda gs: render_flatsort(
        gs, view, S, TAN, jnp.zeros(3), tile_h=8, tile_w=32, dup=16,
        interpret=True)
    g1 = np.asarray(jax.grad(loss_d)(g, ref_fn))
    g2 = np.asarray(jax.grad(loss_d)(g, fla_fn))
    assert np.abs(g1).max() > 0
    np.testing.assert_allclose(g2, g1, atol=2e-3 * np.abs(g1).max())


def test_flatsort_dup_overflow_drops_tiles():
    """Splats covering more than `dup` tiles keep their first `dup`
    (row-major bbox order); result stays finite and close to the oracle
    away from the dropped corners."""
    g = scene(30, seed=9)
    # Make one huge splat that covers many tiles.
    g = g.at[0, 4:7].set(0.6)
    g = g.at[0, 3].set(0.3)
    view = view_of()
    bg = jnp.zeros(3)
    out = render_flatsort(g, view, 64, TAN, bg, tile_h=16, tile_w=16,
                          dup=4, interpret=True)
    assert np.isfinite(np.asarray(out["image"])).all()


def test_flatsort_anisotropic_matches_reference():
    """Regression: isotropic splats whose exact ellipse AABB spans more
    bbox cells than `dup` used to lose visible tiles to the row-major
    duplicate cap (max error 0.30); live-cell compaction over 2*dup
    conic-culled candidates keeps them."""
    n = 300
    rng = np.random.default_rng(21)
    g = np.zeros((n, 14), np.float32)
    g[:, 0:3] = rng.normal(0, 0.3, (n, 3))
    g[:, 3] = rng.uniform(0.05, 1.0, n)
    g[:, 4:7] = rng.uniform(0.002, 0.08, (n, 3))
    # Highly anisotropic needles: huge per-axis AABB asymmetry.
    g[:60, 4] = rng.uniform(0.1, 0.3, 60)
    g[:60, 5:7] = 0.002
    q = rng.normal(0, 1, (n, 4))
    g[:, 7:11] = q / np.linalg.norm(q, axis=1, keepdims=True)
    g[:, 11:14] = rng.uniform(0, 1, (n, 3))
    gj, view = jnp.asarray(g), view_of()
    bg = jnp.zeros(3)
    S = 128
    ref = render_reference(gj, view, S, TAN, bg)
    fla = render_flatsort(gj, view, S, TAN, bg, tile_h=32, tile_w=32,
                          dup=16, interpret=True)
    np.testing.assert_allclose(np.asarray(fla["image"]),
                               np.asarray(ref["image"]), atol=5e-3)
    np.testing.assert_allclose(np.asarray(fla["alpha"]),
                               np.asarray(ref["alpha"]), atol=5e-3)


def test_flatsort_grad_matches_reference():
    g, view = scene(60, seed=11), view_of()
    bg = jnp.asarray([0.2, 0.4, 0.6])
    S = 32
    rng = np.random.default_rng(5)
    tgt = jnp.asarray(rng.uniform(0, 1, (S, S, 3)).astype(np.float32))

    def loss_ref(gs):
        o = render_reference(gs, view, S, TAN, bg)
        return jnp.mean((o["image"] - tgt) ** 2) + 0.1 * jnp.mean(o["alpha"])

    def loss_fla(gs):
        o = render_flatsort(gs, view, S, TAN, bg, tile_h=8, tile_w=32,
                            dup=16, interpret=True)
        return jnp.mean((o["image"] - tgt) ** 2) + 0.1 * jnp.mean(o["alpha"])

    g1 = np.asarray(jax.grad(loss_ref)(g))
    g2 = np.asarray(jax.grad(loss_fla)(g))
    assert np.isfinite(g2).all()
    np.testing.assert_allclose(g2, g1, atol=2e-3 * np.abs(g1).max())


def test_flatsort_batched_views_match_and_grad():
    """render_views_flatsort ([B, V] grid, scene indexing inside the map
    body) matches per-view oracle renders, and grads reach the right
    scene rows."""
    from lgm_tpu.ops.gsplat.flatsort import render_views_flatsort

    B, V, S = 2, 2, 32
    g = jnp.stack([scene(40, seed=1), scene(40, seed=2)])
    views = jnp.stack(
        [jnp.stack([view_of(5.0, 30.0), view_of(-10.0, 200.0)])] * B
    )
    bg = jnp.broadcast_to(jnp.asarray([0.1, 0.2, 0.3]), (B, V, 3))
    out = render_views_flatsort(g, views, S, TAN, bg, tile_h=8, tile_w=32,
                                dup=16, interpret=True)
    for b in range(B):
        for v in range(V):
            ref = render_reference(g[b], views[b, v], S, TAN, bg[b, v])
            np.testing.assert_allclose(
                np.asarray(out["image"][b, v]), np.asarray(ref["image"]),
                atol=2e-3,
            )

    def loss(gs):
        o = render_views_flatsort(gs, views, S, TAN, bg, tile_h=8,
                                  tile_w=32, dup=16, interpret=True)
        # Only scene 0's renders in the loss -> scene 1 grads must be 0.
        return jnp.sum(o["image"][0] ** 2)

    gr = np.asarray(jax.grad(loss)(g))
    assert np.isfinite(gr).all()
    assert np.abs(gr[0]).max() > 0
    np.testing.assert_allclose(gr[1], 0.0, atol=1e-7)


def test_flatsort_empty_scene():
    # All splats behind the camera: pure background everywhere.
    g = scene(16)
    g = g.at[:, 2].set(5.0)
    view = view_of(0.0, 0.0)
    bg = jnp.asarray([0.3, 0.5, 0.7])
    out = render_flatsort(g, view, 32, TAN, bg, tile_h=8, tile_w=32,
                          dup=4, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out["image"]),
        np.broadcast_to(np.asarray(bg), (32, 32, 3)), atol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(out["alpha"]), 0.0, atol=1e-6)
