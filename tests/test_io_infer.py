"""PLY round-trip, augmentations, weight-converter mapping, and the
inference orbit-video path."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lgm_tpu.config import get_config
from lgm_tpu.io.ply import load_ply, save_ply
from lgm_tpu.utils.augment import (grid_distortion, orbit_camera_jitter,
                                   rotvec_to_rotmat)


def _random_gaussians(n=64, seed=0):
    rng = np.random.default_rng(seed)
    g = np.zeros((n, 14), np.float32)
    g[:, 0:3] = rng.uniform(-1, 1, (n, 3))
    g[:, 3] = rng.uniform(0.01, 0.99, n)
    g[:, 4:7] = rng.uniform(0.005, 0.2, (n, 3))
    q = rng.normal(0, 1, (n, 4))
    g[:, 7:11] = q / np.linalg.norm(q, axis=1, keepdims=True)
    g[:, 11:14] = rng.uniform(0.01, 0.99, (n, 3))
    return g


def test_ply_roundtrip(tmp_path):
    g = _random_gaussians()
    path = str(tmp_path / "test.ply")
    save_ply(g, path)
    g2 = load_ply(path)
    # Activation inversion + re-activation is the identity
    # (ref: core/gs.py:124-127 vs :185-188); all opacities > prune thresh.
    np.testing.assert_allclose(g2, g, rtol=1e-4, atol=1e-5)


def test_ply_prunes_low_opacity(tmp_path):
    g = _random_gaussians()
    g[:10, 3] = 0.001  # below 0.005 prune threshold
    path = str(tmp_path / "pruned.ply")
    save_ply(g, path)
    g2 = load_ply(path)
    assert g2.shape[0] == g.shape[0] - 10


def test_rotvec_to_rotmat():
    # 90 deg about z.
    R = rotvec_to_rotmat(np.array([0, 0, np.pi / 2], np.float32))
    np.testing.assert_allclose(
        R @ np.array([1, 0, 0.0]), [0, 1, 0], atol=1e-6
    )
    # Orthonormality for random vectors.
    rng = np.random.default_rng(0)
    v = rng.normal(0, 1, (5, 3)).astype(np.float32)
    Rs = rotvec_to_rotmat(v)
    for R in Rs:
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_orbit_camera_jitter_preserves_radius():
    from lgm_tpu.utils import camera

    poses = np.stack(
        [camera.orbit_camera(10, az, 1.5) for az in (0, 90, 180)]
    )
    jit = orbit_camera_jitter(poses, rng=np.random.default_rng(0))
    # Rotation about origin: camera distance preserved.
    np.testing.assert_allclose(
        np.linalg.norm(jit[:, :3, 3], axis=1), 1.5, atol=1e-5
    )
    # Rotations stay orthonormal.
    for p in jit:
        np.testing.assert_allclose(
            p[:3, :3] @ p[:3, :3].T, np.eye(3), atol=1e-5
        )
    assert not np.allclose(jit, poses)


def test_grid_distortion_separable_parity():
    """The separable fast path equals the generic 2-D tap sampler on a
    meshgrid grid (same math, reassociated) — including out-of-range
    zero padding."""
    from lgm_tpu.utils.augment import _bilinear_sample, _bilinear_sample_sep

    rng = np.random.default_rng(5)
    img = rng.uniform(0, 1, (37, 29, 3)).astype(np.float32)
    xs = rng.uniform(-1.15, 1.15, 29).astype(np.float32)
    ys = rng.uniform(-1.15, 1.15, 37).astype(np.float32)
    gx, gy = np.meshgrid(xs, ys, indexing="xy")
    ref = _bilinear_sample(img, gx, gy)
    fast = _bilinear_sample_sep(img, xs, ys)
    np.testing.assert_allclose(fast, ref, atol=2e-6)


def test_grid_distortion_shape_and_range():
    rng = np.random.default_rng(1)
    imgs = rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32)
    out = grid_distortion(imgs, strength=0.5, rng=np.random.default_rng(2))
    assert out.shape == imgs.shape
    assert np.isfinite(out).all()
    assert out.min() >= -1e-6 and out.max() <= 1 + 1e-6
    # Note: the reference warp is NOT identity even at zero strength
    # (segment boundaries are duplicated, core/utils.py:85-95) — verified
    # against torch grid_sample to 6e-8. Check the underlying sampler on a
    # true identity grid instead.
    from lgm_tpu.utils.augment import _bilinear_sample

    W = 16
    coords = ((np.arange(W, dtype=np.float32) + 0.5) * 2 / W) - 1
    gx, gy = np.meshgrid(coords, coords, indexing="xy")
    ident = _bilinear_sample(imgs[0], gx, gy)
    np.testing.assert_allclose(ident, imgs[0], atol=1e-6)


def test_weight_converter_mapping():
    from lgm_tpu.models.lgm import LGM
    from lgm_tpu.tools.convert_weights import (convert_state_dict,
                                               load_reference_lgm,
                                               torch_name_to_flax_path)

    opt = get_config("nano")
    model = LGM(opt)
    imgs = jnp.zeros((1, 2, opt.input_size, opt.input_size, 9))
    params = model.init(jax.random.PRNGKey(0), imgs)["params"]

    # Build a fake torch state dict covering the whole flax tree by
    # inverting the mapping: every flax leaf must be reachable.
    def flax_to_torch(path, leaf, arr):
        names = {
            "kernel": "weight", "scale": "weight", "bias": "bias",
        }
        parts = []
        for p in path:
            key = p.key
            if key.startswith("down") and key != "down":
                parts.append(f"down_blocks.{key[4:]}")
            elif key.startswith("up") and key != "up":
                parts.append(f"up_blocks.{key[2:]}")
            elif key == "mid":
                parts.append("mid_block")
            elif key.startswith("res"):
                parts.append(f"nets.{key[3:]}")
            elif key.startswith("attn"):
                parts.append(f"attns.{key[4:]}")
            elif key in ("qkv", "proj", "norm"):
                # attn submodules: qkv/proj live under .attn
                if key in ("qkv", "proj"):
                    parts.append(f"attn.{key}")
                else:
                    parts.append("norm")
            elif key == "down":
                parts.append("downsample")
            elif key == "up":
                parts.append("upsample")
            else:
                parts.append(key)
        name = ".".join(["unet"] + parts[1:] if parts[0] == "unet"
                        else parts) + "." + names[leaf]
        if arr.ndim == 4:  # HWIO -> OIHW
            return name, np.asarray(arr).transpose(3, 2, 0, 1)
        if arr.ndim == 2:
            return name, np.asarray(arr).T
        return name, np.asarray(arr)

    sd = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, arr in flat:
        leaf = path[-1].key
        name, val = flax_to_torch(path[:-1], leaf, arr)
        sd[name] = rngfill = np.random.default_rng(
            abs(hash(name)) % 2**31
        ).normal(0, 1, val.shape).astype(np.float32)

    converted = convert_state_dict(sd)
    merged = load_reference_lgm_from_dict(sd, params)
    # Every leaf must now equal the converted torch value (transformed).
    n_checked = 0
    for path, arr in jax.tree_util.tree_flatten_with_path(merged)[0]:
        leaf = path[-1].key
        name, _ = flax_to_torch(path[:-1], leaf, arr)
        src = sd[name]
        if src.ndim == 4:
            src = src.transpose(2, 3, 1, 0)
        elif src.ndim == 2:
            src = src.T
        np.testing.assert_array_equal(np.asarray(arr), src)
        n_checked += 1
    assert n_checked == len(sd)


def load_reference_lgm_from_dict(sd, init_params):
    from lgm_tpu.tools import convert_weights as cw

    converted = cw.convert_state_dict(sd)
    return cw._merge(init_params, converted)


def test_infer_orbit_video(tmp_path):
    from lgm_tpu.infer import render_orbit_video

    opt = get_config("nano")
    g = _random_gaussians(128, seed=5)
    g[:, 0:3] *= 0.5
    out_path = str(tmp_path / "orbit.mp4")
    video = render_orbit_video(g, opt, out_path, n_frames=8, fps=4, chunk=4)
    assert os.path.exists(out_path) and os.path.getsize(out_path) > 0
    assert video.shape == (8, opt.output_size, opt.output_size, 3)
    # Frames differ (the orbit moves).
    assert np.abs(video[0].astype(int) - video[4].astype(int)).max() > 10


def test_orbit_video_device_sharded_matches_single(tmp_path):
    """Frame-sharded rendering (shard_map over the 8 virtual devices)
    must reproduce the single-device orbit, including a padded short
    final chunk (10 frames over 8 devices -> one padded chunk)."""
    import jax

    from lgm_tpu.infer import render_orbit_video

    assert jax.device_count() >= 8
    opt = get_config("nano")
    g = _random_gaussians(128, seed=9)
    g[:, 0:3] *= 0.5
    v1 = render_orbit_video(
        g, opt, str(tmp_path / "a.mp4"), n_frames=10, fps=4, chunk=8,
        n_devices=1,
    )
    v8 = render_orbit_video(
        g, opt, str(tmp_path / "b.mp4"), n_frames=10, fps=4, chunk=8,
        n_devices=8,
    )
    assert v8.shape == v1.shape == (10, opt.output_size, opt.output_size, 3)
    # Same math per frame; uint8 outputs may differ by 1 on rounding
    # boundaries at most.
    assert np.abs(v1.astype(int) - v8.astype(int)).max() <= 1


def test_recenter_centers_and_scales():
    from lgm_tpu.utils.image import mv_grid_2x2, recenter, rgba_to_rgb_white

    # Off-center 10x20 foreground block in a 64x48 image.
    img = np.zeros((64, 48, 4), np.float32)
    img[2:12, 3:23, :3] = 0.5
    img[2:12, 3:23, 3] = 1.0
    out = recenter(img, img[..., 3] > 0, border_ratio=0.2)
    assert out.shape == (64, 64, 4)
    ys, xs = np.nonzero(out[..., 3] > 0)
    h, w = ys.max() - ys.min() + 1, xs.max() - xs.min() + 1
    # Longer side fills ~(1 - border) of the canvas, aspect preserved.
    assert abs(w - int(64 * 0.8)) <= 2
    assert abs(h / w - 10 / 20) < 0.1
    # Centered within a pixel of rounding.
    assert abs((ys.max() + ys.min()) / 2 - 31.5) <= 1.5
    assert abs((xs.max() + xs.min()) / 2 - 31.5) <= 1.5

    # Empty mask: pass-through into the square canvas.
    empty = recenter(img, np.zeros((64, 48), bool))
    np.testing.assert_array_equal(empty[:64, :48], img)

    # White compositing: bg -> 1, fg keeps color.
    rgb = rgba_to_rgb_white(out)
    assert rgb.shape == (64, 64, 3)
    assert rgb[0, 0, 0] == 1.0

    grid = mv_grid_2x2(np.stack([np.full((4, 4, 3), i, np.float32)
                                 for i in range(4)]))
    assert grid.shape == (8, 8, 3)
    assert grid[0, 0, 0] == 1 and grid[0, 7, 0] == 2
    assert grid[7, 0, 0] == 3 and grid[7, 7, 0] == 0
