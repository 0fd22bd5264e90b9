"""Disk providers round-trip: write synthetic renders in both on-disk
formats, load them back, and check the data contract + camera math."""

import os

import numpy as np
import pytest

from lgm_tpu.config import get_config
from lgm_tpu.data.provider import (Loader, LVISDataset, ObjaverseDataset,
                                   build_sample)
from lgm_tpu.utils import camera


def _render_views(n_views, size=32, seed=0):
    """Synthetic RGBA renders + orbit metadata via our own rasterizer."""
    import jax.numpy as jnp

    from lgm_tpu.data.synthetic import sample_scene
    from lgm_tpu.ops.gsplat import render_views

    rng = np.random.default_rng(seed)
    scene = sample_scene(rng, 128)
    els = rng.uniform(-30, 30, n_views)
    azs = rng.uniform(0, 360, n_views)
    poses = np.stack(
        [camera.orbit_camera(e, a, 1.5) for e, a in zip(els, azs)]
    )
    cams = camera.build_camera_inputs(poses, 49.1, 0.5, 2.5)
    out = render_views(
        jnp.asarray(scene)[None], jnp.asarray(cams["cam_view"])[None],
        size, float(np.tan(0.5 * np.deg2rad(49.1))), backend="xla",
    )
    rgb = np.asarray(out["image"][0])
    alpha = np.clip(np.asarray(out["alpha"][0, ..., 0]), 0, 1)
    return rgb, alpha, els, azs, poses


@pytest.fixture(scope="module")
def lvis_root(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("lvis")
    split = root / "00000-09999"
    n_scenes, n_views = 4, 8
    for s in range(n_scenes):
        scene_dir = split / f"scene{s:04d}"
        os.makedirs(scene_dir)
        rgb, alpha, els, azs, _ = _render_views(n_views, seed=s)
        for v in range(n_views):
            rgba = np.concatenate(
                [rgb[v][..., ::-1], alpha[v][..., None]], axis=-1
            )
            cv2.imwrite(str(scene_dir / f"{v:03d}.png"),
                        (rgba * 255).astype(np.uint8))
            # Stored elevation is negated on load (ref quirk).
            np.save(scene_dir / f"{v:03d}.npy",
                    {"elevation": -els[v], "azimuth": azs[v],
                     "radius": 1.5})
    return str(root)


@pytest.fixture(scope="module")
def objaverse_root(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("objaverse")
    n_objects, n_views = 4, 100
    for s in range(n_objects):
        obj = root / f"obj{s:04d}"
        os.makedirs(obj / "rgb")
        os.makedirs(obj / "pose")
        rgb, alpha, _, _, poses = _render_views(12, seed=100 + s)
        for v in range(n_views):
            vv = v % 12
            rgba = np.concatenate(
                [rgb[vv][..., ::-1], alpha[vv][..., None]], axis=-1
            )
            cv2.imwrite(str(obj / "rgb" / f"{v:03d}.png"),
                        (rgba * 255).astype(np.uint8))
            # Invert the provider's blender->opengl fix to produce the
            # stored format: opengl pose -> blender world + opencv cam.
            c2w = poses[vv].copy()
            c2w[:3, 1:3] *= -1          # opengl cam -> opencv cam
            c2w[[1, 2]] = c2w[[2, 1]]   # swap back rows
            c2w[1] *= -1
            np.savetxt(obj / "pose" / f"{v:03d}.txt",
                       c2w.reshape(-1)[None], fmt="%.8f")
    return str(root)


def _check_contract(sample, opt):
    V_in, V, H, S = (opt.num_input_views, opt.num_views, opt.input_size,
                     opt.output_size)
    assert sample["input"].shape == (V_in, H, H, 9)
    assert sample["images_output"].shape == (V, S, S, 3)
    assert sample["masks_output"].shape == (V, S, S, 1)
    assert sample["cam_view"].shape == (V, 4, 4)
    assert np.isfinite(sample["input"]).all()
    # Canonicalization: first pose at the front position means the first
    # cam_view equals the canonical front camera's.
    front = camera.build_camera_inputs(
        camera.orbit_camera(0, 0, opt.cam_radius)[None], opt.fovy,
        opt.znear, opt.zfar,
    )
    np.testing.assert_allclose(
        sample["cam_view"][0], np.asarray(front["cam_view"][0]), atol=2e-3
    )


def test_lvis_dataset(lvis_root):
    opt = get_config("nano").replace(
        data_path_rendering=lvis_root, num_input_views=2, num_views=4,
        batch_size=1, prob_cam_jitter=0.0,
    )
    ds = LVISDataset(opt, training=True)
    assert len(ds) == 3  # 4 scenes - batch_size split
    sample = ds[0]
    _check_contract(sample, opt)
    # Eval split is deterministic.
    ds_eval = LVISDataset(opt, training=False)
    a, b = ds_eval[0], ds_eval[0]
    np.testing.assert_array_equal(a["input"], b["input"])


def test_objaverse_dataset(objaverse_root):
    opt = get_config("nano").replace(
        data_path=objaverse_root, num_input_views=2, num_views=4,
        batch_size=1, prob_cam_jitter=0.0, prob_grid_distortion=0.0,
    )
    ds = ObjaverseDataset(opt, training=True)
    sample = ds[0]
    _check_contract(sample, opt)


def test_objaverse_skip_and_pad(objaverse_root, tmp_path):
    # Remove most views of one object: provider must pad by repetition.
    import shutil

    obj = os.path.join(str(tmp_path), "objx")
    shutil.copytree(os.path.join(objaverse_root, "obj0000"), obj)
    for f in sorted(os.listdir(os.path.join(obj, "rgb")))[2:]:
        os.remove(os.path.join(obj, "rgb", f))
    opt = get_config("nano").replace(
        num_input_views=2, num_views=4, batch_size=0,
        prob_cam_jitter=0.0, prob_grid_distortion=0.0,
    )
    ds = ObjaverseDataset(opt, training=False, items=[obj])
    ds.items = [obj]
    sample = ds[0]
    _check_contract(sample, opt)


def test_loader_batching(lvis_root):
    opt = get_config("nano").replace(
        data_path_rendering=lvis_root, num_input_views=2, num_views=4,
        batch_size=1,
    )
    ds = LVISDataset(opt, training=True)
    loader = Loader(ds, batch_size=2, shuffle=True, seed=0)
    batches = list(loader.epoch(0))
    assert len(batches) == len(ds) // 2
    for b in batches:
        assert b["input"].shape[0] == 2
