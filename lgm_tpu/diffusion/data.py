"""Multi-view frame datasets for diffusion U-Net finetuning.

The reference repo's readme trains its diffusion front-end with scripts
that are absent from the snapshot (ref: readme.md:35,50,70 point at
missing ``main_zero123plus_v4_batch_code*.py``), and the pod-scale
recipe (BASELINE.json config 5) couples LGM training with a multi-view
diffusion U-Net finetune. This module supplies the training-frame
contract consumed by ``lgm_tpu.diffusion.train``:

  images  [B, F, S, S, 3]  white-bg RGB in [0, 1]; F orbit frames of a
                           scene at one elevation, evenly spaced azimuths
  camera  [B, F, 16]       flattened blender-coord c2w at radius 1 — the
                           same conditioning ``get_camera`` builds at
                           sampling time (diffusion/mv_unet.py:33-51)
  prompts list[str]        one text prompt per scene

Two sources:
  SyntheticMVData — procedural Gaussian scenes rendered through our own
    rasterizer (self-contained; mirrors data/synthetic.py).
  LVISMVData — the LVIS disk layout (``NNN.png`` + ``NNN.npy``
    {elevation, azimuth, radius} per view — ref: provider_lvis.py:132-136),
    choosing F views nearest to an evenly spaced azimuth ring at a
    consistent elevation.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from lgm_tpu.utils import camera

_PROMPTS = (
    "a 3d rendering of an object",
    "a colorful 3d object on a white background",
    "an isometric view of a small object",
    "a render of a toy object",
)


def blender_condition(elevation: float, azimuth: float) -> np.ndarray:
    """[16] flattened conditioning pose: radius-1 orbit c2w with the
    blender coordinate flip — identical to what ``get_camera`` feeds the
    U-Net at sampling time (ref: mv_unet.py:20-39), so finetuned models
    stay consistent with the sampling-time conditioning."""
    pose = camera.orbit_camera(float(elevation), float(azimuth), radius=1.0)
    pose = pose.copy()
    pose[2] *= -1
    pose[[1, 2]] = pose[[2, 1]]
    return pose.flatten().astype(np.float32)


class SyntheticMVData:
    """Procedural multi-view frames: random blobby Gaussian scenes
    rendered at F evenly spaced azimuths (random start, random elevation
    in [-10, 30] — the band MVDream conditions on at inference)."""

    def __init__(self, num_frames: int = 4, image_size: int = 256,
                 length: int = 1024, seed: int = 0, fovy: float = 49.1,
                 radius: float = 1.5, n_gaussians: int = 512):
        self.num_frames = num_frames
        self.image_size = image_size
        self.length = length
        self.seed = seed
        self.fovy = fovy
        self.radius = radius
        self.n_gaussians = n_gaussians

    def __len__(self):
        return self.length

    def batch(self, step: int, batch_size: int) -> Dict:
        import jax.numpy as jnp

        from lgm_tpu.data.synthetic import sample_scene
        from lgm_tpu.ops.gsplat import render_views

        rng = np.random.default_rng((self.seed, step % self.length))
        F = self.num_frames
        scenes, poses, cams16, prompts = [], [], [], []
        for _ in range(batch_size):
            g = sample_scene(rng, self.n_gaussians)
            el = float(rng.uniform(-10.0, 30.0))
            az0 = float(rng.uniform(0.0, 360.0))
            azs = az0 + np.arange(F) * (360.0 / F)
            poses.append(np.stack([
                camera.orbit_camera(el, float(a), self.radius) for a in azs
            ]))
            cams16.append(np.stack([
                blender_condition(el, float(a)) for a in azs
            ]))
            scenes.append(g)
            prompts.append(_PROMPTS[int(rng.integers(len(_PROMPTS)))])
        poses = np.stack(poses)      # [B, F, 4, 4]
        cam_in = camera.build_camera_inputs(
            poses, self.fovy, 0.5, 2.5
        )
        tan = float(np.tan(0.5 * np.deg2rad(self.fovy)))
        out = render_views(
            jnp.asarray(np.stack(scenes)),
            jnp.asarray(cam_in["cam_view"]), self.image_size, tan,
        )
        return {
            "images": np.asarray(out["image"], np.float32),
            "camera": np.stack(cams16).astype(np.float32),
            "prompts": prompts,
        }


class LVISMVData:
    """LVIS disk scenes → diffusion frames (same file layout as
    data/provider.py LVISDataset; ref: provider_lvis.py:35-47,132-136)."""

    TEST_SPLITS = ("40000-49999",)

    def __init__(self, root: str, num_frames: int = 4,
                 image_size: int = 256, training: bool = True,
                 scene_dirs: Optional[List[str]] = None, seed: int = 0):
        self.num_frames = num_frames
        self.image_size = image_size
        self.training = training
        self.seed = seed
        if scene_dirs is None:
            splits = [
                s for s in sorted(os.listdir(root))
                if s not in self.TEST_SPLITS
                and os.path.isdir(os.path.join(root, s))
            ]
            scene_dirs = []
            for s in splits:
                scene_dirs.extend(sorted(
                    p for p in glob.glob(os.path.join(root, s, "*"))
                    if os.path.isdir(p)
                ))
        self.items = scene_dirs

    def __len__(self):
        return len(self.items)

    @staticmethod
    def _read_composited(ipath: str) -> Optional[np.ndarray]:
        """White-bg composited RGB [H, W, 3]: native C++ decode when it
        builds (lgm_tpu.native.decode_rgba; the provider's hot-path
        runtime), cv2 otherwise. None when unreadable."""
        from lgm_tpu.data.provider import _composite_rgba, _use_native_loader

        if _use_native_loader():
            from lgm_tpu import native

            rgba = native.decode_rgba(ipath)
            if rgba is None:
                return None
            a = rgba[..., 3:4]
            return rgba[..., :3] * a + (1.0 - a)
        import cv2

        img = cv2.imread(ipath, cv2.IMREAD_UNCHANGED)
        if img is None:
            return None
        rgb, _ = _composite_rgba(img.astype(np.float32) / 255.0)
        return rgb

    def _load_scene(self, uid: str, rng: np.random.Generator):
        import cv2

        views = []
        for cpath in sorted(glob.glob(os.path.join(uid, "*.npy"))):
            try:
                cam = np.load(cpath, allow_pickle=True).item()
            except Exception:
                continue
            views.append((os.path.splitext(cpath)[0] + ".png",
                          float(cam["elevation"]), float(cam["azimuth"])))
        if len(views) < self.num_frames:
            raise RuntimeError(f"too few views in {uid}")
        F = self.num_frames
        az0 = float(rng.uniform(0.0, 360.0)) if self.training else 0.0
        azs = np.asarray([v[2] for v in views])
        imgs, cams16 = [], []
        for k in range(F):
            want = (az0 + k * 360.0 / F) % 360.0
            d = np.abs((azs - want + 180.0) % 360.0 - 180.0)
            i = int(np.argmin(d))
            ipath, el, az = views[i]
            rgb = self._read_composited(ipath)
            if rgb is None:
                raise RuntimeError(f"unreadable view {ipath}")
            if rgb.shape[0] != self.image_size:
                rgb = cv2.resize(rgb, (self.image_size, self.image_size),
                                 interpolation=cv2.INTER_AREA)
            imgs.append(rgb)
            # Elevation sign flip matches the rendering provider
            # (ref: provider_lvis.py:134) so conditioning and geometry agree.
            cams16.append(blender_condition(-el, az))
        prompt = os.path.basename(uid).replace("_", " ")
        return np.stack(imgs), np.stack(cams16), prompt

    def batch(self, step: int, batch_size: int) -> Dict:
        rng = np.random.default_rng(
            None if self.training else (self.seed, step)
        )
        images, cams, prompts = [], [], []
        i = (step * batch_size) % max(len(self.items), 1)
        while len(images) < batch_size:
            uid = self.items[i % len(self.items)]
            i += 1
            try:
                im, cm, pr = self._load_scene(uid, rng)
            except Exception:
                continue
            images.append(im)
            cams.append(cm)
            prompts.append(pr)
        return {
            "images": np.stack(images).astype(np.float32),
            "camera": np.stack(cams).astype(np.float32),
            "prompts": prompts,
        }
