"""Synthetic multi-view dataset: procedural Gaussian scenes rendered with
our own rasterizer.

The reference ships only template/S3 providers that abort without a
private dataset (ref: core/provider_objaverse.py:22-31), so this module is
the framework's self-contained data source: it samples random blobby
Gaussian objects, renders ground-truth views through the XLA/Pallas
renderer, and emits exactly the provider data contract
(ref: core/provider_objaverse.py:58-172, NHWC here):

  input          [V_in, H, W, 9]  ImageNet-normalized RGB + Plücker rays
  images_output  [V, S, S, 3]     white-bg composited RGB
  masks_output   [V, S, S, 1]
  cam_view / cam_view_proj / cam_pos

Because the ground truth is itself produced by Gaussian splatting, an LGM
trained on this data can in principle fit it exactly — which makes the
dataset double as an end-to-end convergence test of the whole stack.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lgm_tpu.config import Options
from lgm_tpu.ops.gsplat import render_views
from lgm_tpu.utils import camera

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def sample_scene(rng: np.random.Generator, n_gaussians: int = 512,
                 n_blobs: int = 6) -> np.ndarray:
    """Random blobby object: clustered Gaussians inside [-0.7, 0.7]^3."""
    centers = rng.uniform(-0.45, 0.45, (n_blobs, 3))
    blob_col = rng.uniform(0.05, 0.95, (n_blobs, 3))
    assign = rng.integers(0, n_blobs, n_gaussians)
    g = np.zeros((n_gaussians, 14), np.float32)
    g[:, 0:3] = centers[assign] + rng.normal(0, 0.12, (n_gaussians, 3))
    g[:, 0:3] = np.clip(g[:, 0:3], -0.75, 0.75)
    g[:, 3] = rng.uniform(0.5, 1.0, n_gaussians)
    g[:, 4:7] = rng.uniform(0.02, 0.08, (n_gaussians, 3))
    q = rng.normal(0, 1, (n_gaussians, 4))
    g[:, 7:11] = q / np.linalg.norm(q, axis=1, keepdims=True)
    g[:, 11:14] = np.clip(
        blob_col[assign] + rng.normal(0, 0.1, (n_gaussians, 3)), 0, 1
    )
    return g


def sample_poses(rng: np.random.Generator, opt: Options) -> np.ndarray:
    """V orbit poses: V_in evenly spaced input views at a random elevation
    (matching the reference's front-region input views), plus random
    supervision views; pose 0 canonicalized to the fixed front position
    (ref: core/provider_objaverse.py:127-128)."""
    el_in = rng.uniform(-20.0, 20.0)
    az0 = rng.uniform(0.0, 360.0)
    poses = [
        camera.orbit_camera(
            el_in, az0 + i * (360.0 / opt.num_input_views), opt.cam_radius
        )
        for i in range(opt.num_input_views)
    ]
    for _ in range(opt.num_views - opt.num_input_views):
        poses.append(
            camera.orbit_camera(
                rng.uniform(-60.0, 60.0), rng.uniform(0, 360),
                opt.cam_radius,
            )
        )
    poses = np.stack(poses)
    return np.asarray(camera.canonicalize_poses(poses, opt.cam_radius))


def _plucker_stack(poses: np.ndarray, size: int, fovy: float) -> np.ndarray:
    return np.stack(
        [camera.plucker_rays(p, size, size, fovy) for p in poses]
    ).astype(np.float32)


def make_batch(
    rng: np.random.Generator,
    opt: Options,
    batch_size: Optional[int] = None,
    n_gaussians: int = 512,
) -> Dict[str, np.ndarray]:
    """Build one host-side batch dict (numpy, NHWC)."""
    B = batch_size or opt.batch_size
    scenes = np.stack(
        [sample_scene(rng, n_gaussians) for _ in range(B)]
    )  # [B, N, 14]
    poses = np.stack([sample_poses(rng, opt) for _ in range(B)])  # [B,V,4,4]
    cams = camera.build_camera_inputs(poses, opt.fovy, opt.znear, opt.zfar)
    tan = float(np.tan(0.5 * np.deg2rad(opt.fovy)))

    # Ground-truth renders: supervision views at output_size on white bg.
    out = render_views(
        jnp.asarray(scenes), jnp.asarray(cams["cam_view"]),
        opt.output_size, tan, backend="auto",
    )
    images_output = np.asarray(out["image"], np.float32)
    masks_output = np.clip(np.asarray(out["alpha"], np.float32), 0.0, 1.0)

    # Input views at input_size (white bg), first V_in poses.
    if opt.input_size == opt.output_size:
        images_in = images_output[:, : opt.num_input_views]
    else:
        inp = render_views(
            jnp.asarray(scenes),
            jnp.asarray(cams["cam_view"][:, : opt.num_input_views]),
            opt.input_size, tan, backend="auto",
        )
        images_in = np.asarray(inp["image"], np.float32)

    images_in = (images_in - IMAGENET_MEAN) / IMAGENET_STD
    plucker = np.stack(
        [
            _plucker_stack(p[: opt.num_input_views], opt.input_size, opt.fovy)
            for p in poses
        ]
    )  # [B, V_in, H, W, 6]
    inputs = np.concatenate([images_in, plucker], axis=-1)

    return {
        "input": inputs.astype(np.float32),
        "images_output": images_output,
        "masks_output": masks_output,
        "cam_view": np.asarray(cams["cam_view"], np.float32),
        "cam_view_proj": np.asarray(cams["cam_view_proj"], np.float32),
        "cam_pos": np.asarray(cams["cam_pos"], np.float32),
        "scenes": scenes,  # kept for oracle/debug use
    }


class SyntheticDataset:
    """Iterable synthetic dataset with a fixed seed per epoch."""

    def __init__(self, opt: Options, training: bool = True,
                 n_gaussians: int = 512, length: int = 1000, seed: int = 0):
        self.opt = opt
        self.training = training
        self.n_gaussians = n_gaussians
        self.length = length
        self.seed = seed if training else seed + 777_777

    def __len__(self):
        return self.length

    def batch(self, step: int) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng((self.seed, step))
        return make_batch(rng, self.opt, n_gaussians=self.n_gaussians)
