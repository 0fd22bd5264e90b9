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

import functools
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


@functools.lru_cache(maxsize=4)
def _device_batch_builder(opt: Options):
    """One jitted graph building the image-sized batch tensors ON DEVICE
    from [B, N, 14] scenes + [B, V, 4, 4] poses (a ~100 KB upload).

    The previous host pipeline rendered GT on device, read ~35 MB back,
    and re-uploaded ~70 MB of batch per step — through a remote-TPU
    tunnel (~15 MB/s) that dominated training at ~7 s/step. On-device
    the loop only moves scenes/poses up and metrics down. (On a local
    TPU host this also removes two pointless PCIe round trips.)"""
    import jax

    tan = float(np.tan(0.5 * np.deg2rad(opt.fovy)))

    def build(scenes, poses, cam_view):
        out = render_views(scenes, cam_view, opt.output_size, tan,
                           backend="auto", with_depth=False)
        images_output = out["image"]
        masks_output = jnp.clip(out["alpha"], 0.0, 1.0)

        if opt.input_size == opt.output_size:
            images_in = images_output[:, : opt.num_input_views]
        else:
            inp = render_views(
                scenes, cam_view[:, : opt.num_input_views],
                opt.input_size, tan, backend="auto", with_depth=False,
            )
            images_in = inp["image"]

        images_in = (images_in - IMAGENET_MEAN) / IMAGENET_STD
        plucker = jax.vmap(jax.vmap(
            lambda p: camera.plucker_rays(
                p, opt.input_size, opt.input_size, opt.fovy)
        ))(poses[:, : opt.num_input_views])
        inputs = jnp.concatenate([images_in, plucker], axis=-1)
        return inputs, images_output, masks_output

    return jax.jit(build)


def make_batch(
    rng: np.random.Generator,
    opt: Options,
    batch_size: Optional[int] = None,
    n_gaussians: int = 512,
) -> Dict[str, np.ndarray]:
    """Build one batch dict (NHWC). The image-sized tensors are DEVICE
    arrays produced by one jitted graph; the small tensors (cameras,
    scenes) stay host numpy. np.asarray() materializes the device
    entries when a consumer needs host data (tests, image dumps)."""
    B = batch_size or opt.batch_size
    scenes = np.stack(
        [sample_scene(rng, n_gaussians) for _ in range(B)]
    )  # [B, N, 14]
    poses = np.stack([sample_poses(rng, opt) for _ in range(B)])  # [B,V,4,4]
    cams = camera.build_camera_inputs(poses, opt.fovy, opt.znear, opt.zfar)

    inputs, images_output, masks_output = _device_batch_builder(opt)(
        jnp.asarray(scenes), jnp.asarray(poses),
        jnp.asarray(cams["cam_view"]),
    )

    return {
        "input": inputs,
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
