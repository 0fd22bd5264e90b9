"""LGM: multi-view U-Net -> per-pixel Gaussians -> differentiable render.

Flax re-design of the reference model (ref: core/models.py:14-174 and the
6-view LVIS variant core/models_lvis.py — a single class here: the view
count is derived from the input shape instead of being hardcoded to 4/6).

Data contract (NHWC; the reference is NCHW):
  input          [B, V_in, H, W, 9]   image(3, ImageNet-normalized) + Plücker(6)
  images_output  [B, V, S, S, 3]      supervision RGB in [0, 1]
  masks_output   [B, V, S, S, 1]
  cam_view       [B, V, 4, 4]         transposed w2c (reference layout)

The rendering of all B x V supervision views happens in one batched
computation (the reference loops Python-side over B*V CUDA launches,
core/gs.py:42-51).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from lgm_tpu.config import Options
from lgm_tpu.models.lpips import LPIPS
from lgm_tpu.models.unet import UNet
from lgm_tpu.ops.gsplat import render_views
from lgm_tpu.parallel.mesh import gather_gaussians


def activate_gaussians(x: jnp.ndarray) -> jnp.ndarray:
    """Per-attribute activations on raw U-Net output [..., N, 14]
    (ref: core/models.py:40-44): pos clamp(-1,1) | opacity sigmoid |
    scale 0.1*softplus | rgb 0.5*tanh+0.5.

    Rotation (exact reference semantics, REQUIRED for checkpoint
    parity): the reference's ``rot_act = F.normalize`` uses torch's
    default ``dim=1``, which on the [B, N, 4] quat slice normalizes each
    COMPONENT across the N Gaussians — not each quaternion (ref:
    core/models.py:43,112; same in core/models_lvis.py:46,116). The
    resulting per-quat norms are ~1/sqrt(N), and the CUDA rasterizer
    consumes them raw through the unit-quat formula (so trained
    checkpoints have near-identity rotations compensated by scale).
    Caught by the golden fixture tests/golden/lgm_tiny.npz: per-quat
    normalization renders differently from converted checkpoints. The
    Gaussian axis must therefore be axis -2 here.
    """
    pos = jnp.clip(x[..., 0:3], -1.0, 1.0)
    opacity = jax.nn.sigmoid(x[..., 3:4])
    scale = 0.1 * jax.nn.softplus(x[..., 4:7])
    rot = x[..., 7:11]
    # F.normalize(v) = v / max(||v||_2, eps), eps = 1e-12, over axis -2.
    # Double-where keeps the gradient finite at an exactly-zero column
    # (jnp.sqrt'(0) is inf; torch defines the norm's grad there as 0).
    sq = jnp.sum(rot * rot, axis=-2, keepdims=True)
    norm = jnp.where(sq > 0, jnp.sqrt(jnp.where(sq > 0, sq, 1.0)), 0.0)
    rot = rot / jnp.maximum(norm, 1e-12)
    rgb = 0.5 * jnp.tanh(x[..., 11:14]) + 0.5
    return jnp.concatenate([pos, opacity, scale, rot, rgb], axis=-1)


class LGM(nn.Module):
    """Splatter-image regressor. Callable as `model.apply(vars, images)`
    -> activated Gaussians [B, V_in * splat^2, 14]."""

    opt: Options
    dtype: Any = jnp.bfloat16
    # Optional (dp, vp) mesh: the U-Net runs with the (scene, input-view)
    # axis sharded over dp x vp, and the resulting per-view Gaussian
    # slices are all-gathered along vp before rasterization (the
    # sharded-Gaussian all-gather of BASELINE.json's pod config).
    mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        # images: [B, V_in, H, W, 9]
        B, V, H, W, C = images.shape
        x = images.reshape(B * V, H, W, C)
        x = UNet(
            out_channels=14,
            num_views=V,
            down_channels=self.opt.down_channels,
            down_attention=self.opt.down_attention,
            mid_attention=self.opt.mid_attention,
            up_channels=self.opt.up_channels,
            up_attention=self.opt.up_attention,
            dtype=self.dtype,
            remat=self.opt.unet_remat,
            mesh=self.mesh,
            name="unet",
        )(x)
        # Final 1x1 conv kept for reference-checkpoint parity
        # (ref: core/models.py:34).
        x = nn.Conv(14, (1, 1), dtype=jnp.float32, name="conv")(x)
        s = self.opt.splat_size
        x = x.reshape(B, V * s * s, 14)
        # All-gather the per-view Gaussian slices along vp: every vp chip
        # needs the full scene to render its supervision-view shard.
        x = gather_gaussians(x, self.mesh)
        return activate_gaussians(x)


def psnr(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """-10 log10(mse) (ref: core/models.py:170-172)."""
    mse = jnp.mean((pred - gt) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))


def _resize_to_256(x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear DOWNsample of [N, S, S, 3] to at most 256 for the LPIPS
    input (ref: core/models.py:156-163 bounds memory this way); images
    already <= 256 pass through untouched."""
    n, s = x.shape[0], x.shape[1]
    if s <= 256:
        return x
    return jax.image.resize(x, (n, 256, 256, 3), method="bilinear")


def _to_nchw(x: jnp.ndarray) -> jnp.ndarray:
    """[B, V, S, S, 3] -> [B*V, 3, S, S]: transpose first, then a
    channel-major reshape (a bitcast) — see the layout note in
    LGMWithLoss."""
    B, V, S = x.shape[0], x.shape[1], x.shape[2]
    return x.transpose(0, 1, 4, 2, 3).reshape(B * V, 3, S, S)


def _torch_bilinear_matrix(s_in: int, s_out: int) -> np.ndarray:
    """[s_out, s_in] row-stochastic matrix reproducing torch
    F.interpolate(mode='bilinear', align_corners=False, antialias=False)
    along one axis: output i samples src = (i+0.5)*s_in/s_out - 0.5 with
    two taps floor(src), floor(src)+1 (edge-clamped) and weights
    (1-frac, frac). Applying it as a matmul on each spatial axis is
    exact for ANY size, unlike jax.image.resize whose bilinear path
    antialiases (widens the kernel) on downscale."""
    src = (np.arange(s_out) + 0.5) * (s_in / s_out) - 0.5
    src = np.clip(src, 0.0, s_in - 1.0)
    i0 = np.floor(src).astype(np.int64)
    i1 = np.minimum(i0 + 1, s_in - 1)
    frac = (src - i0).astype(np.float32)
    w = np.zeros((s_out, s_in), dtype=np.float32)
    w[np.arange(s_out), i0] += 1.0 - frac
    w[np.arange(s_out), i1] += frac
    return w


def _resize_nchw_256(x: jnp.ndarray) -> jnp.ndarray:
    """[N, 3, S, S] -> [N, 3, 256, 256] (pass-through if S <= 256),
    numerically matching the reference's F.interpolate(bilinear,
    align_corners=False, antialias default False) at EVERY size (ref:
    core/models.py:156-163).

    The tap matrix is applied separably via two matmuls at EVERY size
    (at s=512 its rows are exactly 2-tap 1/2+1/2 averages, so this
    subsumes the 2x2 avg-pool identity). Matmuls beat the two
    formulations that were traced at big-bs2 and rejected: a 6D
    reshape+mean materializes odd-layout [.., 256, 2, 256, 2] copies
    (~7 ms/step), and strided slices + adds materialize four
    [16, 3, 512*512] interleaving fusions in the BACKWARD (~18 ms/step);
    the separable contraction is ~10 GFLOP f32 fwd per big-bs2 step —
    MXU work, not layout traffic."""
    n, s = x.shape[0], x.shape[2]
    if s <= 256:
        return x
    w = jnp.asarray(_torch_bilinear_matrix(s, 256))
    x = jnp.einsum("oh,nchw->ncow", w, x)
    return jnp.einsum("ow,nchw->ncho", w, x)


class _LPIPSScanBody(nn.Module):
    """nn.scan body: one LPIPS chunk per step. The inner module is named
    ``m``, so the LPIPS params live at <parent>/lpips_loss/m/..."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, carry, ab):
        # Chunks arrive NCHW (clean layout for the scan xs buffers); the
        # small per-chunk NHWC transpose happens here, inside the remat.
        a, b = ab
        a = a.transpose(0, 2, 3, 1)
        b = b.transpose(0, 2, 3, 1)
        return carry, LPIPS(dtype=self.dtype, name="m")(a, b)


class LGMWithLoss(nn.Module):
    """Training graph: forward Gaussians, batched render, full loss stack
    (ref: core/models.py:120-174)."""

    opt: Options
    dtype: Any = jnp.bfloat16
    rasterizer_backend: str = "auto"
    mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(
        self,
        data: Dict[str, jnp.ndarray],
        bg_color: jnp.ndarray,
    ) -> Dict[str, jnp.ndarray]:
        opt = self.opt
        gaussians = LGM(opt, self.dtype, mesh=self.mesh,
                        name="lgm")(data["input"])

        tan_half_fov = float(np.tan(0.5 * np.deg2rad(opt.fovy)))
        B, V = data["cam_view"].shape[:2]
        bg = jnp.broadcast_to(bg_color, (B, V, 3))
        rendered = render_views(
            gaussians.astype(jnp.float32),
            data["cam_view"],
            opt.output_size,
            tan_half_fov,
            bg_color=bg,
            backend=self.rasterizer_backend,
            # The loss reads image+alpha only; skipping depth keeps z out
            # of the rasterizer backward's per-slot scatter-add.
            with_depth=False,
            tile_h=opt.tile_h,
            tile_w=opt.tile_w,
            max_per_tile=opt.max_gaussians_per_tile,
            dup=opt.rasterizer_dup,
        )
        pred_images = rendered["image"]   # [B, V, S, S, 3]
        pred_alphas = rendered["alpha"]   # [B, V, S, S, 1]

        gt_images = data["images_output"]
        gt_masks = data["masks_output"]
        gt_images = gt_images * gt_masks + bg[:, :, None, None, :] * (
            1.0 - gt_masks
        )

        loss_mse = jnp.mean((pred_images - gt_images) ** 2) + jnp.mean(
            (pred_alphas - gt_masks) ** 2
        )
        loss = loss_mse

        out = {
            "gaussians": gaussians,
            "images_pred": pred_images,
            "alphas_pred": pred_alphas,
            "loss_mse": loss_mse,
            "psnr": psnr(jax.lax.stop_gradient(pred_images), gt_images),
        }

        if opt.lambda_scale_reg > 0:
            # Collapse guard (see config.lambda_scale_reg): penalize only
            # splats wider than 0.1 scene units — the fog basin's
            # screen-covering cloud — leaving healthy splats untouched.
            too_big = jax.nn.relu(
                gaussians[..., 4:7].astype(jnp.float32) - 0.1)
            loss_reg = jnp.mean(too_big)
            out["loss_reg"] = loss_reg
            loss = loss + opt.lambda_scale_reg * loss_reg

        if opt.lambda_lpips > 0:
            # LPIPS is frozen: no gradient flows into its parameters (the
            # reference excludes them from training and checkpoints,
            # core/models.py:46-58); achieved here via stop_gradient on
            # the param tree at the train-step level (mask in optimizer).
            #
            # Memory, two constraints shape this block:
            # 1. The VGG tower on all B*V pairs at once holds ~6 GB of
            #    activations at the small preset (96 pairs) — so the
            #    module runs as a sequential nn.scan over chunks with
            #    remat inside; at most one chunk's VGG transients are
            #    live at a time. (A plain unrolled loop is NOT enough:
            #    XLA's scheduler overlaps the chunks and the peak comes
            #    right back.)
            # 2. All reshapes happen in channel-major (NCHW) form: a
            #    jnp.reshape of a channels-minor image canonicalizes to
            #    a row-major layout, which the TPU stores (8,128)-tiled
            #    over the 3-wide minor dim — a 42x padding blow-up on
            #    every such buffer (measured: single 1.5 GB copies).
            #    Each scan step transposes its small chunk back to NHWC.
            pr = _resize_nchw_256(_to_nchw(pred_images) * 2 - 1)
            gt = _resize_nchw_256(_to_nchw(gt_images) * 2 - 1)
            n = pr.shape[0]
            chunk = next(c for c in (4, 2, 1) if n % c == 0)
            gt_c = gt.astype(self.dtype).reshape(n // chunk, chunk,
                                                 *gt.shape[1:])
            pr_c = pr.astype(self.dtype).reshape(n // chunk, chunk,
                                                 *pr.shape[1:])
            scanned = nn.scan(
                nn.remat(_LPIPSScanBody, prevent_cse=False),
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=0, out_axes=0,
            )(dtype=self.dtype, name="lpips_loss")
            _, vals = scanned(0.0, (gt_c, pr_c))
            loss_lpips = jnp.mean(vals)
            out["loss_lpips"] = loss_lpips
            loss = loss + opt.lambda_lpips * loss_lpips

        out["loss"] = loss
        return out
