"""Multi-view latent diffusion U-Net (MVDream / ImageDream) in Flax.

TPU-native re-design of the reference's torch model
(ref: mvdream/mv_unet.py:615-1005): a Stable-Diffusion-2-style latent UNet
whose transformer blocks attend across all F frames jointly — the
self-attention sequence is reshaped (b f) l c -> b (f l) c
(ref: mv_unet.py:267-273) — with sinusoidal timestep embeddings, a camera
embedding MLP on flattened 4x4 poses (ref: mv_unet.py:746-756), and the
ImageDream image-prompt (ip) branch: a Perceiver ``Resampler`` compresses
CLIP image features into ip_dim tokens appended to the text context, read
by separate to_k_ip/to_v_ip projections with weight ip_weight
(ref: mv_unet.py:335-428, 163-226), and the reference image latent is
substituted as the last frame (ref: mv_unet.py:986-991).

Layout is NHWC (torch reference is NCHW). Defaults mirror the published
``mvdream-sd2.1`` / ``imagedream-ipmv`` checkpoints so converted weights
drop in (tools/convert_diffusion.py).
"""

from __future__ import annotations

import math
import os
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lgm_tpu.utils.camera import orbit_camera


def get_camera(num_frames: int, elevation: float = 0.0,
               azimuth_start: float = 0.0, azimuth_span: float = 360.0,
               blender_coord: bool = True,
               extra_view: bool = False) -> np.ndarray:
    """[F(+1), 16] flattened camera poses for conditioning
    (ref: mv_unet.py:20-39); the optional extra view (ImageDream ip frame)
    is a zero pose."""
    gap = azimuth_span / num_frames
    cams = []
    for az in np.arange(azimuth_start, azimuth_span + azimuth_start, gap):
        pose = orbit_camera(elevation, float(az), radius=1.0)
        if blender_coord:
            pose = pose.copy()
            pose[2] *= -1
            pose[[1, 2]] = pose[[2, 1]]
        cams.append(pose.flatten())
    if extra_view:
        cams.append(np.zeros_like(cams[0]))
    return np.stack(cams).astype(np.float32)


def timestep_embedding(timesteps: jnp.ndarray, dim: int,
                       max_period: int = 10000) -> jnp.ndarray:
    """Sinusoidal embeddings, cos-first ordering (ref: mv_unet.py:42-67)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def _attention(q, k, v, heads: int):
    """[B, Nq, C] x [B, Nk, C] -> [B, Nq, C] multi-head attention.

    Self-attention over the joint cross-view sequence ((b f) l c ->
    b (f l) c, up to 5*32² = 5120 tokens) takes the Pallas TPU flash
    kernel with TUNED block sizes — the kernel's default 512 blocks run
    ~6x off their tuned speed at small head dims (measured in
    models/unet.py's twin of this gate), and the dense path materializes
    [B, H, S, S] logits. Short sequences (and the 77-token text
    cross-attention) stay dense unless the logits transient is large."""
    B, Nq, C = q.shape
    Nk = k.shape[1]
    hd = C // heads
    q = q.reshape(B, Nq, heads, hd)
    k = k.reshape(B, Nk, heads, hd)
    v = v.reshape(B, Nk, heads, hd)
    logits_bytes = B * heads * Nq * Nk * 2
    if (jax.default_backend() == "tpu" and Nq == Nk and Nq % 512 == 0
            and (Nq >= 2048 or logits_bytes > 2e8)):
        if os.environ.get("LGM_TPU_ATTN", "flash") == "kres" and hd <= 64:
            # Same K-resident kernel as models/unet.py's gate (see the
            # A/B there); the joint (f l) sequence (<= 5*32² tokens) and
            # small head dims are exactly its regime.
            from lgm_tpu.ops.mha import mha_kresident

            o = mha_kresident(
                q.transpose(0, 2, 1, 3).reshape(B * heads, Nq, hd),
                k.transpose(0, 2, 1, 3).reshape(B * heads, Nk, hd),
                v.transpose(0, 2, 1, 3).reshape(B * heads, Nk, hd),
                float(hd) ** -0.5,
            ).reshape(B, heads, Nq, hd).transpose(0, 2, 1, 3)
            return o.reshape(B, Nq, C)
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes,
            flash_attention,
        )

        b = 1024 if Nq % 1024 == 0 else 512
        bs = BlockSizes(
            block_q=b, block_k_major=b, block_k=b, block_b=1,
            block_q_major_dkv=b, block_k_major_dkv=b, block_k_dkv=b,
            block_q_dkv=b, block_k_major_dq=b, block_k_dq=b,
            block_q_dq=b,
        )
        o = flash_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), sm_scale=float(hd) ** -0.5,
            block_sizes=bs,
        ).transpose(0, 2, 1, 3)
    else:
        o = jax.nn.dot_product_attention(q, k, v)
    return o.reshape(B, Nq, C)


class GEGLU(nn.Module):
    dim_out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        x, gate = jnp.split(x, 2, axis=-1)
        return x * nn.gelu(gate)


class FeedForward(nn.Module):
    """GEGLU MLP (ref: mv_unet.py:120-137, glu=True path)."""

    mult: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        h = GEGLU(dim * self.mult, dtype=self.dtype, name="net_0")(x)
        return nn.Dense(dim, dtype=self.dtype, name="net_2")(h)


class CrossAttention(nn.Module):
    """q from x, k/v from context (self-attention when context is None);
    optional image-prompt branch on the trailing ip_dim context tokens
    (ref: mv_unet.py:139-226)."""

    heads: int
    dim_head: int
    ip_dim: int = 0
    ip_weight: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        inner = self.heads * self.dim_head
        ctx = x if context is None else context
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)

        ip_ctx = None
        if self.ip_dim > 0 and context is not None:
            ip_ctx = ctx[:, -self.ip_dim:, :]
            ctx = ctx[:, : ctx.shape[1] - self.ip_dim, :]

        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
        out = _attention(q, k, v, self.heads)

        if ip_ctx is not None:
            k_ip = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                            name="to_k_ip")(ip_ctx)
            v_ip = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                            name="to_v_ip")(ip_ctx)
            out = out + self.ip_weight * _attention(q, k_ip, v_ip, self.heads)

        return nn.Dense(x.shape[-1], dtype=self.dtype, name="to_out_0")(out)


class BasicTransformerBlock3D(nn.Module):
    """Self-attention across all frames jointly, per-frame cross-attention
    to the context, GEGLU FF (ref: mv_unet.py:229-276)."""

    heads: int
    dim_head: int
    ip_dim: int = 0
    ip_weight: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context, num_frames: int):
        # x: [(B F), L, C]
        BF, L, C = x.shape
        B = BF // num_frames
        h = x.reshape(B, num_frames * L, C)
        h = h + CrossAttention(
            self.heads, self.dim_head, dtype=self.dtype, name="attn1"
        )(nn.LayerNorm(dtype=self.dtype, name="norm1")(h), None)
        x = h.reshape(BF, L, C)
        x = x + CrossAttention(
            self.heads, self.dim_head, ip_dim=self.ip_dim,
            ip_weight=self.ip_weight, dtype=self.dtype, name="attn2",
        )(nn.LayerNorm(dtype=self.dtype, name="norm2")(x), context)
        x = x + FeedForward(dtype=self.dtype, name="ff")(
            nn.LayerNorm(dtype=self.dtype, name="norm3")(x)
        )
        return x


class SpatialTransformer3D(nn.Module):
    """GN -> linear proj_in -> 3D transformer blocks -> zero-init proj_out,
    residual (ref: mv_unet.py:279-332)."""

    heads: int
    dim_head: int
    depth: int = 1
    ip_dim: int = 0
    ip_weight: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context, num_frames: int):
        BF, H, W, C = x.shape
        res = x
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32,
                         name="norm")(x).astype(self.dtype)
        h = h.reshape(BF, H * W, C)
        h = nn.Dense(self.heads * self.dim_head, dtype=self.dtype,
                     name="proj_in")(h)
        for d in range(self.depth):
            h = BasicTransformerBlock3D(
                self.heads, self.dim_head, self.ip_dim, self.ip_weight,
                dtype=self.dtype, name=f"transformer_blocks_{d}",
            )(h, context, num_frames)
        h = nn.Dense(C, dtype=self.dtype, name="proj_out",
                     kernel_init=nn.initializers.zeros)(h)
        return h.reshape(BF, H, W, C) + res


class PerceiverAttention(nn.Module):
    """Latents query (image features ++ latents) (ref: mv_unet.py:335-384)."""

    heads: int
    dim_head: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, latents):
        inner = self.heads * self.dim_head
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        latents = nn.LayerNorm(dtype=self.dtype, name="norm2")(latents)
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     name="to_q")(latents)
        kv_in = jnp.concatenate([x, latents], axis=-2)
        kv = nn.Dense(inner * 2, use_bias=False, dtype=self.dtype,
                      name="to_kv")(kv_in)
        k, v = jnp.split(kv, 2, axis=-1)
        out = _attention(q, k, v, self.heads)
        return nn.Dense(latents.shape[-1], use_bias=False, dtype=self.dtype,
                        name="to_out")(out)


class Resampler(nn.Module):
    """Perceiver resampler: CLIP image features -> num_queries context
    tokens (ref: mv_unet.py:386-428)."""

    dim: int = 1024
    depth: int = 4
    dim_head: int = 64
    heads: int = 12
    num_queries: int = 16
    output_dim: int = 1024
    ff_mult: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        latents = self.param(
            "latents",
            lambda key, shape: jax.random.normal(key, shape)
            / math.sqrt(self.dim),
            (1, self.num_queries, self.dim),
        )
        latents = jnp.broadcast_to(
            latents, (B, self.num_queries, self.dim)
        ).astype(self.dtype)
        x = nn.Dense(self.dim, dtype=self.dtype, name="proj_in")(x)
        for i in range(self.depth):
            latents = latents + PerceiverAttention(
                self.heads, self.dim_head, dtype=self.dtype,
                name=f"layers_{i}_attn",
            )(x, latents)
            h = nn.LayerNorm(dtype=self.dtype, name=f"layers_{i}_ff_norm")(
                latents
            )
            h = nn.Dense(self.dim * self.ff_mult, use_bias=False,
                         dtype=self.dtype, name=f"layers_{i}_ff_1")(h)
            h = nn.gelu(h)
            h = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                         name=f"layers_{i}_ff_3")(h)
            latents = latents + h
        latents = nn.Dense(self.output_dim, dtype=self.dtype,
                           name="proj_out")(latents)
        return nn.LayerNorm(dtype=self.dtype, name="norm_out")(latents)


class ResBlock(nn.Module):
    """Time-conditioned residual block (ref: mv_unet.py:516-612);
    additive emb injection (use_scale_shift_norm=False as in the published
    MVDream checkpoints). ``up``/``down`` apply nearest-resize/avg-pool to
    both branches before the first conv."""

    out_channels: int
    up: bool = False
    down: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, emb):
        ch_in = x.shape[-1]
        h = nn.GroupNorm(32, epsilon=1e-5, dtype=jnp.float32,
                         name="in_norm")(x).astype(self.dtype)
        h = nn.silu(h)
        if self.up:
            B, H, W, C = h.shape
            h = jax.image.resize(h, (B, H * 2, W * 2, C), "nearest")
            x = jax.image.resize(x, (B, H * 2, W * 2, x.shape[-1]),
                                 "nearest")
        elif self.down:
            h = nn.avg_pool(h, (2, 2), strides=(2, 2))
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                    name="in_conv")(h)
        e = nn.Dense(self.out_channels, dtype=self.dtype,
                     name="emb_1")(nn.silu(emb))
        h = h + e[:, None, None, :]
        h = nn.GroupNorm(32, epsilon=1e-5, dtype=jnp.float32,
                         name="out_norm")(h).astype(self.dtype)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                    name="out_conv", kernel_init=nn.initializers.zeros)(h)
        if ch_in != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="skip")(x)
        return x + h


class Downsample(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # Torch Conv2d(3, stride=2, padding=1) pads (1,1); Flax "SAME" at
        # stride 2 pads (0,1) — explicit padding keeps checkpoint parity
        # (ref: mvdream/mv_unet.py:481-505).
        return nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                       padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name="op")(x)


class Upsample(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), "nearest")
        return nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                       name="conv")(x)


class MultiViewUNetModel(nn.Module):
    """Full multi-view diffusion U-Net (ref: mv_unet.py:615-1005).

    Inputs (NHWC): x [(B F), H, W, C_in] latents, timesteps [(B F)],
    context [(B F), L, context_dim] text tokens, camera [(B F), 16];
    ImageDream: ip [(B F), L_img, 1280] CLIP image features, ip_img
    [B, h, w, 4] reference latent substituted as the last frame.
    """

    in_channels: int = 4
    model_channels: int = 320
    out_channels: int = 4
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (4, 2, 1)
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_head_channels: int = 64
    transformer_depth: int = 1
    context_dim: int = 1024
    camera_dim: Optional[int] = 16
    ip_dim: int = 0
    ip_weight: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, timesteps, context, num_frames: int,
                 camera=None, ip=None, ip_img=None):
        mc = self.model_channels
        ted = mc * 4

        t_emb = timestep_embedding(timesteps, mc)
        emb = nn.Dense(ted, dtype=self.dtype, name="time_embed_0")(t_emb)
        emb = nn.Dense(ted, dtype=self.dtype,
                       name="time_embed_2")(nn.silu(emb))

        if camera is not None:
            assert self.camera_dim is not None
            c = nn.Dense(ted, dtype=self.dtype, name="camera_embed_0")(camera)
            c = nn.Dense(ted, dtype=self.dtype,
                         name="camera_embed_2")(nn.silu(c))
            emb = emb + c

        if self.ip_dim > 0:
            assert ip is not None and ip_img is not None
            BF = x.shape[0]
            B = BF // num_frames
            x = x.reshape((B, num_frames) + x.shape[1:])
            x = x.at[:, num_frames - 1].set(ip_img)
            x = x.reshape((BF,) + x.shape[2:])
            ip_emb = Resampler(
                dim=self.context_dim, depth=4, dim_head=64, heads=12,
                num_queries=self.ip_dim, output_dim=self.context_dim,
                dtype=self.dtype, name="image_embed",
            )(ip)
            context = jnp.concatenate([context, ip_emb], axis=1)

        def st(ch, name):
            heads = ch // self.num_head_channels
            return SpatialTransformer3D(
                heads, self.num_head_channels, self.transformer_depth,
                self.ip_dim, self.ip_weight, dtype=self.dtype, name=name,
            )

        h = nn.Conv(mc, (3, 3), dtype=self.dtype, name="input_conv")(
            x.astype(self.dtype)
        )
        hs = [h]
        ch = mc
        ds = 1
        block = 1
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                h = ResBlock(mult * mc, dtype=self.dtype,
                             name=f"in{block}_res")(h, emb)
                ch = mult * mc
                if ds in self.attention_resolutions:
                    h = st(ch, f"in{block}_attn")(h, context, num_frames)
                hs.append(h)
                block += 1
            if level != len(self.channel_mult) - 1:
                h = Downsample(ch, dtype=self.dtype,
                               name=f"in{block}_down")(h)
                hs.append(h)
                ds *= 2
                block += 1

        h = ResBlock(ch, dtype=self.dtype, name="mid_res0")(h, emb)
        h = st(ch, "mid_attn")(h, context, num_frames)
        h = ResBlock(ch, dtype=self.dtype, name="mid_res1")(h, emb)

        block = 0
        for level, mult in list(enumerate(self.channel_mult))[::-1]:
            for i in range(self.num_res_blocks + 1):
                skip = hs.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResBlock(mult * mc, dtype=self.dtype,
                             name=f"out{block}_res")(h, emb)
                ch = mult * mc
                if ds in self.attention_resolutions:
                    h = st(ch, f"out{block}_attn")(h, context, num_frames)
                if level and i == self.num_res_blocks:
                    h = Upsample(ch, dtype=self.dtype,
                                 name=f"out{block}_up")(h)
                    ds //= 2
                block += 1

        h = nn.GroupNorm(32, epsilon=1e-5, dtype=jnp.float32,
                         name="out_norm")(h).astype(self.dtype)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=jnp.float32,
                    name="out_conv",
                    kernel_init=nn.initializers.zeros)(h.astype(jnp.float32))
        return h
