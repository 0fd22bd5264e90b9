"""AutoencoderKL (Stable Diffusion VAE) in Flax, NHWC.

The reference uses diffusers' torch AutoencoderKL for latent encode/decode
(ref: mvdream/pipeline_mvdream.py:29-37,339-345,425-429); diffusers is not
available here, so this is a from-scratch Flax implementation of the same
architecture (SD 2.x config: 4-ch latents, block_out_channels
(128, 256, 512, 512), 2 layers/block, mid-block single-head attention,
scaling_factor 0.18215), convertible from published weights.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

SCALING_FACTOR = 0.18215


def _gn(x, name):
    return nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32,
                        name=name)(x)


class VAEResnetBlock(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = _gn(x, "norm1").astype(self.dtype)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                    name="conv1")(h)
        h = _gn(h, "norm2").astype(self.dtype)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    """Single-head spatial self-attention at the bottleneck."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = _gn(x, "group_norm").astype(self.dtype)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(C, dtype=self.dtype, name="to_v")(h)
        o = jax.nn.dot_product_attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :]
        )[:, :, 0, :]
        o = nn.Dense(C, dtype=self.dtype, name="to_out_0")(o)
        return x + o.reshape(B, H, W, C)


class Encoder(nn.Module):
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.block_out_channels[0], (3, 3), dtype=self.dtype,
                    name="conv_in")(x.astype(self.dtype))
        for i, ch in enumerate(self.block_out_channels):
            for j in range(self.layers_per_block):
                h = VAEResnetBlock(ch, dtype=self.dtype,
                                   name=f"down{i}_res{j}")(h)
            if i != len(self.block_out_channels) - 1:
                h = nn.Conv(ch, (3, 3), strides=(2, 2), dtype=self.dtype,
                            name=f"down{i}_downsample")(h)
        ch = self.block_out_channels[-1]
        h = VAEResnetBlock(ch, dtype=self.dtype, name="mid_res0")(h)
        h = VAEAttention(dtype=self.dtype, name="mid_attn")(h)
        h = VAEResnetBlock(ch, dtype=self.dtype, name="mid_res1")(h)
        h = _gn(h, "conv_norm_out").astype(self.dtype)
        h = nn.silu(h)
        moments = nn.Conv(2 * self.latent_channels, (3, 3),
                          dtype=jnp.float32, name="conv_out")(h)
        # quant_conv folds the diffusers 1x1 post-projection.
        return nn.Conv(2 * self.latent_channels, (1, 1), dtype=jnp.float32,
                       name="quant_conv")(moments)


class Decoder(nn.Module):
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    out_channels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        z = nn.Conv(z.shape[-1], (1, 1), dtype=jnp.float32,
                    name="post_quant_conv")(z)
        rev = tuple(reversed(self.block_out_channels))
        h = nn.Conv(rev[0], (3, 3), dtype=self.dtype,
                    name="conv_in")(z.astype(self.dtype))
        h = VAEResnetBlock(rev[0], dtype=self.dtype, name="mid_res0")(h)
        h = VAEAttention(dtype=self.dtype, name="mid_attn")(h)
        h = VAEResnetBlock(rev[0], dtype=self.dtype, name="mid_res1")(h)
        for i, ch in enumerate(rev):
            for j in range(self.layers_per_block + 1):
                h = VAEResnetBlock(ch, dtype=self.dtype,
                                   name=f"up{i}_res{j}")(h)
            if i != len(rev) - 1:
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, H * 2, W * 2, C), "nearest")
                h = nn.Conv(ch, (3, 3), dtype=self.dtype,
                            name=f"up{i}_upsample")(h)
        h = _gn(h, "conv_norm_out").astype(self.dtype)
        h = nn.silu(h)
        return nn.Conv(self.out_channels, (3, 3), dtype=jnp.float32,
                       name="conv_out")(h)


class AutoencoderKL(nn.Module):
    """encode: image [B, H, W, 3] in [-1, 1] -> (mean, logvar) each
    [B, H/8, W/8, 4]; decode: latents -> image. Sampling and the 0.18215
    scaling happen in the pipeline (ref: pipeline_mvdream.py:425-429)."""

    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.block_out_channels,
                               self.layers_per_block,
                               self.latent_channels, self.dtype)
        self.decoder = Decoder(self.block_out_channels,
                               self.layers_per_block, 3, self.dtype)

    def encode(self, x):
        moments = self.encoder(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z):
        return self.decoder(z)

    def __call__(self, x, z):
        """init helper touching both halves."""
        return self.encode(x), self.decode(z)
