"""Asymmetric multi-view U-Net in Flax (NHWC, bf16 compute / f32 params).

Re-design of the reference's torch U-Net (ref: core/unet.py:11-319) for TPU:

- NHWC layout throughout (torch uses NCHW); convs map straight onto the MXU.
- `MVAttention` flattens all V views' spatial tokens into one sequence so
  self-attention spans views jointly (dense cross-view attention, ref:
  core/unet.py:43-45). Sequence length is at most V*(S/8)^2 = 4096 tokens
  for the LGM presets, so a single dense dot-product attention per block is
  the right call on TPU (no flash kernel needed at this size; XLA fuses the
  softmax chain).
- GroupNorm runs in f32 for numerical stability under bf16 activations.
- Structure parity with the reference (required for checkpoint conversion):
  2 resnet layers per down block, 3 per up block, one extra first resnet in
  the mid block, skip_scale = sqrt(0.5) on every residual join, asymmetric
  skip channel indexing down_channels[max(-2-i, -len)]
  (ref: core/unet.py:234-319).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from lgm_tpu.parallel.mesh import constrain_views


def _group_norm(x, name=None):
    """GroupNorm(32, eps 1e-5) computed in f32 (ref uses nn.GroupNorm 32)."""
    return nn.GroupNorm(
        num_groups=32, epsilon=1e-5, dtype=jnp.float32, name=name
    )(x)


def _attention(q, k, v):
    """Self-attention over [B, S, heads, D], scaled by 1/sqrt(D).

    On TPU at the long sequence lengths of the coarse U-Net levels
    (S = V*32² = 4096), XLA's dense dot_product_attention materializes
    the [B, heads, S, S] logits — 8.6 GB transient at the reference
    batch size, more than a v5e chip's HBM. The Pallas flash kernel
    (O(S) memory, custom VJP) takes that path with 1024-wide blocks:
    the kernel's DEFAULT 512 blocks are 6.4x slower at these small
    head dims (measured 14.7 -> 2.3 ms at B2/S4096/h16/d32; 2048-wide
    blocks exceed the VMEM scoped limit). Below S=2048 dense wins
    (0.45 vs 0.85 ms at S=1024) and its logits stay <300 MB at the
    reference batch sizes, so short sequences and non-TPU backends keep
    the dense path (grad cosine > 0.99995 between the two on chip).
    """
    S, D = q.shape[1], q.shape[3]
    # Dense materializes [B, heads, S, S] logits; keep it only while
    # that transient stays small (the small-preset bs8 step runs at
    # 15.7/15.75 GB — a 268 MB S=1024 dense transient would tip it).
    logits_bytes = q.shape[0] * q.shape[2] * S * S * 2
    if (jax.default_backend() == "tpu" and S % 1024 == 0
            and (S >= 2048 or logits_bytes > 2e8)):
        impl = os.environ.get("LGM_TPU_ATTN", "kres")
        if impl == "kres":
            # Round-5 K-resident kernel (ops/mha.py): the d=32
            # specialization (whole-head K/V residency, exact softmax,
            # one fused backward pass). Measured A/B on chip at
            # B2/S4096/h16/d32 (scripts/bench_attention.py): fwd+bwd
            # 7.96 ms vs stock flash-1024's 11.02 (-28%; backward
            # 6.15 vs 9.19, -33%) and dense's 22.5.
            # LGM_TPU_ATTN=flash restores the stock kernel.
            from lgm_tpu.ops.mha import mha_kresident

            B, H = q.shape[0], q.shape[2]

            def flat(x):
                return x.transpose(0, 2, 1, 3).reshape(B * H, S, D)

            o = mha_kresident(flat(q), flat(k), flat(v),
                              float(D) ** -0.5)
            return o.reshape(B, H, S, D).transpose(0, 2, 1, 3)
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes,
            flash_attention,
        )

        b = 1024
        bs = BlockSizes(
            block_q=b, block_k_major=b, block_k=b, block_b=1,
            block_q_major_dkv=b, block_k_major_dkv=b, block_k_dkv=b,
            block_q_dkv=b, block_k_major_dq=b, block_k_dq=b,
            block_q_dq=b,
        )
        o = flash_attention(
            q.transpose(0, 2, 1, 3),
            k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            sm_scale=float(D) ** -0.5,
            block_sizes=bs,
        )
        return o.transpose(0, 2, 1, 3)
    return jax.nn.dot_product_attention(q, k, v)


class MVAttention(nn.Module):
    """Cross-view self-attention: [B*V, H, W, C] -> attention over V·H·W.

    Ref: core/unet.py:11-49 (qkv without bias, out-proj with bias, 16 heads,
    residual scaled by skip_scale).
    """

    num_views: int
    num_heads: int = 16
    skip_scale: float = 1.0
    dtype: Any = jnp.bfloat16
    # Optional (dp, vp) mesh: re-shard the [B*V, ...] axis after the
    # cross-view attention (whose joint V*H*W sequence is gathered along
    # vp) so the following convs keep running view-sharded.
    mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(self, x):
        BV, H, W, C = x.shape
        V = self.num_views
        B = BV // V
        res = x

        h = _group_norm(x, name="norm").astype(self.dtype)
        h = h.reshape(B, V * H * W, C)

        qkv = nn.Dense(3 * C, use_bias=False, dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = C // self.num_heads
        q = q.reshape(B, V * H * W, self.num_heads, hd)
        k = k.reshape(B, V * H * W, self.num_heads, hd)
        v = v.reshape(B, V * H * W, self.num_heads, hd)
        o = _attention(q, k, v)
        o = o.reshape(B, V * H * W, C)
        o = nn.Dense(C, use_bias=True, dtype=self.dtype, name="proj")(o)

        o = o.reshape(BV, H, W, C)
        out = ((o + res) * self.skip_scale).astype(self.dtype)
        return constrain_views(out, self.mesh)


class ResnetBlock(nn.Module):
    """GN -> SiLU -> conv3 -> GN -> SiLU -> conv3 (+1x1 shortcut), scaled
    residual join (ref: core/unet.py:51-103; resample mode unused by LGM)."""

    out_channels: int
    skip_scale: float = 1.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        res = x
        h = _group_norm(x, name="norm1").astype(self.dtype)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                    name="conv1")(h)
        h = _group_norm(h, name="norm2").astype(self.dtype)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                    name="conv2")(h)
        if res.shape[-1] != self.out_channels:
            res = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                          name="shortcut")(res)
        return ((h + res) * self.skip_scale).astype(self.dtype)


class DownBlock(nn.Module):
    """num_layers x (resnet [+ mv-attention]) then strided-conv downsample
    (ref: core/unet.py:106-146). Returns (x, per-layer skips)."""

    out_channels: int
    num_views: int
    num_layers: int = 2
    downsample: bool = True
    attention: bool = False
    skip_scale: float = 1.0
    dtype: Any = jnp.bfloat16
    mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(self, x):
        skips = []
        for i in range(self.num_layers):
            x = ResnetBlock(self.out_channels, self.skip_scale, self.dtype,
                            name=f"res{i}")(x)
            if self.attention:
                x = MVAttention(self.num_views, 16, self.skip_scale,
                                self.dtype, mesh=self.mesh,
                                name=f"attn{i}")(x)
            skips.append(x)
        if self.downsample:
            # Explicit (1,1) padding: torch's Conv2d(3, stride=2, padding=1)
            # pads symmetrically, while Flax "SAME" at stride 2 pads (0,1) —
            # a one-pixel shift that breaks checkpoint parity (caught by
            # tests/test_golden_unet.py against the reference torch U-Net).
            x = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)),
                        dtype=self.dtype, name="down")(x)
            skips.append(x)
        return x, skips


class MidBlock(nn.Module):
    """resnet, then num_layers x ([mv-attention +] resnet)
    (ref: core/unet.py:149-185)."""

    channels: int
    num_views: int
    num_layers: int = 1
    attention: bool = True
    skip_scale: float = 1.0
    dtype: Any = jnp.bfloat16
    mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(self, x):
        x = ResnetBlock(self.channels, self.skip_scale, self.dtype,
                        name="res0")(x)
        for i in range(self.num_layers):
            if self.attention:
                x = MVAttention(self.num_views, 16, self.skip_scale,
                                self.dtype, mesh=self.mesh,
                                name=f"attn{i}")(x)
            x = ResnetBlock(self.channels, self.skip_scale, self.dtype,
                            name=f"res{i + 1}")(x)
        return x


class UpBlock(nn.Module):
    """num_layers x (concat skip + resnet [+ mv-attention]) then nearest-2x
    upsample + conv (ref: core/unet.py:188-231)."""

    out_channels: int
    num_views: int
    num_layers: int = 3
    upsample: bool = True
    attention: bool = False
    skip_scale: float = 1.0
    dtype: Any = jnp.bfloat16
    mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(self, x, skips: Sequence[jnp.ndarray]):
        skips = list(skips)
        for i in range(self.num_layers):
            skip = skips.pop()  # consumed deepest-first
            x = jnp.concatenate([x, skip], axis=-1)
            x = ResnetBlock(self.out_channels, self.skip_scale, self.dtype,
                            name=f"res{i}")(x)
            if self.attention:
                x = MVAttention(self.num_views, 16, self.skip_scale,
                                self.dtype, mesh=self.mesh,
                                name=f"attn{i}")(x)
        if self.upsample:
            B, H, W, C = x.shape
            x = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
            x = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                        name="up")(x)
        return x


class UNet(nn.Module):
    """Asymmetric encoder/decoder U-Net over [B*V, H, W, Cin]
    (ref: core/unet.py:234-319)."""

    out_channels: int
    num_views: int
    down_channels: Tuple[int, ...] = (64, 128, 256, 512, 1024, 1024)
    down_attention: Tuple[bool, ...] = (False, False, False, True, True, True)
    mid_attention: bool = True
    up_channels: Tuple[int, ...] = (1024, 1024, 512, 256)
    up_attention: Tuple[bool, ...] = (True, True, True, False)
    layers_per_block: int = 2
    skip_scale: float = float(np.sqrt(0.5))
    dtype: Any = jnp.bfloat16
    # Rematerialize each block in the backward pass: residuals are kept
    # only at block boundaries (the structural skip tensors), not per
    # conv. Without this, a reference-scale batch (8 scenes x 4 views
    # @256²) keeps ~25 GB of conv activations — more HBM than a v5e
    # chip has. Costs ~1/3 extra U-Net forward FLOPs on backward; the
    # U-Net is a minor share of the train step (BENCHMARKS.md).
    remat: bool = True
    # Optional (dp, vp) mesh for view-sharded execution: the [B*V, ...]
    # batch axis is sharded over both axes so each vp chip runs only its
    # slice of input views through the conv trunk; only the cross-view
    # attention sequence gathers along vp.
    mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(self, x):
        if self.remat:
            Down = nn.remat(DownBlock, prevent_cse=False)
            Mid = nn.remat(MidBlock, prevent_cse=False)
            Up = nn.remat(UpBlock, prevent_cse=False)
        else:
            Down, Mid, Up = DownBlock, MidBlock, UpBlock
        x = constrain_views(x.astype(self.dtype), self.mesh)
        x = nn.Conv(self.down_channels[0], (3, 3), dtype=self.dtype,
                    name="conv_in")(x)

        xss = [x]
        for i, ch in enumerate(self.down_channels):
            x, skips = Down(
                ch, self.num_views,
                num_layers=self.layers_per_block,
                downsample=(i != len(self.down_channels) - 1),
                attention=self.down_attention[i],
                skip_scale=self.skip_scale,
                dtype=self.dtype,
                mesh=self.mesh,
                name=f"down{i}",
            )(x)
            xss.extend(skips)

        x = Mid(
            self.down_channels[-1], self.num_views,
            attention=self.mid_attention, skip_scale=self.skip_scale,
            dtype=self.dtype, mesh=self.mesh, name="mid",
        )(x)

        for i, ch in enumerate(self.up_channels):
            n_skips = self.layers_per_block + 1
            skips = xss[-n_skips:]
            xss = xss[:-n_skips]
            x = Up(
                ch, self.num_views,
                num_layers=n_skips,
                upsample=(i != len(self.up_channels) - 1),
                attention=self.up_attention[i],
                skip_scale=self.skip_scale,
                dtype=self.dtype,
                mesh=self.mesh,
                name=f"up{i}",
            )(x, skips)

        x = _group_norm(x, name="norm_out").astype(self.dtype)
        x = nn.silu(x)
        x = nn.Conv(self.out_channels, (3, 3), dtype=jnp.float32,
                    name="conv_out")(x.astype(jnp.float32))
        return x
