"""Structural coverage test for the diffusion weight converter: every leaf
of the Flax UNet/VAE trees must be reachable from a torch name, with the
right layout transform (tested by inverse-mapping the tiny config)."""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lgm_tpu.diffusion.mv_unet import MultiViewUNetModel
from lgm_tpu.diffusion.vae import AutoencoderKL
from lgm_tpu.tools.convert_diffusion import (convert_component,
                                             unet_torch_to_flax,
                                             vae_torch_to_flax)


def _tiny_unet_params(ip_dim=4):
    net = MultiViewUNetModel(
        model_channels=32, channel_mult=(1, 2), attention_resolutions=(1, 2),
        num_res_blocks=1, num_head_channels=16, context_dim=32,
        ip_dim=ip_dim,
    )
    F, H = 2, 8
    x = jnp.zeros((F, H, H, 4))
    t = jnp.zeros((F,))
    ctx = jnp.zeros((F, 7, 32))
    cam = jnp.zeros((F, 16))
    kw = {}
    if ip_dim:
        kw = dict(ip=jnp.zeros((F, 5, 48)),
                  ip_img=jnp.zeros((1, H, H, 4)))
    return net.init(jax.random.PRNGKey(0), x, t, ctx, F, camera=cam,
                    **kw)["params"]


def _unet_flax_to_torch(path, leaf):
    """Test-local inverse of unet_torch_to_flax."""
    res_inv = {"in_norm": "in_layers.0", "in_conv": "in_layers.2",
               "emb_1": "emb_layers.1", "out_norm": "out_layers.0",
               "out_conv": "out_layers.3", "skip": "skip_connection"}
    head = path[0]
    suffix = {"kernel": "weight", "scale": "weight", "bias": "bias"}[leaf]

    def attn_inner(parts):
        if parts[0].startswith("transformer_blocks_"):
            d = parts[0].rsplit("_", 1)[1]
            rest = parts[1:]
            if rest[0] in ("attn1", "attn2"):
                inner = (rest[1] if rest[1] != "to_out_0" else "to_out.0")
                return f"transformer_blocks.{d}.{rest[0]}.{inner}"
            if rest[0] == "ff":
                if rest[1] == "net_0":
                    return f"transformer_blocks.{d}.ff.net.0.proj"
                return f"transformer_blocks.{d}.ff.net.2"
            return f"transformer_blocks.{d}.{rest[0]}"
        return parts[0]

    if head in ("time_embed_0", "time_embed_2", "camera_embed_0",
                "camera_embed_2"):
        base, idx = head.rsplit("_", 1)
        return f"{base}.{idx}.{suffix}"
    if head == "out_norm":
        return f"out.0.{suffix}"
    if head == "out_conv":
        return f"out.2.{suffix}"
    if head == "input_conv":
        return f"input_blocks.0.0.{suffix}"
    if head == "image_embed":
        parts = path[1:]
        if parts[0] == "latents":
            return "image_embed.latents"
        if parts[0].startswith("layers_"):
            m = re.match(r"layers_(\d+)_(attn|ff_norm|ff_1|ff_3)", parts[0])
            i, kind = m[1], m[2]
            if kind == "attn":
                return f"image_embed.layers.{i}.0.{parts[1]}.{suffix}"
            idx = {"ff_norm": 0, "ff_1": 1, "ff_3": 3}[kind]
            return f"image_embed.layers.{i}.1.{idx}.{suffix}"
        return f"image_embed.{parts[0]}.{suffix}"
    m = re.match(r"^(in|out|mid)(\d*)_(res\d?|attn|down|up)$", head)
    assert m, head
    where, n, kind = m[1], m[2], m[3]
    if where == "mid":
        block = {"res0": "middle_block.0", "attn": "middle_block.1",
                 "res1": "middle_block.2"}[kind]
    elif where == "in":
        block = f"input_blocks.{n}." + ("0" if kind != "attn" else "1")
    else:
        block = f"output_blocks.{n}." + {"res": "0", "attn": "1",
                                         "up": "2"}[kind[:4].rstrip("0123456789") if False else ("res" if kind.startswith("res") else kind)]
    if kind.startswith("res"):
        return f"{block}.{res_inv[path[1]]}.{suffix}"
    if kind == "attn":
        return f"{block}.{attn_inner(path[1:])}.{suffix}"
    if kind == "down":
        return f"{block}.op.{suffix}"
    return f"{block}.conv.{suffix}"


def _roundtrip(params, inverse_fn, mapper):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    sd = {}
    for path, arr in flat:
        keys = tuple(p.key for p in path)
        if keys[-1] in ("kernel", "scale", "bias"):
            torch_name = inverse_fn(keys[:-1], keys[-1])
        else:
            torch_name = inverse_fn(keys, "kernel")  # bare param (latents)
        arr = np.asarray(arr)
        if keys[-1] == "kernel":
            arr = arr.transpose(3, 2, 0, 1) if arr.ndim == 4 else arr.T
        sd[torch_name] = arr
    converted = convert_component(sd, mapper)

    # Exact tree equality (paths and values).
    conv_flat = {
        tuple(p.key for p in path): np.asarray(a)
        for path, a in jax.tree_util.tree_flatten_with_path(converted)[0]
    }
    orig_flat = {
        tuple(p.key for p in path): np.asarray(a) for path, a in flat
    }
    assert set(conv_flat) == set(orig_flat), (
        set(orig_flat) ^ set(conv_flat)
    )
    for k in orig_flat:
        np.testing.assert_array_equal(conv_flat[k], orig_flat[k])


def test_unet_converter_full_coverage():
    params = _tiny_unet_params(ip_dim=4)
    _roundtrip(params, _unet_flax_to_torch, unet_torch_to_flax)


def test_vae_converter_full_coverage():
    vae = AutoencoderKL(block_out_channels=(32, 64))
    params = vae.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)),
        jnp.zeros((1, 8, 8, 4)),
    )["params"]

    def inverse(path, leaf):
        suffix = {"kernel": "weight", "scale": "weight",
                  "bias": "bias"}[leaf]
        side = path[0]
        head = path[1]
        if head in ("quant_conv", "post_quant_conv"):
            return f"{head}.{suffix}"
        m = re.match(r"^(down|up)(\d+)_res(\d+)$", head)
        if m:
            return (f"{side}.{m[1]}_blocks.{m[2]}.resnets.{m[3]}."
                    f"{path[2]}.{suffix}")
        m = re.match(r"^down(\d+)_downsample$", head)
        if m:
            return f"{side}.down_blocks.{m[1]}.downsamplers.0.conv.{suffix}"
        m = re.match(r"^up(\d+)_upsample$", head)
        if m:
            return f"{side}.up_blocks.{m[1]}.upsamplers.0.conv.{suffix}"
        m = re.match(r"^mid_res(\d)$", head)
        if m:
            return (f"{side}.mid_block.resnets.{m[1]}.{path[2]}.{suffix}")
        if head == "mid_attn":
            inner = path[2] if path[2] != "to_out_0" else "to_out.0"
            return f"{side}.mid_block.attentions.0.{inner}.{suffix}"
        return f"{side}.{head}.{suffix}"

    _roundtrip(params, inverse, vae_torch_to_flax)
