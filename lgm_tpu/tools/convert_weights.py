"""Convert reference torch LGM checkpoints to our Flax parameter tree.

The reference trains with torch and saves safetensors via Accelerate
(ref: main.py:29-34,147-148). This module maps those state-dict names onto
the lgm_tpu Flax module tree so published checkpoints load for
checkpoint-parity evaluation:

  torch name                                   flax path
  unet.conv_in.weight                          unet/conv_in/kernel (OIHW->HWIO)
  unet.down_blocks.{i}.nets.{j}.norm1.weight   unet/down{i}/res{j}/norm1/scale
  unet.down_blocks.{i}.nets.{j}.conv1.weight   unet/down{i}/res{j}/conv1/kernel
  unet.down_blocks.{i}.nets.{j}.shortcut.*     unet/down{i}/res{j}/shortcut/*
  unet.down_blocks.{i}.attns.{j}.norm.*        unet/down{i}/attn{j}/norm/*
  unet.down_blocks.{i}.attns.{j}.attn.qkv.*    unet/down{i}/attn{j}/qkv/*
  unet.down_blocks.{i}.attns.{j}.attn.proj.*   unet/down{i}/attn{j}/proj/*
  unet.down_blocks.{i}.downsample.*            unet/down{i}/down/*
  unet.mid_block.nets.{j}.*                    unet/mid/res{j}/*
  unet.mid_block.attns.{j}.*                   unet/mid/attn{j}/*
  unet.up_blocks.{i}.nets.{j}.*                unet/up{i}/res{j}/*
  unet.up_blocks.{i}.attns.{j}.*               unet/up{i}/attn{j}/*
  unet.up_blocks.{i}.upsample.*                unet/up{i}/up/*
  unet.norm_out.* / unet.conv_out.*            unet/norm_out, unet/conv_out
  conv.weight / conv.bias                      conv/* (final 1x1)

Layout transforms: Conv OIHW -> HWIO; Linear [out,in] -> [in,out];
GroupNorm weight/bias -> scale/bias. LPIPS weights are excluded from
reference checkpoints (core/models.py:52-58) and stay at init here.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model" in sd:
        sd = sd["model"]
    return {k: v.float().numpy() for k, v in sd.items()}


def _torch_to_flax_leaf(name: str, arr: np.ndarray):
    """Returns (leaf_name, transformed array) given the torch param name."""
    if name.endswith("weight"):
        if arr.ndim == 4:   # conv OIHW -> HWIO
            return "kernel", arr.transpose(2, 3, 1, 0)
        if arr.ndim == 2:   # linear [out,in] -> [in,out]
            return "kernel", arr.T
        return "scale", arr  # norm
    return "bias", arr


_PATTERNS = [
    (re.compile(r"^unet\.conv_in\.(weight|bias)$"),
     lambda m: ("unet", "conv_in")),
    (re.compile(r"^unet\.down_blocks\.(\d+)\.nets\.(\d+)\.(norm1|norm2|conv1|conv2|shortcut)\.(weight|bias)$"),
     lambda m: ("unet", f"down{m[1]}", f"res{m[2]}", m[3])),
    (re.compile(r"^unet\.down_blocks\.(\d+)\.attns\.(\d+)\.norm\.(weight|bias)$"),
     lambda m: ("unet", f"down{m[1]}", f"attn{m[2]}", "norm")),
    (re.compile(r"^unet\.down_blocks\.(\d+)\.attns\.(\d+)\.attn\.(qkv|proj)\.(weight|bias)$"),
     lambda m: ("unet", f"down{m[1]}", f"attn{m[2]}", m[3])),
    (re.compile(r"^unet\.down_blocks\.(\d+)\.downsample\.(weight|bias)$"),
     lambda m: ("unet", f"down{m[1]}", "down")),
    (re.compile(r"^unet\.mid_block\.nets\.(\d+)\.(norm1|norm2|conv1|conv2|shortcut)\.(weight|bias)$"),
     lambda m: ("unet", "mid", f"res{m[1]}", m[2])),
    (re.compile(r"^unet\.mid_block\.attns\.(\d+)\.norm\.(weight|bias)$"),
     lambda m: ("unet", "mid", f"attn{m[1]}", "norm")),
    (re.compile(r"^unet\.mid_block\.attns\.(\d+)\.attn\.(qkv|proj)\.(weight|bias)$"),
     lambda m: ("unet", "mid", f"attn{m[1]}", m[2])),
    (re.compile(r"^unet\.up_blocks\.(\d+)\.nets\.(\d+)\.(norm1|norm2|conv1|conv2|shortcut)\.(weight|bias)$"),
     lambda m: ("unet", f"up{m[1]}", f"res{m[2]}", m[3])),
    (re.compile(r"^unet\.up_blocks\.(\d+)\.attns\.(\d+)\.norm\.(weight|bias)$"),
     lambda m: ("unet", f"up{m[1]}", f"attn{m[2]}", "norm")),
    (re.compile(r"^unet\.up_blocks\.(\d+)\.attns\.(\d+)\.attn\.(qkv|proj)\.(weight|bias)$"),
     lambda m: ("unet", f"up{m[1]}", f"attn{m[2]}", m[3])),
    (re.compile(r"^unet\.up_blocks\.(\d+)\.upsample\.(weight|bias)$"),
     lambda m: ("unet", f"up{m[1]}", "up")),
    (re.compile(r"^unet\.norm_out\.(weight|bias)$"),
     lambda m: ("unet", "norm_out")),
    (re.compile(r"^unet\.conv_out\.(weight|bias)$"),
     lambda m: ("unet", "conv_out")),
    (re.compile(r"^conv\.(weight|bias)$"), lambda m: ("conv",)),
]


def torch_name_to_flax_path(name: str):
    for pat, path_fn in _PATTERNS:
        m = pat.match(name)
        if m:
            return path_fn(m)
    return None


def convert_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """torch state dict -> nested flax params dict (strict: raises on any
    unmapped non-LPIPS key)."""
    tree: Dict = {}
    skipped = []
    for name, arr in sd.items():
        if "lpips" in name:
            continue
        path = torch_name_to_flax_path(name)
        if path is None:
            skipped.append(name)
            continue
        leaf, val = _torch_to_flax_leaf(name, np.asarray(arr))
        node = tree
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = val
    if skipped:
        raise KeyError(f"unmapped torch keys: {skipped[:10]}")
    return tree


def _merge(dst, src, path=""):
    out = {}
    for k, v in dst.items():
        if k in src:
            if isinstance(v, dict):
                out[k] = _merge(v, src[k], f"{path}/{k}")
            else:
                assert v.shape == src[k].shape, (
                    f"shape mismatch at {path}/{k}: {v.shape} vs "
                    f"{src[k].shape}"
                )
                out[k] = np.asarray(src[k], np.float32)
        else:
            out[k] = v
    return out


def load_reference_lgm(path: str, init_params: Dict, opt=None) -> Dict:
    """Load a reference checkpoint into an initialized param tree.
    Missing keys (e.g. LPIPS) keep init values; converted keys must match
    shapes exactly."""
    sd = load_torch_state_dict(path)
    converted = convert_state_dict(sd)
    return _merge(init_params, converted)
