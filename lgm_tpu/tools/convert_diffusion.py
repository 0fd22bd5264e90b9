"""Convert published MVDream/ImageDream torch checkpoints to lgm_tpu format.

The published repos (``ashawkey/mvdream-sd2.1-diffusers``,
``ashawkey/imagedream-ipmv-diffusers``; ref: infer.py:58-64, app.py:56-70)
are diffusers pipelines: ``unet/diffusion_pytorch_model.safetensors``
(MultiViewUNetModel, names per mvdream/mv_unet.py), ``vae/`` (diffusers
AutoencoderKL), ``text_encoder/`` + ``image_encoder/`` (transformers CLIP),
``tokenizer/``. This tool maps them onto the Flax trees in
lgm_tpu.diffusion and writes an orbax checkpoint directory consumable by
``MVDreamPipeline.from_pretrained``.

Run offline (needs the downloaded repos; this environment has no egress):
  python -m lgm_tpu.tools.convert_diffusion /path/to/repo /path/to/out
"""

from __future__ import annotations

import re
import sys
from typing import Dict, List, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# UNet name mapping
# ---------------------------------------------------------------------------

_RES_INNER = {
    "in_layers.0": ("in_norm",),
    "in_layers.2": ("in_conv",),
    "emb_layers.1": ("emb_1",),
    "out_layers.0": ("out_norm",),
    "out_layers.3": ("out_conv",),
    "skip_connection": ("skip",),
}

_ATTN_INNER_RE = [
    (re.compile(r"^norm$"), lambda m: ("norm",)),
    (re.compile(r"^proj_in$"), lambda m: ("proj_in",)),
    (re.compile(r"^proj_out$"), lambda m: ("proj_out",)),
    (re.compile(r"^transformer_blocks\.(\d+)\.(norm[123])$"),
     lambda m: (f"transformer_blocks_{m[1]}", m[2])),
    (re.compile(r"^transformer_blocks\.(\d+)\.(attn[12])\.(to_q|to_k|to_v|to_k_ip|to_v_ip)$"),
     lambda m: (f"transformer_blocks_{m[1]}", m[2], m[3])),
    (re.compile(r"^transformer_blocks\.(\d+)\.(attn[12])\.to_out\.0$"),
     lambda m: (f"transformer_blocks_{m[1]}", m[2], "to_out_0")),
    (re.compile(r"^transformer_blocks\.(\d+)\.ff\.net\.0\.proj$"),
     lambda m: (f"transformer_blocks_{m[1]}", "ff", "net_0", "proj")),
    (re.compile(r"^transformer_blocks\.(\d+)\.ff\.net\.2$"),
     lambda m: (f"transformer_blocks_{m[1]}", "ff", "net_2")),
]


def _map_attn_inner(rest: str) -> Optional[Tuple[str, ...]]:
    for pat, fn in _ATTN_INNER_RE:
        m = pat.match(rest)
        if m:
            return fn(m)
    return None


def _classify_sublayer(rest: str) -> str:
    """Which sublayer type a (sub)name belongs to inside a CondSequential."""
    if rest.startswith(("in_layers", "emb_layers", "out_layers",
                        "skip_connection", "h_upd", "x_upd")):
        return "res"
    if rest.startswith(("norm", "proj_in", "proj_out",
                        "transformer_blocks")):
        return "attn"
    if rest.startswith("op"):
        return "down"
    if rest.startswith("conv"):
        return "upconv"
    return "conv"  # bare conv (input_blocks.0.0)


def unet_torch_to_flax(name: str) -> Optional[Tuple[str, ...]]:
    """Map one torch MultiViewUNetModel param name (without .weight/.bias)
    to the flax module path in lgm_tpu.diffusion.mv_unet."""
    for prefix, flax in (("time_embed.0", ("time_embed_0",)),
                         ("time_embed.2", ("time_embed_2",)),
                         ("camera_embed.0", ("camera_embed_0",)),
                         ("camera_embed.2", ("camera_embed_2",)),
                         ("out.0", ("out_norm",)),
                         ("out.2", ("out_conv",))):
        if name == prefix:
            return flax

    m = re.match(r"^image_embed\.(.*)$", name)
    if m:
        rest = m[1]
        table = [
            (re.compile(r"^latents$"), lambda mm: ("latents",)),
            (re.compile(r"^proj_in$"), lambda mm: ("proj_in",)),
            (re.compile(r"^proj_out$"), lambda mm: ("proj_out",)),
            (re.compile(r"^norm_out$"), lambda mm: ("norm_out",)),
            (re.compile(r"^layers\.(\d+)\.0\.(norm1|norm2|to_q|to_kv|to_out)$"),
             lambda mm: (f"layers_{mm[1]}_attn", mm[2])),
            (re.compile(r"^layers\.(\d+)\.1\.0$"),
             lambda mm: (f"layers_{mm[1]}_ff_norm",)),
            (re.compile(r"^layers\.(\d+)\.1\.1$"),
             lambda mm: (f"layers_{mm[1]}_ff_1",)),
            (re.compile(r"^layers\.(\d+)\.1\.3$"),
             lambda mm: (f"layers_{mm[1]}_ff_3",)),
        ]
        for pat, fn in table:
            mm = pat.match(rest)
            if mm:
                return ("image_embed",) + fn(mm)
        return None

    if name == "input_blocks.0.0":  # bare stem conv
        return ("input_conv",)
    m = re.match(r"^input_blocks\.(\d+)\.(\d+)\.(.*)$", name)
    if m:
        n, _, rest = int(m[1]), int(m[2]), m[3]
        kind = _classify_sublayer(rest)
        if kind == "res":
            sub = _RES_INNER.get(rest)
            return (f"in{n}_res",) + sub if sub else None
        if kind == "attn":
            sub = _map_attn_inner(rest)
            return (f"in{n}_attn",) + sub if sub else None
        if kind == "down":
            return (f"in{n}_down", "op")
        return None

    m = re.match(r"^middle_block\.(\d)\.(.*)$", name)
    if m:
        idx, rest = int(m[1]), m[2]
        if idx in (0, 2):
            sub = _RES_INNER.get(rest)
            return (f"mid_res{0 if idx == 0 else 1}",) + sub if sub else None
        sub = _map_attn_inner(rest)
        return ("mid_attn",) + sub if sub else None

    m = re.match(r"^output_blocks\.(\d+)\.(\d+)\.(.*)$", name)
    if m:
        n, _, rest = int(m[1]), int(m[2]), m[3]
        kind = _classify_sublayer(rest)
        if kind == "res":
            sub = _RES_INNER.get(rest)
            return (f"out{n}_res",) + sub if sub else None
        if kind == "attn":
            sub = _map_attn_inner(rest)
            return (f"out{n}_attn",) + sub if sub else None
        if kind == "upconv":
            return (f"out{n}_up", "conv")
        return None
    return None


# ---------------------------------------------------------------------------
# VAE name mapping (diffusers AutoencoderKL)
# ---------------------------------------------------------------------------

_VAE_RES = {"norm1": "norm1", "conv1": "conv1", "norm2": "norm2",
            "conv2": "conv2", "conv_shortcut": "conv_shortcut"}


def vae_torch_to_flax(name: str) -> Optional[Tuple[str, ...]]:
    if name == "quant_conv":
        return ("encoder", "quant_conv")
    if name == "post_quant_conv":
        return ("decoder", "post_quant_conv")
    m = re.match(r"^(encoder|decoder)\.(.*)$", name)
    if not m:
        return None
    side, rest = m[1], m[2]
    table = [
        (re.compile(r"^conv_in$"), lambda mm: ("conv_in",)),
        (re.compile(r"^conv_out$"), lambda mm: ("conv_out",)),
        (re.compile(r"^conv_norm_out$"), lambda mm: ("conv_norm_out",)),
        (re.compile(r"^(down|up)_blocks\.(\d+)\.resnets\.(\d+)\.(norm1|conv1|norm2|conv2|conv_shortcut)$"),
         lambda mm: (f"{mm[1]}{mm[2]}_res{mm[3]}", _VAE_RES[mm[4]])),
        (re.compile(r"^down_blocks\.(\d+)\.downsamplers\.0\.conv$"),
         lambda mm: (f"down{mm[1]}_downsample",)),
        (re.compile(r"^up_blocks\.(\d+)\.upsamplers\.0\.conv$"),
         lambda mm: (f"up{mm[1]}_upsample",)),
        (re.compile(r"^mid_block\.resnets\.(\d)\.(norm1|conv1|norm2|conv2|conv_shortcut)$"),
         lambda mm: (f"mid_res{mm[1]}", _VAE_RES[mm[2]])),
        (re.compile(r"^mid_block\.attentions\.0\.(group_norm|to_q|to_k|to_v)$"),
         lambda mm: ("mid_attn", mm[1])),
        (re.compile(r"^mid_block\.attentions\.0\.to_out\.0$"),
         lambda mm: ("mid_attn", "to_out_0")),
    ]
    for pat, fn in table:
        mm = pat.match(rest)
        if mm:
            return (side,) + fn(mm)
    return None


# ---------------------------------------------------------------------------
# Generic conversion
# ---------------------------------------------------------------------------


def _leaf(name: str, arr: np.ndarray, path: Tuple[str, ...]):
    suffix = name.rsplit(".", 1)[-1]
    if path and path[-1] == "latents":
        return None, arr  # Resampler latents: a bare param, no suffix
    if suffix == "weight":
        if arr.ndim == 4:
            return "kernel", arr.transpose(2, 3, 1, 0)
        if arr.ndim == 2:
            return "kernel", arr.T
        return "scale", arr
    return "bias", arr


def convert_component(sd: Dict[str, np.ndarray], mapper) -> Dict:
    tree: Dict = {}
    unmapped: List[str] = []
    for full_name, arr in sd.items():
        if full_name.endswith((".weight", ".bias")):
            base = full_name.rsplit(".", 1)[0]
        else:
            base = full_name
        path = mapper(base)
        if path is None:
            unmapped.append(full_name)
            continue
        leaf, val = _leaf(full_name, np.asarray(arr), path)
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        if leaf is None:
            node[path[-1]] = val
        else:
            node = node.setdefault(path[-1], {})
            node[leaf] = val
    if unmapped:
        raise KeyError(f"unmapped keys ({len(unmapped)}): {unmapped[:8]}")
    return tree


def convert_pipeline(src_dir: str, out_dir: str, name: str = "imagedream"):
    """Full pipeline conversion (run offline with downloaded repos)."""
    import os

    from transformers import FlaxCLIPTextModel, FlaxCLIPVisionModel

    from lgm_tpu.diffusion.pipeline import CONFIGS, MVDreamPipeline
    from lgm_tpu.tools.convert_weights import load_torch_state_dict

    unet_sd = load_torch_state_dict(
        os.path.join(src_dir, "unet", "diffusion_pytorch_model.safetensors")
    )
    vae_sd = load_torch_state_dict(
        os.path.join(src_dir, "vae", "diffusion_pytorch_model.safetensors")
    )
    text = FlaxCLIPTextModel.from_pretrained(
        os.path.join(src_dir, "text_encoder"), from_pt=True
    )
    vision = FlaxCLIPVisionModel.from_pretrained(
        os.path.join(src_dir, "image_encoder"), from_pt=True
    )

    pipe = MVDreamPipeline.from_config(name)
    pipe.params = {
        "unet": convert_component(unet_sd, unet_torch_to_flax),
        "vae": convert_component(vae_sd, vae_torch_to_flax),
        "text_encoder": text.params,
        "image_encoder": vision.params,
    }
    pipe.save_pretrained(out_dir)
    # Copy tokenizer files for real BPE tokenization.
    tok_src = os.path.join(src_dir, "tokenizer")
    if os.path.isdir(tok_src):
        import shutil

        shutil.copytree(tok_src, os.path.join(out_dir, "tokenizer"),
                        dirs_exist_ok=True)
    print(f"converted pipeline -> {out_dir}")


if __name__ == "__main__":
    convert_pipeline(sys.argv[1], sys.argv[2],
                     sys.argv[3] if len(sys.argv) > 3 else "imagedream")
