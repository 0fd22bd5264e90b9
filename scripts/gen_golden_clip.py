"""Generate CLIP text/vision encoder goldens (tests/golden/clip_tiny.npz).

The diffusion pipeline's prompt/image conditioning runs transformers
FlaxCLIPTextModel (last_hidden_state) and FlaxCLIPVisionModel
(hidden_states[-2] — the penultimate layer, matching
pipeline_mvdream.py:402-413). Until now these had zero numeric tests.
This generator runs the TORCH CLIPTextModel/CLIPVisionModel at a small
config with random weights, converts the weights to Flax via
transformers' own from_pt loader, and records inputs + torch outputs +
flax params. tests/test_golden_clip.py then rebuilds the encoders the
way MVDreamPipeline._build_clip does and asserts parity at 1e-4 —
validating the config wiring, the output-selection (last_hidden_state /
penultimate hidden state), and the pixel layout handling.

Usage: python scripts/gen_golden_clip.py
"""

import os
import tempfile

import numpy as np
import torch

from transformers import (CLIPTextConfig, CLIPTextModel, CLIPVisionConfig,
                          CLIPVisionModel, FlaxCLIPTextModel,
                          FlaxCLIPVisionModel)

# Mirrors MVDreamPipeline._build_clip's construction from PipelineConfig
# (lgm_tpu/diffusion/pipeline.py): intermediate = 4*hidden, and the
# derived fields below are exactly what a PipelineConfig with these
# values produces. 3 layers so the vision penultimate layer is distinct
# from both the first and the last.
TEXT = dict(vocab_size=500, hidden_size=64, intermediate_size=256,
            num_hidden_layers=3, num_attention_heads=4,
            max_position_embeddings=16)
VISION = dict(hidden_size=64, intermediate_size=256, num_hidden_layers=3,
              num_attention_heads=4, image_size=32, patch_size=16)


def _flatten(tree, prefix, out):
    for k, v in tree.items():
        if isinstance(v, dict):
            _flatten(v, prefix + k + "/", out)
        else:
            out[prefix + k] = np.asarray(v, np.float32)


def main():
    torch.manual_seed(0)
    ttext = CLIPTextModel(CLIPTextConfig(**TEXT)).eval()
    tvis = CLIPVisionModel(CLIPVisionConfig(**VISION)).eval()

    rng = np.random.default_rng(1)
    ids = rng.integers(0, TEXT["vocab_size"], size=(1, 16)).astype(np.int64)
    mask = np.ones_like(ids)
    pos = np.arange(16, dtype=np.int64)[None]
    # [1, H, W, 3] in normalized CLIP space, like encode_image produces.
    img_nhwc = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)

    with torch.no_grad():
        y_text = ttext(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
            position_ids=torch.from_numpy(pos),
        ).last_hidden_state.numpy()
        y_vis = tvis(
            pixel_values=torch.from_numpy(
                img_nhwc.transpose(0, 3, 1, 2)),
            output_hidden_states=True,
        ).hidden_states[-2].numpy()

    # Torch -> Flax weights via transformers' own converter (the same
    # path tools/convert_diffusion.py uses for the real checkpoints).
    out = {
        "ids": ids, "mask": mask, "pos": pos, "img_nhwc": img_nhwc,
        "y_text": y_text.astype(np.float32),
        "y_vis": y_vis.astype(np.float32),
    }
    with tempfile.TemporaryDirectory() as td:
        ttext.save_pretrained(os.path.join(td, "text"))
        tvis.save_pretrained(os.path.join(td, "vision"))
        ftext = FlaxCLIPTextModel.from_pretrained(
            os.path.join(td, "text"), from_pt=True)
        fvis = FlaxCLIPVisionModel.from_pretrained(
            os.path.join(td, "vision"), from_pt=True)
    _flatten(ftext.params, "tp/", out)
    _flatten(fvis.params, "vp/", out)

    dst = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                       "clip_tiny.npz")
    np.savez_compressed(dst, **out)
    print(f"wrote {os.path.abspath(dst)}: text {y_text.shape} "
          f"vis {y_vis.shape}")


if __name__ == "__main__":
    main()
