"""Golden-parity tests for the CLIP text/vision encoders.

Fixture from scripts/gen_golden_clip.py: torch CLIPTextModel /
CLIPVisionModel outputs with random weights, plus the weights converted
to Flax by transformers' from_pt loader (the path
tools/convert_diffusion.py::convert_pipeline uses for real checkpoints).
The encoders here are rebuilt exactly the way MVDreamPipeline does
(_build_clip + the _text_jit/_vision_jit output selections), so parity
means the pipeline's conditioning path reproduces torch CLIP — the check
VERDICT r2 #4 asked for (ref: mvdream/pipeline_mvdream.py:187-337,
402-429).
"""

import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "clip_tiny.npz")


@pytest.fixture(scope="module")
def golden():
    data = np.load(GOLDEN)

    def unflatten(prefix):
        tree = {}
        for k in data.files:
            if not k.startswith(prefix):
                continue
            node = tree
            parts = k[len(prefix):].split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = data[k]
        return tree

    return data, unflatten("tp/"), unflatten("vp/")


def _pipeline_clip():
    """Build the encoders through the pipeline's own constructor."""
    from lgm_tpu.diffusion.pipeline import MVDreamPipeline, PipelineConfig

    cfg = PipelineConfig(
        vocab_size=500, text_hidden=64, text_layers=3, text_heads=4,
        max_tokens=16,
        vision_hidden=64, vision_layers=3, vision_heads=4,
        image_size=32, patch_size=16,
    )
    return MVDreamPipeline._build_clip(cfg)


def test_clip_text_matches_reference_torch(golden):
    data, tparams, _ = golden
    text, _ = _pipeline_clip()
    out = text.module.apply(
        {"params": tparams}, data["ids"], data["mask"], data["pos"]
    ).last_hidden_state
    y = np.asarray(out, np.float32)
    y_ref = data["y_text"]
    assert y.shape == y_ref.shape
    err = np.abs(y - y_ref)
    scale = np.abs(y_ref).max()
    assert err.max() <= 1e-4 * max(scale, 1.0) + 1e-5, (
        f"max abs err {err.max():.3e} (ref scale {scale:.3e})"
    )


def test_clip_vision_penultimate_matches_reference_torch(golden):
    data, _, vparams = golden
    _, vision = _pipeline_clip()
    out = vision.module.apply(
        {"params": vparams}, data["img_nhwc"], output_hidden_states=True
    ).hidden_states[-2]
    y = np.asarray(out, np.float32)
    y_ref = data["y_vis"]
    assert y.shape == y_ref.shape
    err = np.abs(y - y_ref)
    scale = np.abs(y_ref).max()
    assert err.max() <= 1e-4 * max(scale, 1.0) + 1e-5, (
        f"max abs err {err.max():.3e} (ref scale {scale:.3e})"
    )


def test_prompt_encoding_fails_loudly_without_real_tokenizer():
    """A pipeline whose config does not allow the hashing stand-in must
    refuse to encode prompts (real checkpoints need the CLIP BPE vocab;
    silently hashing would feed garbage conditioning to real weights)."""
    import dataclasses

    from lgm_tpu.diffusion.pipeline import CONFIGS, MVDreamPipeline

    cfg = dataclasses.replace(
        CONFIGS["tiny-test"], allow_hash_tokenizer=False)
    pipe = MVDreamPipeline(cfg, params={})
    with pytest.raises(RuntimeError, match="tokenizer"):
        pipe.encode_prompt("a chair")
