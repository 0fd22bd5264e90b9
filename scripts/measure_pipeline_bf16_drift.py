"""bf16-vs-f32 drift of the SHIPPING diffusion pipeline (round 5).

The composed-pipeline goldens (tests/test_golden_pipeline.py) verify
the denoise composition in f32 at a tiny config; the production
inference path runs bf16 towers at 256² images (32² latents, 30 DDIM
steps — pipeline.py `compute_dtype`, mirroring the reference's fp16
autocast, ref: mvdream/pipeline_mvdream.py:431-545). This script bounds
how far the bf16 composition drifts from the f32-verified one at the
REAL shape: same random-init full-scale ImageDream weights, same
starting noise, both dtypes, 30 steps + CFG + VAE decode.

Weight values are random-init (published checkpoints are env-blocked),
so the number is an architecture-level drift bound, not a sample
fidelity claim; drift is dominated by per-op rounding, which does not
depend on weights being trained. IMPORTANT: the plain random init is
NOT enough — the MVDream U-Net's output convs are zero-initialized
(standard diffusion init; ref: mv_unet.py zero_module calls), so at
init the whole eps-prediction is EXACTLY zero and the DDIM trajectory
is dtype-independent (measured: bit-identical latents). Every
parameter therefore gets seeded noise added before the comparison so
all compute paths are live at realistic weight scale.

Usage: python scripts/measure_pipeline_bf16_drift.py [--steps 30]
"""

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_tpu"),
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--size", type=int, default=256)
    args = p.parse_args()

    import jax

    from transformers import CLIPTokenizer

    from lgm_tpu.diffusion.pipeline import CONFIGS, MVDreamPipeline

    fixture = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "clip_tokenizer")
    tok = CLIPTokenizer.from_pretrained(fixture)

    def with_tok(pipe):
        pipe.tokenizer = lambda text: np.asarray(
            tok(text, padding="max_length", max_length=pipe.cfg.max_tokens,
                truncation=True, return_tensors="np").input_ids)
        return pipe

    t0 = time.time()
    pipe_bf = with_tok(MVDreamPipeline.from_config("imagedream", seed=0))
    # Activate the zero-initialized output convs (see module docstring):
    # without this the unet's eps is exactly 0 and the drift is vacuous.
    noise_rng = np.random.default_rng(7)

    def perturb(x):
        if hasattr(x, "shape") and x.ndim >= 1:
            return np.asarray(x) + 0.02 * noise_rng.standard_normal(
                x.shape).astype(np.float32)
        return x

    import jax as _jax

    params = dict(pipe_bf.params)
    params["unet"] = _jax.tree.map(perturb, _jax.tree.map(
        np.asarray, params["unet"]))
    pipe_bf = with_tok(MVDreamPipeline(CONFIGS["imagedream"],
                                       params=params,
                                       tokenizer=pipe_bf.tokenizer))
    cfg_f32 = dataclasses.replace(CONFIGS["imagedream"],
                                  compute_dtype="float32")
    pipe_f32 = with_tok(MVDreamPipeline(cfg_f32, params=params))
    print(f"init: {time.time() - t0:.1f}s  backend={jax.default_backend()}")

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (args.size, args.size, 3)).astype(np.float32)
    f = 2 ** (len(pipe_bf.cfg.vae_channels) - 1)
    F = 5  # 4 frames + ip frame
    lat0 = rng.standard_normal(
        (F, args.size // f, args.size // f, 4)).astype(np.float32)

    results = {}
    for name, pipe in (("bf16", pipe_bf), ("f32", pipe_f32)):
        t0 = time.time()
        lat = pipe(image=img, prompt="", height=args.size,
                   width=args.size, num_inference_steps=args.steps,
                   guidance_scale=5.0, latents=lat0,
                   output_type="latent")
        imgs = pipe.decode_latents(lat)
        results[name] = (np.asarray(lat), np.asarray(imgs))
        print(f"{name}: {time.time() - t0:.1f}s (incl. compile)")

    lat_b, img_b = results["bf16"]
    lat_f, img_f = results["f32"]
    scale = np.abs(lat_f).max()
    dl = np.abs(lat_b - lat_f)
    di = np.abs(img_b.astype(np.float32) - img_f.astype(np.float32))
    print(f"\nlatents  : max|d| {dl.max():.4f}  mean|d| {dl.mean():.5f} "
          f" (f32 scale {scale:.2f}; rel max {dl.max() / scale:.4f})")
    print(f"images   : max|d| {di.max():.4f}  mean|d| {di.mean():.5f} "
          f" (range [0,1])")


if __name__ == "__main__":
    main()
