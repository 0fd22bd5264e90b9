"""Inference-pipeline profiler: image -> multi-view -> splatter -> video.

Times the three stages of the reference inference path (BASELINE.json
config 3; ref: infer.py:26-157):
  1. multi-view diffusion: 30 DDIM steps x 2 (CFG) MultiViewUNet fwds
  2. LGM forward: 4 views -> [N, 14] splatter Gaussians
  3. 180-frame 360-degree orbit render at the output resolution

Diffusion weights are random-initialized at full ImageDream scale (the
published checkpoints need offline conversion; timing is weight-value
independent). Run:

    python scripts/profile_infer.py [--preset big] [--steps 30]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent XLA executable cache (see bench.py): repeat runs skip the
# slow remote compile through the TPU tunnel.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_tpu"),
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="big")
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--frames", type=int, default=180)
    p.add_argument("--skip-diffusion", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from lgm_tpu.config import get_config
    from lgm_tpu.models.lgm import LGM
    from lgm_tpu.utils import camera

    opt = get_config(args.preset)
    print(f"backend={jax.default_backend()} preset={args.preset}")

    results = {}

    # ---- 1. diffusion front-end (full ImageDream scale, random init) ----
    if not args.skip_diffusion:
        from lgm_tpu.diffusion import MVDreamPipeline

        t0 = time.time()
        pipe = MVDreamPipeline.from_config("imagedream", seed=0)
        # Timing uses random weights; prompt encoding still needs a real
        # tokenizer since the r3 fail-loud guard (the hash stand-in is
        # test-config-only). The committed BPE fixture exercises the
        # exact branch real checkpoints take; its ids (< 56) are valid
        # rows of the 49408-entry embedding.
        from transformers import CLIPTokenizer

        fixture = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tests", "fixtures", "clip_tokenizer")
        tok = CLIPTokenizer.from_pretrained(fixture)
        pipe.tokenizer = lambda text: np.asarray(
            tok(text, padding="max_length",
                max_length=pipe.cfg.max_tokens, truncation=True,
                return_tensors="np").input_ids)
        print(f"pipeline init: {time.time() - t0:.1f}s")

        img = np.random.default_rng(0).uniform(
            0, 1, (256, 256, 3)
        ).astype(np.float32)
        # warm (compiles the sampling scan + encoders + vae) — at the SAME
        # step count as the timed call: the jitted DDIM scan's length is
        # part of the graph, so a different count would recompile inside
        # the timed region.
        t0 = time.time()
        mv = pipe(image=img, prompt="", num_inference_steps=args.steps,
                  guidance_scale=5.0)
        print(f"diffusion warm ({args.steps} steps + compile): "
              f"{time.time() - t0:.1f}s")
        t0 = time.time()
        mv = pipe(image=img, prompt="", num_inference_steps=args.steps,
                  guidance_scale=5.0)
        results[f"diffusion {args.steps} DDIM steps (CFG x2)"] = (
            time.time() - t0
        )
        mv4 = mv[[1, 2, 3, 0]][:4]
    else:
        mv4 = np.random.default_rng(0).uniform(
            0, 1, (4, 256, 256, 3)
        ).astype(np.float32)

    # ---- 2. LGM forward ------------------------------------------------
    import cv2

    from lgm_tpu.infer import build_input

    mv4 = np.stack([
        cv2.resize(np.asarray(m, np.float32),
                   (opt.input_size, opt.input_size)) for m in mv4
    ])
    model = LGM(opt)
    inp = jnp.asarray(build_input(mv4, opt))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), inp)
    fwd = jax.jit(lambda v, x: model.apply(v, x))
    g = jax.block_until_ready(fwd(variables, inp))  # compile
    t0 = time.time()
    g = jax.block_until_ready(fwd(variables, inp))
    results["LGM forward (4 views -> gaussians)"] = time.time() - t0
    gaussians = np.asarray(g)[0]
    print(f"gaussians: {gaussians.shape}")

    # ---- 3. orbit video ------------------------------------------------
    from lgm_tpu.infer import render_orbit_video
    import tempfile

    out = os.path.join(tempfile.mkdtemp(), "orbit.mp4")
    render_orbit_video(gaussians, opt, out, n_frames=args.frames,
                       chunk=30)  # warm/compile
    t0 = time.time()
    render_orbit_video(gaussians, opt, out, n_frames=args.frames,
                       chunk=30)
    results[f"orbit video {args.frames}f @{opt.output_size}"] = (
        time.time() - t0
    )

    total = sum(results.values())
    for k, v in results.items():
        print(f"{k:42s} {v:8.2f} s")
    print(f"{'total pipeline':42s} {total:8.2f} s")


if __name__ == "__main__":
    main()
