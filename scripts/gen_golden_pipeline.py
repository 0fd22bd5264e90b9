"""Generate COMPOSED diffusion-pipeline golden fixtures
(tests/golden/pipeline_tiny.npz, pipeline_ip_tiny.npz).

Every diffusion component already has an isolated golden (CLIP text/
vision, VAE, mv-UNet); what those cannot catch are sign/order bugs in
the COMPOSITION the reference pipeline performs per denoise step —
CFG latent duplication and uncond/cond split order, per-frame camera
conditioning, the ip latent substituted as frame 5, scheduler scaling,
DDIM stepping, and the final VAE decode
(ref: mvdream/pipeline_mvdream.py:431-545). This script builds that
composition in TORCH at a tiny config and runs 3 full denoise steps:

- UNet: the REFERENCE torch MultiViewUNetModel (stubs via
  gen_golden_mvunet — exact-math xformers/diffusers shims).
- VAE: the independent torch mirror of diffusers AutoencoderKL from
  gen_golden_vae (canonical diffusers key names).
- CLIP text/vision: torch transformers models (canonical configs).
- DDIM: a HAND implementation below with diffusers semantics
  (scaled-linear betas 0.00085..0.012, leading spacing + steps_offset 1,
  set_alpha_to_one=False, epsilon prediction, eta=0) — independent of
  lgm_tpu/diffusion/ddim.py, so the fixture is a true scheduler oracle.
- get_camera: the REFERENCE mvdream get_camera, with kiui's absent
  orbit_camera stubbed by our verified lgm_tpu.utils.camera.orbit_camera
  (the one piece shared between oracle and test; its math is covered by
  the camera parity tests).

tests/test_golden_pipeline.py then runs our MVDreamPipeline.__call__
end-to-end through the production converters and asserts the final
latents and decoded images match.

Deliberate deviation mirrored here: our encode_image_latents uses the
posterior MEAN (deterministic) where the reference samples
(pipeline_mvdream.py:426); the oracle uses the mean too.

Usage: LGM_REFERENCE=/root/reference python scripts/gen_golden_pipeline.py
"""

import os
import sys

import numpy as np

SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, SCRIPTS)
sys.path.insert(0, os.path.dirname(SCRIPTS))

import gen_golden_mvunet  # noqa: E402  (installs reference stubs)
import gen_golden_vae  # noqa: E402  (torch AutoencoderKL mirror)
import torch  # noqa: E402

import mvdream.mv_unet as ref_mv  # noqa: E402  (the reference module)

from lgm_tpu.diffusion.pipeline import HashTokenizer  # noqa: E402
from lgm_tpu.utils import camera as our_camera  # noqa: E402

# get_camera needs kiui's orbit_camera (absent); use ours (opengl c2w,
# same convention — covered by tests/test_camera.py).
ref_mv.orbit_camera = lambda ele, azi, radius=1.0: np.asarray(
    our_camera.orbit_camera(ele, azi, radius), np.float32
)

SCALING = 0.18215
HEIGHT = 32           # VAE factor 2 -> latent 16, UNet /2 ladder -> 8
STEPS = 3
GUIDANCE = 5.0
ELEVATION = 0.0
PROMPT = "a photo of an owl statue"
NEGATIVE = "ugly, blurry"

UNET_CFG = dict(
    image_size=8, in_channels=4, model_channels=32, out_channels=4,
    num_res_blocks=1, attention_resolutions=(1, 2), channel_mult=(1, 2),
    num_head_channels=16, transformer_depth=1, context_dim=32,
    camera_dim=16, ip_dim=0,
)
TEXT_CFG = dict(vocab_size=1000, hidden_size=32, intermediate_size=128,
                num_hidden_layers=2, num_attention_heads=2,
                max_position_embeddings=16)
VISION_CFG = dict(hidden_size=1280, intermediate_size=5120,
                  num_hidden_layers=2, num_attention_heads=16,
                  image_size=32, patch_size=16)

CLIP_IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def hand_ddim_alphas(num_train=1000, beta_start=0.00085, beta_end=0.012):
    betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5, num_train,
                        dtype=np.float64) ** 2
    return np.cumprod(1.0 - betas)


def hand_ddim_timesteps(num_train, steps, offset=1):
    step = num_train // steps
    return ((np.arange(steps) * step).round()[::-1].astype(np.int64)
            + offset)


def encode_text(text_model, ids):
    with torch.no_grad():
        out = text_model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(np.ones_like(ids)),
            position_ids=torch.from_numpy(
                np.arange(ids.shape[1])[None]),
        ).last_hidden_state
    return out.numpy().astype(np.float32)


def main():
    from transformers import CLIPTextConfig, CLIPTextModel
    from transformers import CLIPVisionConfig, CLIPVisionModel

    torch.manual_seed(21)
    text_model = CLIPTextModel(CLIPTextConfig(**TEXT_CFG)).eval()
    torch.manual_seed(22)
    vision_model = CLIPVisionModel(CLIPVisionConfig(**VISION_CFG)).eval()
    torch.manual_seed(23)
    vae = gen_golden_vae.AutoencoderKL().eval()

    tok = HashTokenizer(TEXT_CFG["vocab_size"],
                        TEXT_CFG["max_position_embeddings"])
    ids_neg, ids_pos = tok(NEGATIVE), tok(PROMPT)
    neg = encode_text(text_model, ids_neg)   # [1, L, 32]
    pos = encode_text(text_model, ids_pos)

    gen = torch.Generator().manual_seed(24)
    image = torch.rand(HEIGHT, HEIGHT, 3, generator=gen).numpy().astype(
        np.float32)  # [32, 32, 3] in [0,1]; config sizes make resizes a no-op

    ac = hand_ddim_alphas()
    ts = hand_ddim_timesteps(1000, STEPS)

    def run(unet, F, use_ip, lat0, cam):
        ctx = np.concatenate([neg] * F + [pos] * F)        # [2F, L, 32]
        cam2 = np.concatenate([cam] * 2)                   # [2F, 16]
        kw = {}
        if use_ip:
            img_in = (image - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD
            with torch.no_grad():
                feats = vision_model(
                    torch.from_numpy(
                        img_in[None].transpose(0, 3, 1, 2)),
                    output_hidden_states=True,
                ).hidden_states[-2].numpy().astype(np.float32)
            with torch.no_grad():
                moments = vae.encode_moments(torch.from_numpy(
                    (2.0 * image - 1.0)[None].transpose(0, 3, 1, 2)))
            lat_pos = moments[:, :4].numpy().astype(np.float32) * SCALING
            ip = np.concatenate([np.zeros_like(feats)] * F
                                + [feats] * F)
            ip_img = np.concatenate([np.zeros_like(lat_pos), lat_pos])
            kw = dict(ip=torch.from_numpy(ip),
                      ip_img=torch.from_numpy(ip_img))
        lat = lat0.copy()
        for t in ts:
            lmi = torch.from_numpy(np.concatenate([lat] * 2))
            tvec = torch.full((F * 2,), float(t))
            with torch.no_grad():
                eps_t = unet(lmi.clone(), timesteps=tvec,
                             context=torch.from_numpy(ctx),
                             camera=torch.from_numpy(cam2),
                             num_frames=F, **kw)
            eps_t = eps_t.numpy().astype(np.float32)
            eu, ec = eps_t[:F], eps_t[F:]
            eps = eu + GUIDANCE * (ec - eu)
            prev_t = t - 1000 // STEPS
            at = ac[t]
            ap = ac[prev_t] if prev_t >= 0 else ac[0]
            x0 = (lat - np.sqrt(1 - at) * eps) / np.sqrt(at)
            lat = (np.sqrt(ap) * x0
                   + np.sqrt(1 - ap) * eps).astype(np.float32)
        with torch.no_grad():
            rgb = vae.decode(
                torch.from_numpy(lat / SCALING)).numpy().astype(np.float32)
        images = np.clip(rgb / 2 + 0.5, 0.0, 1.0)
        return lat.astype(np.float32), images

    common = {
        "ids_neg": ids_neg, "ids_pos": ids_pos,
        "image": image,
        "steps": np.int64(STEPS), "guidance": np.float32(GUIDANCE),
        "elevation": np.float32(ELEVATION),
        "prompt": np.bytes_(PROMPT.encode()),
        "negative": np.bytes_(NEGATIVE.encode()),
    }
    for k, v in text_model.state_dict().items():
        common["text_sd/" + k] = v.numpy().astype(np.float32)
    for k, v in vae.state_dict().items():
        common["vae_sd/" + k] = v.numpy().astype(np.float32)

    dst_dir = os.path.join(os.path.dirname(SCRIPTS), "tests", "golden")

    # --- text path (mvdream): F=4, no ip -----------------------------
    torch.manual_seed(25)
    unet = ref_mv.MultiViewUNetModel(**UNET_CFG).eval()
    F = 4
    cam = ref_mv.get_camera(4, elevation=ELEVATION,
                            extra_view=False).numpy().astype(np.float32)
    lat0 = torch.randn(F, 4, HEIGHT // 2, HEIGHT // 2,
                       generator=torch.Generator().manual_seed(26)
                       ).numpy().astype(np.float32)
    latf, images = run(unet, F, False, lat0, cam)
    out = dict(common, latents0=lat0, latents_final=latf, images=images,
               camera=cam)
    for k, v in unet.state_dict().items():
        out["unet_sd/" + k] = v.numpy().astype(np.float32)
    np.savez_compressed(os.path.join(dst_dir, "pipeline_tiny.npz"), **out)
    print(f"pipeline_tiny.npz: latents {latf.shape} images {images.shape} "
          f"|lat| {np.abs(latf).max():.3f}")

    # --- image path (imagedream): F=5, ip branch ---------------------
    torch.manual_seed(27)
    unet_ip = ref_mv.MultiViewUNetModel(
        **dict(UNET_CFG, ip_dim=4, ip_weight=1.0)).eval()
    F = 5
    cam = ref_mv.get_camera(4, elevation=ELEVATION,
                            extra_view=True).numpy().astype(np.float32)
    lat0 = torch.randn(F, 4, HEIGHT // 2, HEIGHT // 2,
                       generator=torch.Generator().manual_seed(28)
                       ).numpy().astype(np.float32)
    latf, images = run(unet_ip, F, True, lat0, cam)
    out = dict(common, latents0=lat0, latents_final=latf, images=images,
               camera=cam)
    for k, v in unet_ip.state_dict().items():
        out["unet_sd/" + k] = v.numpy().astype(np.float32)
    # The vision tower at canonical ViT-H dims (1280/5120) is ~161 MB of
    # f32 — committing it bloats every clone (ADVICE r4). Its weights
    # are pure seeded torch init, so the fixture stores only (seed,
    # config, checksum); tests/test_golden_pipeline.py reconstructs the
    # state dict with the same transformers init and validates the
    # checksum (a drifted torch init fails loudly with a regen hint).
    out["vision_seed"] = np.int64(22)
    for kk, vv in VISION_CFG.items():
        out["vision_cfg/" + kk] = np.int64(vv)
    out["vision_checksum"] = np.float64(
        sum(float(v.to(torch.float64).sum())
            for v in vision_model.state_dict().values()))
    np.savez_compressed(os.path.join(dst_dir, "pipeline_ip_tiny.npz"),
                        **out)
    print(f"pipeline_ip_tiny.npz: latents {latf.shape} images "
          f"{images.shape} |lat| {np.abs(latf).max():.3f}")


if __name__ == "__main__":
    main()
