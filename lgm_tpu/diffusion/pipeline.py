"""MVDream / ImageDream multi-view diffusion pipeline.

Re-design of the reference diffusers pipeline
(ref: mvdream/pipeline_mvdream.py:23-558) without diffusers: components are
Flax modules (our MultiViewUNetModel + AutoencoderKL, transformers Flax
CLIP encoders) orchestrated by a numpy DDIM loop with classifier-free
guidance and per-frame camera conditioning. The UNet step is jitted once
and reused across the denoising loop.

Text path (mvdream-sd2.1): 4 frames, text context only.
Image path (imagedream-ipmv): 4+1 frames; CLIP image features feed the
ip Resampler branch and the encoded image latent replaces the 5th frame
(ref: pipeline_mvdream.py:465-469, 486-497, 505-536).

Weights: ``from_pretrained(path)`` loads a converted checkpoint directory
(tools/convert_diffusion.py writes it from the published torch repos);
``from_config(..., params_path=None)`` random-initializes — used for
architecture tests and smoke runs in this zero-egress environment.

Tokenizer: a real CLIPTokenizer is used when vocab files are present in
the checkpoint dir. Without one, prompt encoding FAILS LOUDLY unless the
config opts into the deterministic hashing stand-in
(allow_hash_tokenizer — tiny test configs only; hashed ids are stable
but are not CLIP BPE and would be garbage conditioning for real
weights).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

from lgm_tpu.diffusion.ddim import DDIMScheduler
from lgm_tpu.diffusion.mv_unet import MultiViewUNetModel, get_camera
from lgm_tpu.diffusion.vae import SCALING_FACTOR, AutoencoderKL

CLIP_IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    # UNet
    model_channels: int = 320
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    attention_resolutions: Tuple[int, ...] = (4, 2, 1)
    num_res_blocks: int = 2
    num_head_channels: int = 64
    context_dim: int = 1024
    ip_dim: int = 0            # 16 for ImageDream
    ip_weight: float = 1.0
    # VAE
    vae_channels: Tuple[int, ...] = (128, 256, 512, 512)
    # CLIP text
    text_hidden: int = 1024
    text_layers: int = 23
    text_heads: int = 16
    vocab_size: int = 49408
    max_tokens: int = 77
    # CLIP vision (ImageDream ip features, ViT-H/14)
    vision_hidden: int = 1280
    vision_layers: int = 32
    vision_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    # Compute dtype for the UNet/VAE towers. The reference runs fp16
    # autocast inference (ref: infer.py:58-64 torch_dtype=float16);
    # bf16 is the TPU equivalent (params stay f32).
    compute_dtype: str = "bfloat16"
    # Permit the deterministic hashing stand-in tokenizer for prompt
    # encoding. Only the tiny test configs set this: with real weights a
    # hashed id sequence is garbage conditioning, so encode_prompt
    # fails loudly instead of silently hashing (VERDICT r2 #4). Real
    # checkpoints must ship a tokenizer/ dir (CLIP BPE vocab).
    allow_hash_tokenizer: bool = False


CONFIGS = {
    "mvdream": PipelineConfig(),
    "imagedream": PipelineConfig(ip_dim=16),
    # Tiny config for architecture tests on CPU.
    "tiny-test": PipelineConfig(
        model_channels=32, channel_mult=(1, 2),
        attention_resolutions=(1, 2), num_res_blocks=1,
        num_head_channels=16, context_dim=32,
        vae_channels=(32, 64), text_hidden=32, text_layers=2, text_heads=2,
        vocab_size=1000, max_tokens=16,
        vision_hidden=48, vision_layers=2, vision_heads=2,
        image_size=32, patch_size=16, allow_hash_tokenizer=True,
    ),
    "tiny-test-ip": PipelineConfig(
        model_channels=32, channel_mult=(1, 2),
        attention_resolutions=(1, 2), num_res_blocks=1,
        num_head_channels=16, context_dim=32,
        vae_channels=(32, 64), text_hidden=32, text_layers=2, text_heads=2,
        vocab_size=1000, max_tokens=16,
        vision_hidden=48, vision_layers=2, vision_heads=2,
        image_size=32, patch_size=16, ip_dim=4,
        allow_hash_tokenizer=True,
    ),
    # Composed-pipeline golden configs (tests/golden/pipeline_tiny.npz,
    # pipeline_ip_tiny.npz from scripts/gen_golden_pipeline.py): f32 so
    # the 3-step denoise matches the torch oracle to golden tolerance;
    # vision_hidden=1280 because the reference Resampler hardcodes its
    # input width (ref: mv_unet.py:738 embedding_dim=1280).
    "tiny-pipe": PipelineConfig(
        model_channels=32, channel_mult=(1, 2),
        attention_resolutions=(1, 2), num_res_blocks=1,
        num_head_channels=16, context_dim=32,
        vae_channels=(32, 64), text_hidden=32, text_layers=2,
        text_heads=2, vocab_size=1000, max_tokens=16,
        vision_hidden=1280, vision_layers=2, vision_heads=16,
        image_size=32, patch_size=16, compute_dtype="float32",
        allow_hash_tokenizer=True,
    ),
    "tiny-pipe-ip": PipelineConfig(
        model_channels=32, channel_mult=(1, 2),
        attention_resolutions=(1, 2), num_res_blocks=1,
        num_head_channels=16, context_dim=32,
        vae_channels=(32, 64), text_hidden=32, text_layers=2,
        text_heads=2, vocab_size=1000, max_tokens=16,
        vision_hidden=1280, vision_layers=2, vision_heads=16,
        image_size=32, patch_size=16, ip_dim=4,
        compute_dtype="float32", allow_hash_tokenizer=True,
    ),
    # Full ladder depth (4 levels like the real configs) at tiny widths:
    # regression coverage for init shapes that must survive 3 down/up
    # rounds (a too-small init latent hits a skip-concat mismatch).
    "tiny-test-deep": PipelineConfig(
        model_channels=32, channel_mult=(1, 1, 2, 2),
        attention_resolutions=(4, 2, 1), num_res_blocks=1,
        num_head_channels=16, context_dim=32,
        vae_channels=(32, 32), text_hidden=32, text_layers=1, text_heads=1,
        vocab_size=500, max_tokens=8,
        vision_hidden=32, vision_layers=1, vision_heads=1,
        image_size=32, patch_size=16, allow_hash_tokenizer=True,
    ),
}


class HashTokenizer:
    """Deterministic fallback tokenizer (NOT CLIP BPE; testing only)."""

    def __init__(self, vocab_size: int, max_tokens: int):
        self.vocab_size = vocab_size
        self.max_tokens = max_tokens
        self.bos, self.eos = 0, 1

    def __call__(self, text: str) -> np.ndarray:
        import hashlib

        ids = [self.bos]
        for w in text.lower().split()[: self.max_tokens - 2]:
            h = int(hashlib.sha1(w.encode()).hexdigest(), 16)
            ids.append(2 + h % (self.vocab_size - 2))
        ids.append(self.eos)
        ids += [self.eos] * (self.max_tokens - len(ids))
        return np.asarray([ids], np.int64)


class MVDreamPipeline:
    def __init__(self, config: PipelineConfig, params: Dict,
                 tokenizer=None, scheduler: Optional[DDIMScheduler] = None):
        import jax

        self.cfg = config
        self.params = params
        self.scheduler = scheduler or DDIMScheduler()
        self.tokenizer = tokenizer or HashTokenizer(
            config.vocab_size, config.max_tokens
        )

        import jax.numpy as jnp

        cdt = jnp.bfloat16 if config.compute_dtype == "bfloat16" \
            else jnp.float32
        self.unet = MultiViewUNetModel(
            model_channels=config.model_channels,
            channel_mult=config.channel_mult,
            attention_resolutions=config.attention_resolutions,
            num_res_blocks=config.num_res_blocks,
            num_head_channels=config.num_head_channels,
            context_dim=config.context_dim,
            ip_dim=config.ip_dim,
            ip_weight=config.ip_weight,
            dtype=cdt,
        )
        self.vae = AutoencoderKL(block_out_channels=config.vae_channels,
                                 dtype=cdt)
        self._text_model, self._vision_model = self._build_clip(config)

        self._unet_step = jax.jit(
            lambda p, x, t, ctx, cam, f: self.unet.apply(
                {"params": p}, x, t, ctx, f, camera=cam
            ),
            static_argnums=(5,),
        )
        self._unet_step_ip = jax.jit(
            lambda p, x, t, ctx, cam, f, ip, ip_img: self.unet.apply(
                {"params": p}, x, t, ctx, f, camera=cam, ip=ip,
                ip_img=ip_img,
            ),
            static_argnums=(5,),
        )
        # Every encoder/decoder is jitted too: un-jitted, a single
        # pipeline call spends ~10 s dispatching the 32-layer CLIP
        # vision tower and the VAE op-by-op through a remote-TPU link.
        self._text_jit = jax.jit(
            lambda p, ids, mask, pos: self._text_model.module.apply(
                {"params": p}, ids, mask, pos
            ).last_hidden_state
        )
        self._vision_jit = jax.jit(
            lambda p, x: self._vision_model.module.apply(
                {"params": p}, x, output_hidden_states=True
            ).hidden_states[-2]
        )
        self._vae_encode = jax.jit(
            lambda p, x: self.vae.apply(
                {"params": p}, x, method=self.vae.encode
            )[0]
        )
        self._vae_decode = jax.jit(
            lambda p, z: self.vae.apply(
                {"params": p}, z, method=self.vae.decode
            )
        )
        # The whole DDIM denoising loop as ONE jitted scan: the eager
        # loop pays several host<->device round trips per step (latent
        # upload, noise readback, scheduler math) — ~30 ms each through
        # a remote-TPU tunnel, seconds over 30-50 steps — and blocks the
        # device between steps. In-graph, latents never leave the chip.
        self._sample_jit = jax.jit(
            self._sample_impl,
            static_argnames=("F", "cfg_on", "use_ip"),
        )

    @staticmethod
    def _build_clip(config: PipelineConfig):
        from transformers import (CLIPTextConfig, CLIPVisionConfig,
                                  FlaxCLIPTextModel, FlaxCLIPVisionModel)

        tc = CLIPTextConfig(
            vocab_size=config.vocab_size,
            hidden_size=config.text_hidden,
            intermediate_size=config.text_hidden * 4,
            num_hidden_layers=config.text_layers,
            num_attention_heads=config.text_heads,
            max_position_embeddings=config.max_tokens,
        )
        vc = CLIPVisionConfig(
            hidden_size=config.vision_hidden,
            intermediate_size=config.vision_hidden * 4,
            num_hidden_layers=config.vision_layers,
            num_attention_heads=config.vision_heads,
            image_size=config.image_size,
            patch_size=config.patch_size,
        )
        text = FlaxCLIPTextModel(tc, _do_init=False)
        vision = FlaxCLIPVisionModel(vc, _do_init=False)
        return text, vision

    # ------------------------------------------------------------------
    # Construction
    # ------------------------------------------------------------------

    @classmethod
    def from_config(cls, name: str = "mvdream", seed: int = 0,
                    params_path: Optional[str] = None) -> "MVDreamPipeline":
        import jax
        import jax.numpy as jnp

        config = CONFIGS[name]
        pipe = cls.__new__(cls)
        pipe.__init__(config, params={})
        if params_path:
            pipe.params = pipe._load_params(params_path)
            return pipe

        # Random init of all components (architecture-test mode).
        rng = jax.random.PRNGKey(seed)
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        F = 5 if config.ip_dim else 4
        # Smallest latent that stays even through every down/upsample of
        # the ladder (params are shape-independent of the spatial size;
        # a too-small latent hits a 1x1-vs-2x2 skip-concat mismatch at
        # the deepest level).
        lat = 4 * 2 ** (len(config.channel_mult) - 1)
        x = jnp.zeros((F, lat, lat, 4))
        t = jnp.zeros((F,), jnp.int32)
        ctx = jnp.zeros((F, config.max_tokens, config.context_dim))
        cam = jnp.zeros((F, 16))
        if config.ip_dim:
            n_patch = (config.image_size // config.patch_size) ** 2 + 1
            ip = jnp.zeros((F, n_patch, config.vision_hidden))
            ip_img = jnp.zeros((lat, lat, 4))
            unet_params = jax.jit(
                lambda k, xx: pipe.unet.init(
                    k, xx, t, ctx, F, camera=cam, ip=ip, ip_img=ip_img
                )
            )(k1, x)["params"]
        else:
            unet_params = jax.jit(
                lambda k, xx: pipe.unet.init(k, xx, t, ctx, F, camera=cam)
            )(k1, x)["params"]
        vae_params = jax.jit(
            lambda k: pipe.vae.init(
                k, jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 4, 4, 4))
            )
        )(k2)["params"]
        text_params = pipe._text_model.init_weights(
            k3, (1, config.max_tokens)
        )
        vision_params = pipe._vision_model.init_weights(
            k4, (1, config.image_size, config.image_size, 3)
        )
        pipe.params = {
            "unet": unet_params,
            "vae": vae_params,
            "text_encoder": text_params,
            "image_encoder": vision_params,
        }
        return pipe

    @classmethod
    def from_pretrained(cls, path: Optional[str],
                        name: str = "imagedream") -> "MVDreamPipeline":
        if path is None:
            raise ValueError(
                "no checkpoint path given; published diffusion weights "
                "cannot be downloaded in this zero-egress environment. "
                "Convert them offline with tools/convert_diffusion.py and "
                "pass the directory, or use from_config() for random init."
            )
        import json

        with open(os.path.join(path, "config.json")) as f:
            cfgd = json.load(f)
        config = PipelineConfig(**cfgd)
        pipe = cls.__new__(cls)
        tokenizer = cls._maybe_tokenizer(path, config)
        pipe.__init__(config, params={}, tokenizer=tokenizer)
        pipe.params = pipe._load_params(path)
        return pipe

    @staticmethod
    def _maybe_tokenizer(path: str, config: PipelineConfig):
        vocab = os.path.join(path, "tokenizer")
        if os.path.isdir(vocab):
            from transformers import CLIPTokenizer

            tok = CLIPTokenizer.from_pretrained(vocab)
            return lambda text: np.asarray(
                tok(text, padding="max_length",
                    max_length=config.max_tokens, truncation=True,
                    return_tensors="np").input_ids
            )
        return None

    def _load_params(self, path: str) -> Dict:
        import orbax.checkpoint as ocp

        return ocp.StandardCheckpointer().restore(
            os.path.abspath(os.path.join(path, "params"))
        )

    def save_pretrained(self, path: str):
        import json

        import orbax.checkpoint as ocp

        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump(dataclasses.asdict(self.cfg), f)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(
            os.path.abspath(os.path.join(path, "params")), self.params,
            force=True,
        )
        ckptr.wait_until_finished()

    # ------------------------------------------------------------------
    # Encoders
    # ------------------------------------------------------------------

    def encode_prompt(self, prompt: str, negative_prompt: str = ""):
        """(neg, pos) context embeddings, each [1, L, context_dim]
        (ref: pipeline_mvdream.py:187-337)."""
        if (isinstance(self.tokenizer, HashTokenizer)
                and not self.cfg.allow_hash_tokenizer):
            raise RuntimeError(
                "prompt encoding requested but no real CLIP tokenizer is "
                "available: the checkpoint directory has no tokenizer/ "
                "subdir with the CLIP BPE vocab. The hashing stand-in "
                "would silently produce garbage conditioning with real "
                "weights (ref: pipeline_mvdream.py:187-337 runs true CLIP "
                "BPE). Add the tokenizer files to the checkpoint, or use "
                "a test config with allow_hash_tokenizer=True."
            )
        embs = []
        for text in (negative_prompt, prompt):
            ids = self.tokenizer(text)
            out = self._text_jit(
                self.params["text_encoder"], ids, np.ones_like(ids),
                np.arange(ids.shape[1])[None],
            )
            embs.append(np.asarray(out, np.float32))
        return embs[0], embs[1]

    def encode_image(self, image: np.ndarray):
        """CLIP vision penultimate hidden states for the ip branch
        (ref: pipeline_mvdream.py:402-413). image: [H, W, 3] in [0, 1]."""
        import cv2

        img = cv2.resize(
            image, (self.cfg.image_size, self.cfg.image_size),
            interpolation=cv2.INTER_CUBIC,
        )
        img = (img - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD
        out = self._vision_jit(
            self.params["image_encoder"], img[None].astype(np.float32)
        )
        feats = np.asarray(out, np.float32)
        return np.zeros_like(feats), feats

    def encode_image_latents(self, image: np.ndarray, size: int = 256):
        """VAE-encode the reference image (mode of the posterior)
        (ref: pipeline_mvdream.py:415-429)."""
        import cv2
        import jax.numpy as jnp

        img = cv2.resize(image, (size, size),
                         interpolation=cv2.INTER_LINEAR)
        img = 2.0 * img - 1.0
        mean = self._vae_encode(self.params["vae"],
                                jnp.asarray(img[None], jnp.float32))
        lat = np.asarray(mean, np.float32) * SCALING_FACTOR
        return np.zeros_like(lat), lat

    def decode_latents(self, latents: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        img = self._vae_decode(
            self.params["vae"],
            jnp.asarray(latents, jnp.float32) / SCALING_FACTOR,
        )
        img = np.asarray(img, np.float32)
        return np.clip(img / 2 + 0.5, 0.0, 1.0)

    # ------------------------------------------------------------------
    # Sampling
    # ------------------------------------------------------------------

    def _sample_impl(self, params, latents, ctx, cam, ts, a_t, a_prev,
                     gs, ip, ip_img, *, F: int, cfg_on: bool,
                     use_ip: bool):
        """lax.scan over the DDIM steps (deterministic, eta=0). Step
        arrays (timesteps and their alpha-bar pairs) are precomputed
        host-side; prediction-type math mirrors DDIMScheduler.step."""
        import jax
        import jax.numpy as jnp

        mult = 2 if cfg_on else 1
        eps_pred = self.scheduler.prediction_type

        def body(lat, step):
            t, at, ap = step
            lmi = jnp.concatenate([lat] * mult) if cfg_on else lat
            tvec = jnp.full((F * mult,), t, jnp.float32)
            kwargs = {"camera": cam}
            if use_ip:
                kwargs.update(ip=ip, ip_img=ip_img)
            eps = self.unet.apply({"params": params}, lmi, tvec, ctx, F,
                                  **kwargs)
            if cfg_on:
                uncond, cond = eps[:F], eps[F:]
                eps = uncond + gs * (cond - uncond)
            if eps_pred == "epsilon":
                x0 = (lat - jnp.sqrt(1.0 - at) * eps) / jnp.sqrt(at)
                e = eps
            elif eps_pred == "v_prediction":
                x0 = jnp.sqrt(at) * lat - jnp.sqrt(1.0 - at) * eps
                e = jnp.sqrt(at) * eps + jnp.sqrt(1.0 - at) * lat
            else:
                raise ValueError(eps_pred)
            return jnp.sqrt(ap) * x0 + jnp.sqrt(1.0 - ap) * e, None

        lat, _ = jax.lax.scan(body, latents, (ts, a_t, a_prev))
        return lat

    def __call__(
        self,
        prompt: str = "",
        image: Optional[np.ndarray] = None,
        height: int = 256,
        width: int = 256,
        elevation: float = 0.0,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.0,
        negative_prompt: str = "",
        num_frames: int = 4,
        seed: int = 0,
        output_type: str = "numpy",
        latents: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """Text- or image-conditioned multi-view generation
        (ref: pipeline_mvdream.py:431-558). Returns [F, H, W, 3] numpy
        in [0, 1] (F includes the ip frame for the image path).

        ``latents``: optional [F, H/f, W/f, 4] initial noise override
        (the diffusers prepare_latents hook, ref: pipeline_mvdream.py:
        382-396); used by the composed-pipeline golden test to share the
        oracle's starting noise."""
        import jax
        import jax.numpy as jnp

        cfg_on = guidance_scale > 1.0
        mult = 2 if cfg_on else 1
        self.scheduler.set_timesteps(num_inference_steps)

        use_ip = self.cfg.ip_dim > 0 and image is not None
        F = num_frames + 1 if use_ip else num_frames

        neg, pos = self.encode_prompt(prompt, negative_prompt)
        ctx = np.concatenate([neg] * F + [pos] * F) if cfg_on else (
            np.concatenate([pos] * F)
        )

        camera = get_camera(num_frames, elevation=elevation,
                            extra_view=use_ip)  # [F, 16]
        cam = np.concatenate([camera] * mult)

        if use_ip:
            ip_neg, ip_pos = self.encode_image(image)
            lat_neg, lat_pos = self.encode_image_latents(image, size=height)
            ip = np.concatenate([ip_neg] * F + [ip_pos] * F)
            ip_img = np.concatenate([lat_neg, lat_pos])  # [2, h, w, 4]

        f = 2 ** (len(self.cfg.vae_channels) - 1)  # VAE spatial factor
        h8, w8 = height // f, width // f
        if latents is None:
            rng = jax.random.PRNGKey(seed)
            latents = (
                np.asarray(jax.random.normal(rng, (F, h8, w8, 4)))
                * self.scheduler.init_noise_sigma
            )
        else:
            assert latents.shape == (F, h8, w8, 4), latents.shape

        sch = self.scheduler
        steps = np.asarray(sch.timesteps, np.int64)
        a_t = sch.alphas_cumprod[steps]
        prev = steps - sch.num_train_timesteps // num_inference_steps
        a_prev = np.where(
            prev >= 0, sch.alphas_cumprod[np.maximum(prev, 0)],
            sch.final_alpha_cumprod,
        ).astype(np.float32)
        latents = np.asarray(self._sample_jit(
            self.params["unet"], jnp.asarray(latents), jnp.asarray(ctx),
            jnp.asarray(cam),
            jnp.asarray(steps.astype(np.float32)),
            jnp.asarray(a_t.astype(np.float32)), jnp.asarray(a_prev),
            jnp.float32(guidance_scale),
            jnp.asarray(ip) if use_ip else jnp.zeros((1,), jnp.float32),
            jnp.asarray(ip_img) if use_ip else jnp.zeros((1,),
                                                         jnp.float32),
            F=F, cfg_on=cfg_on, use_ip=use_ip,
        ))

        if output_type == "latent":
            return latents
        return self.decode_latents(latents)
