"""Multi-view diffusion U-Net finetuning (epsilon-prediction DDPM loss).

The reference repo's readme points at diffusion-finetune entry points that
do not exist in the snapshot (ref: readme.md:35,50,70), yet its pod-scale
recipe (BASELINE.json config 5) pairs LGM training with a multi-view
diffusion U-Net finetune. This module is that trainer, TPU-native:

  - frozen VAE + CLIP encoders produce latents/context per batch (jitted,
    out of the grad path; posterior *sampled*, not its mode);
  - one timestep t per scene shared across its F frames (the multi-view
    consistency training choice — all frames of a scene carry the same
    noise level, matching joint cross-view denoising at sampling time,
    ref: mvdream/pipeline_mvdream.py:505-536);
  - classifier-free-guidance dropout: with prob ``cond_drop`` a scene's
    text context becomes the empty-prompt embedding (and, on the
    ImageDream path, its image features/latent become zeros — the same
    null conditioning the sampler's negative branch uses,
    ref: pipeline_mvdream.py:402-429);
  - ImageDream (ip_dim>0): frame 0 doubles as the reference image; the
    U-Net appends it as a clean extra frame (mv_unet.py ip_img path) and
    the loss covers only the F noisy content frames;
  - AdamW (finetune lr 1e-5 default) + linear warmup, global-norm clip,
    bf16 U-Net compute with f32 params, grads psum'd by XLA over the dp
    mesh axis; full-state orbax checkpoints; ``--export`` writes a
    pipeline directory loadable by MVDreamPipeline.from_pretrained;
  - EMA shadow of the U-Net weights (``--ema-decay``, diffusers-style
    ramped decay) updated inside the jitted step; checkpoints carry it
    and ``--export`` writes the EMA weights (what one samples from).

Run:  python -m lgm_tpu.diffusion.train --pipeline mvdream \
          --ckpt <converted-dir> --workspace ws_mvft --total-steps 10000
"""

from __future__ import annotations

import argparse
import functools
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from lgm_tpu.diffusion.pipeline import MVDreamPipeline
from lgm_tpu.diffusion.vae import SCALING_FACTOR
from lgm_tpu.parallel.mesh import make_mesh


def make_optimizer(lr: float, warmup: int, total: int, clip: float,
                   weight_decay: float = 0.01):
    schedule = optax.join_schedules(
        [optax.linear_schedule(0.0, lr, max(warmup, 1)),
         optax.constant_schedule(lr)],
        [max(warmup, 1)],
    )
    del total
    return optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adamw(schedule, b1=0.9, b2=0.999,
                    weight_decay=weight_decay, mu_dtype=jnp.bfloat16),
    )


def diffusion_loss(unet, params, batch: Dict, alphas_cumprod: jnp.ndarray,
                   ip: bool):
    """Epsilon-MSE over the noisy content frames.

    batch arrays: latents/noise [B, F, h, w, 4], t [B] int32,
    context [B, L, C], camera [B, Ft, 16]; ip path adds
    ip_feats [B, Np, Dv] and ip_img [B, h, w, 4]."""
    lat = batch["latents"]
    noise = batch["noise"]
    B, F = lat.shape[:2]
    a = jnp.take(alphas_cumprod, batch["t"])[:, None, None, None, None]
    x_t = jnp.sqrt(a) * lat + jnp.sqrt(1.0 - a) * noise

    Ft = F + 1 if ip else F
    if ip:
        # Placeholder extra frame; the U-Net substitutes the clean
        # reference latent (mv_unet.py ip_img path).
        x_t = jnp.concatenate([x_t, jnp.zeros_like(x_t[:, :1])], axis=1)
    x_flat = x_t.reshape((B * Ft,) + x_t.shape[2:])
    t_flat = jnp.repeat(batch["t"], Ft)
    ctx = jnp.repeat(batch["context"], Ft, axis=0)
    cam = batch["camera"].reshape(B * Ft, 16)
    kwargs = {}
    if ip:
        kwargs["ip"] = jnp.repeat(batch["ip_feats"], Ft, axis=0)
        kwargs["ip_img"] = batch["ip_img"]
    eps = unet.apply({"params": params}, x_flat, t_flat, ctx, Ft,
                     camera=cam, **kwargs)
    eps = eps.reshape((B, Ft) + eps.shape[1:])[:, :F]
    err = (eps.astype(jnp.float32) - noise.astype(jnp.float32)) ** 2
    return jnp.mean(err)


def make_train_step(unet, tx, alphas_cumprod: np.ndarray, ip: bool,
                    ema_decay: float = 0.0):
    table = jnp.asarray(alphas_cumprod, jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def step(params, opt_state, ema, batch, step_idx):
        loss, grads = jax.value_and_grad(
            lambda p: diffusion_loss(unet, p, batch, table, ip)
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if ema_decay > 0.0:
            # Warmed-up decay (the diffusers EMAModel ramp): early steps
            # track the raw weights, the horizon extends toward
            # ema_decay as training progresses.
            d = jnp.minimum(ema_decay,
                            (1.0 + step_idx) / (10.0 + step_idx))
            ema = jax.tree.map(
                lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
                ema, params,
            )
        return params, opt_state, ema, {
            "loss": loss, "gnorm": optax.global_norm(grads)
        }

    return step


class DiffusionTrainer:
    """Host-side orchestration: encoding, sharding, stepping, ckpts."""

    def __init__(self, pipe: MVDreamPipeline, lr: float = 1e-5,
                 warmup: int = 100, total_steps: int = 10000,
                 grad_clip: float = 1.0, cond_drop: float = 0.1,
                 seed: int = 0, num_devices: Optional[int] = None,
                 ema_decay: float = 0.9999):
        self.pipe = pipe
        self.ip = pipe.cfg.ip_dim > 0
        self.cond_drop = cond_drop
        self.total_steps = total_steps
        self.ema_decay = ema_decay
        self.rng = np.random.default_rng(seed)
        n = num_devices or jax.device_count()
        self.mesh = make_mesh((n, 1), devices=jax.devices()[:n])
        self.tx = make_optimizer(lr, warmup, total_steps, grad_clip)
        self.params = jax.device_put(
            pipe.params["unet"], NamedSharding(self.mesh, P())
        )
        self.opt_state = jax.jit(self.tx.init)(self.params)
        # EMA shadow of the U-Net weights (ema_decay=0 disables; the
        # exported pipeline then carries the raw weights instead).
        self.ema_params = (
            jax.tree.map(jnp.array, self.params) if ema_decay > 0.0
            else None
        )
        self.step_fn = make_train_step(
            pipe.unet, self.tx, pipe.scheduler.alphas_cumprod, self.ip,
            ema_decay=ema_decay,
        )
        self._prompt_cache: Dict[str, np.ndarray] = {}
        # Null conditioning for CFG dropout (the sampler's negative branch).
        self._null_ctx = self._encode_prompt("")
        self._vae_sample = jax.jit(self._vae_sample_impl)
        self.step = 0

    # -- frozen encoders ------------------------------------------------
    def _encode_prompt(self, text: str) -> np.ndarray:
        if text not in self._prompt_cache:
            _, pos = self.pipe.encode_prompt(text)
            self._prompt_cache[text] = pos[0]
        return self._prompt_cache[text]

    def _vae_sample_impl(self, vae_params, images, eps):
        """images [N, S, S, 3] in [0,1] -> sampled scaled latents."""
        x = images.astype(jnp.float32) * 2.0 - 1.0
        mean, logvar = self.pipe.vae.apply(
            {"params": vae_params}, x, method=self.pipe.vae.encode
        )
        z = mean + jnp.exp(0.5 * logvar) * eps
        return (z * SCALING_FACTOR).astype(jnp.float32)

    # -- one step -------------------------------------------------------
    def prepare_batch(self, data: Dict) -> Dict:
        """Host batch {images [B,F,S,S,3], camera [B,F,16], prompts}
        -> device arrays for the jitted step."""
        images = np.asarray(data["images"], np.float32)
        B, F = images.shape[:2]
        dp = self.mesh.shape["dp"]
        assert B % dp == 0, (
            f"batch of {B} scenes is not divisible by the dp axis ({dp}); "
            f"pass a multiple or construct the trainer with num_devices"
        )
        flat = images.reshape((B * F,) + images.shape[2:])
        # VAE downsample factor: one 2x per extra encoder block (8 for the
        # real SD VAE, 2 for the tiny test config).
        ds = 2 ** (len(self.pipe.cfg.vae_channels) - 1)
        eps_shape = (B * F, images.shape[2] // ds, images.shape[3] // ds, 4)
        lat = np.asarray(self._vae_sample(
            self.pipe.params["vae"], jnp.asarray(flat),
            jnp.asarray(self.rng.standard_normal(eps_shape), jnp.float32),
        ))
        lat = lat.reshape((B, F) + lat.shape[1:])

        drop = self.rng.random(B) < self.cond_drop
        ctx = np.stack([
            self._null_ctx if drop[i] else self._encode_prompt(p)
            for i, p in enumerate(data["prompts"])
        ])
        cam = np.asarray(data["camera"], np.float32)
        batch = {
            "latents": lat,
            "noise": self.rng.standard_normal(lat.shape).astype(np.float32),
            "t": self.rng.integers(
                0, self.pipe.scheduler.num_train_timesteps, B
            ).astype(np.int32),
            "context": ctx.astype(np.float32),
        }
        if self.ip:
            # Frame 0 is the reference image: CLIP features + clean latent;
            # a zero conditioning row for the extra frame (get_camera
            # extra_view). Dropped scenes get the sampler's null (zeros).
            feats = np.stack([
                np.zeros_like(self.pipe.encode_image(images[i, 0])[1][0])
                if drop[i] else self.pipe.encode_image(images[i, 0])[1][0]
                for i in range(B)
            ])
            ip_img = lat[:, 0] / SCALING_FACTOR
            ip_img = np.where(drop[:, None, None, None], 0.0, ip_img)
            batch["ip_feats"] = feats.astype(np.float32)
            batch["ip_img"] = ip_img.astype(np.float32)
            cam = np.concatenate([cam, np.zeros_like(cam[:, :1])], axis=1)
        batch["camera"] = cam
        sh = NamedSharding(self.mesh, P("dp"))
        return {k: jax.device_put(v, sh) for k, v in batch.items()}

    def train_step(self, data: Dict) -> Dict[str, float]:
        batch = self.prepare_batch(data)
        ema = self.ema_params if self.ema_params is not None else {}
        self.params, self.opt_state, ema, metrics = self.step_fn(
            self.params, self.opt_state, ema, batch,
            jnp.float32(self.step),
        )
        if self.ema_params is not None:
            self.ema_params = ema
        self.step += 1
        return metrics

    # -- persistence ----------------------------------------------------
    def save(self, workspace: str) -> str:
        import orbax.checkpoint as ocp

        path = os.path.abspath(
            os.path.join(workspace, f"dckpt_{self.step}")
        )
        state = {"unet": jax.device_get(self.params),
                 "opt_state": jax.device_get(self.opt_state),
                 "step": self.step}
        if self.ema_params is not None:
            state["ema"] = jax.device_get(self.ema_params)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, state, force=True)
        ckptr.wait_until_finished()
        return path

    def restore(self, path: str):
        import orbax.checkpoint as ocp

        target = {"unet": jax.device_get(self.params),
                  "opt_state": jax.device_get(self.opt_state), "step": 0}
        if self.ema_params is not None:
            target["ema"] = jax.device_get(self.ema_params)
        restored = ocp.StandardCheckpointer().restore(
            os.path.abspath(path), target
        )
        self.params = jax.device_put(
            restored["unet"], NamedSharding(self.mesh, P())
        )
        self.opt_state = jax.device_put(
            restored["opt_state"], NamedSharding(self.mesh, P())
        )
        if self.ema_params is not None and "ema" in restored:
            self.ema_params = jax.device_put(
                restored["ema"], NamedSharding(self.mesh, P())
            )
        self.step = int(restored["step"])

    def export(self, path: str, use_ema: bool = True):
        """Write a pipeline checkpoint dir with the finetuned U-Net
        (the EMA shadow by default — the weights one samples from)."""
        self.pipe.params = dict(self.pipe.params)
        src = (self.ema_params
               if use_ema and self.ema_params is not None else self.params)
        self.pipe.params["unet"] = jax.device_get(src)
        self.pipe.save_pretrained(path)


def make_dataset(args):
    from lgm_tpu.diffusion.data import LVISMVData, SyntheticMVData

    if args.data_mode == "synthetic":
        return SyntheticMVData(num_frames=args.num_frames,
                               image_size=args.image_size)
    return LVISMVData(args.data_path, num_frames=args.num_frames,
                      image_size=args.image_size)


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Finetune the multi-view diffusion U-Net")
    ap.add_argument("--pipeline", default="mvdream",
                    help="config name (mvdream/imagedream/tiny-test)")
    ap.add_argument("--ckpt", default=None,
                    help="converted pipeline dir (tools/convert_diffusion)")
    ap.add_argument("--workspace", default="workspace_diffusion")
    ap.add_argument("--data-mode", default="synthetic",
                    choices=["synthetic", "lvis"])
    ap.add_argument("--data-path", default=None)
    ap.add_argument("--batch-size", type=int, default=4,
                    help="scenes per step per host")
    ap.add_argument("--num-frames", type=int, default=4)
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--lr", type=float, default=1e-5)
    ap.add_argument("--warmup-steps", type=int, default=100)
    ap.add_argument("--total-steps", type=int, default=10000)
    ap.add_argument("--cond-drop", type=float, default=0.1)
    ap.add_argument("--grad-clip", type=float, default=1.0)
    ap.add_argument("--ema-decay", type=float, default=0.9999,
                    help="EMA decay for the exported weights (0 disables)")
    ap.add_argument("--save-every", type=int, default=1000)
    ap.add_argument("--resume", default=None)
    ap.add_argument("--export", default=None,
                    help="write a pipeline dir at the end")
    args = ap.parse_args(argv)

    if os.environ.get("LGM_TPU_MULTIHOST", "") == "1":
        jax.distributed.initialize()
    is_lead = jax.process_index() == 0
    os.makedirs(args.workspace, exist_ok=True)

    if args.ckpt:
        pipe = MVDreamPipeline.from_pretrained(args.ckpt,
                                               name=args.pipeline)
    else:
        pipe = MVDreamPipeline.from_config(args.pipeline)
    trainer = DiffusionTrainer(
        pipe, lr=args.lr, warmup=args.warmup_steps,
        total_steps=args.total_steps, grad_clip=args.grad_clip,
        cond_drop=args.cond_drop, ema_decay=args.ema_decay,
    )
    if args.resume:
        trainer.restore(args.resume)

    from lgm_tpu.utils.logging import MetricLogger

    logger = MetricLogger(args.workspace, tensorboard=is_lead)
    ds = make_dataset(args)
    t_last = time.time()
    while trainer.step < args.total_steps:
        data = ds.batch(trainer.step, args.batch_size)
        metrics = trainer.train_step(data)
        s = trainer.step
        if s % 50 == 0 or s == 1:
            m = {k: float(v) for k, v in metrics.items()}
            dt = time.time() - t_last
            t_last = time.time()
            if is_lead:
                logger.log(s, m, prefix="diffusion")
                print(f"step {s}: loss {m['loss']:.4f} ({dt:.1f}s/50it)")
        if s % args.save_every == 0 or s == args.total_steps:
            path = trainer.save(args.workspace)
            if is_lead:
                print(f"saved {path}")
    if args.export:
        trainer.export(args.export)
        if is_lead:
            print(f"exported pipeline to {args.export}")
    logger.close()


if __name__ == "__main__":
    main()
