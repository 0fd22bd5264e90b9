"""Diffusion front-end: UNet/VAE/DDIM/pipeline architecture tests on the
tiny config (real-size weights are converted offline; no egress here)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lgm_tpu.diffusion.ddim import DDIMScheduler
from lgm_tpu.diffusion.mv_unet import (MultiViewUNetModel, get_camera,
                                       timestep_embedding)


def test_get_camera_shapes():
    cams = get_camera(4)
    assert cams.shape == (4, 16)
    cams5 = get_camera(4, extra_view=True)
    assert cams5.shape == (5, 16)
    np.testing.assert_array_equal(cams5[4], np.zeros(16))
    # Poses are orthonormal rotations + translation in the flattened 4x4.
    p0 = cams[0].reshape(4, 4)
    np.testing.assert_allclose(p0[:3, :3] @ p0[:3, :3].T, np.eye(3),
                               atol=1e-5)


def test_timestep_embedding():
    emb = timestep_embedding(jnp.asarray([0.0, 10.0, 999.0]), 64)
    assert emb.shape == (3, 64)
    e = np.asarray(emb)
    # t=0: cos half = 1, sin half = 0 (cos-first ordering).
    np.testing.assert_allclose(e[0, :32], 1.0, atol=1e-6)
    np.testing.assert_allclose(e[0, 32:], 0.0, atol=1e-6)


def test_ddim_schedule_and_perfect_denoise():
    sch = DDIMScheduler()
    sch.set_timesteps(10)
    assert len(sch.timesteps) == 10
    assert sch.timesteps[0] > sch.timesteps[-1]
    assert sch.timesteps[-1] == 1  # leading spacing + offset 1

    # If the model predicts exactly the noise that was added, one step
    # toward t=0 must reduce distance to the clean sample.
    rng = np.random.default_rng(0)
    x0 = rng.normal(0, 1, (1, 4, 4, 4)).astype(np.float32)
    noise = rng.normal(0, 1, x0.shape).astype(np.float32)
    t = int(sch.timesteps[5])
    xt = sch.add_noise(x0, noise, t)
    prev = np.asarray(sch.step(jnp.asarray(noise), t, jnp.asarray(xt)))
    t_prev = t - 1000 // 10
    expected = sch.add_noise(x0, noise, t_prev)
    np.testing.assert_allclose(prev, expected, atol=1e-4)


def test_mv_unet_tiny_forward():
    F, H = 4, 8
    net = MultiViewUNetModel(
        model_channels=32, channel_mult=(1, 2), attention_resolutions=(1, 2),
        num_res_blocks=1, num_head_channels=16, context_dim=32,
    )
    x = jnp.zeros((F, H, H, 4))
    t = jnp.zeros((F,))
    ctx = jnp.zeros((F, 7, 32))
    cam = jnp.zeros((F, 16))
    params = net.init(jax.random.PRNGKey(0), x, t, ctx, F, camera=cam)
    out = net.apply(params, x, t, ctx, F, camera=cam)
    assert out.shape == (F, H, H, 4)
    # Zero-init output conv: output must be exactly zero at init.
    np.testing.assert_array_equal(np.asarray(out), 0.0)
    # Non-trivial input flows: perturb a mid-layer by seeding x.
    out2 = net.apply(
        params, x + 1.0, t + 500.0, ctx + 0.1, F, camera=cam + 1.0
    )
    assert out2.shape == (F, H, H, 4)


def test_mv_unet_ip_branch():
    F, H = 3, 8
    net = MultiViewUNetModel(
        model_channels=32, channel_mult=(1, 2), attention_resolutions=(1, 2),
        num_res_blocks=1, num_head_channels=16, context_dim=32, ip_dim=4,
    )
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (2 * F, H, H, 4))
    t = jnp.full((2 * F,), 100.0)
    ctx = jax.random.normal(rng, (2 * F, 7, 32))
    cam = jax.random.normal(rng, (2 * F, 16))
    ip = jax.random.normal(rng, (2 * F, 5, 48))
    ip_img = jax.random.normal(rng, (2, H, H, 4))
    params = net.init(jax.random.PRNGKey(0), x, t, ctx, F, camera=cam,
                      ip=ip, ip_img=ip_img)
    out = net.apply(params, x, t, ctx, F, camera=cam, ip=ip, ip_img=ip_img)
    assert out.shape == (2 * F, H, H, 4)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("name,image", [("tiny-test", False),
                                        ("tiny-test-ip", True),
                                        ("tiny-test-deep", False)])
def test_pipeline_end_to_end_tiny(name, image):
    from lgm_tpu.diffusion.pipeline import MVDreamPipeline

    pipe = MVDreamPipeline.from_config(name, seed=0)
    img = (np.random.default_rng(0).uniform(0, 1, (32, 32, 3))
           .astype(np.float32) if image else None)
    out = pipe(
        prompt="a chair", image=img, height=32, width=32,
        num_inference_steps=2, guidance_scale=5.0, num_frames=4,
    )
    F = 5 if image else 4
    assert out.shape == (F, 32, 32, 3)
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_pipeline_save_load_roundtrip(tmp_path):
    from lgm_tpu.diffusion.pipeline import MVDreamPipeline

    pipe = MVDreamPipeline.from_config("tiny-test", seed=3)
    pipe.save_pretrained(str(tmp_path / "ckpt"))
    pipe2 = MVDreamPipeline.from_pretrained(str(tmp_path / "ckpt"))
    a = pipe(prompt="x", height=32, width=32, num_inference_steps=1,
             guidance_scale=1.0, output_type="latent")
    b = pipe2(prompt="x", height=32, width=32, num_inference_steps=1,
              guidance_scale=1.0, output_type="latent")
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_jitted_sample_loop_matches_eager():
    """The in-graph lax.scan DDIM loop must reproduce the step-by-step
    eager loop (UNet jit + host scheduler.step) exactly (f32 on CPU)."""
    from lgm_tpu.diffusion.pipeline import MVDreamPipeline

    pipe = MVDreamPipeline.from_config("tiny-test")
    pipe.scheduler.set_timesteps(4)
    F, h8 = 4, 8
    rng = np.random.default_rng(0)
    latents0 = rng.standard_normal((F, h8, h8, 4)).astype(np.float32)
    ctx = rng.standard_normal(
        (2 * F, pipe.cfg.max_tokens, pipe.cfg.context_dim)
    ).astype(np.float32)
    from lgm_tpu.diffusion.mv_unet import get_camera
    cam = np.concatenate([get_camera(F)] * 2).astype(np.float32)
    gs = 5.0

    # Eager reference: per-step jitted UNet + host DDIM update.
    latents = latents0.copy()
    for t in pipe.scheduler.timesteps:
        lmi = jnp.asarray(np.concatenate([latents] * 2))
        ts = jnp.full((2 * F,), float(t))
        noise = np.asarray(pipe._unet_step(
            pipe.params["unet"], lmi, ts, jnp.asarray(ctx),
            jnp.asarray(cam), F))
        noise = noise[:F] + gs * (noise[F:] - noise[:F])
        latents = np.asarray(pipe.scheduler.step(
            jnp.asarray(noise), int(t), jnp.asarray(latents)))

    # Jitted scan loop.
    sch = pipe.scheduler
    steps = np.asarray(sch.timesteps, np.int64)
    a_t = sch.alphas_cumprod[steps].astype(np.float32)
    prev = steps - sch.num_train_timesteps // 4
    a_prev = np.where(prev >= 0, sch.alphas_cumprod[np.maximum(prev, 0)],
                      sch.final_alpha_cumprod).astype(np.float32)
    out = np.asarray(pipe._sample_jit(
        pipe.params["unet"], jnp.asarray(latents0), jnp.asarray(ctx),
        jnp.asarray(cam), jnp.asarray(steps.astype(np.float32)),
        jnp.asarray(a_t), jnp.asarray(a_prev), jnp.float32(gs),
        jnp.zeros((1,), jnp.float32), jnp.zeros((1,), jnp.float32),
        F=F, cfg_on=True, use_ip=False,
    ))
    np.testing.assert_allclose(out, latents, atol=2e-4, rtol=2e-4)
