"""Benchmark harness. Prints one JSON line per metric:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metrics (BASELINE.json names both):
1. rendered frames/s/chip at 512x512 on an LGM-big-scale scene (65,536
   Gaussians) through the flat-sort Pallas rasterizer. ``vs_baseline`` is
   the speedup over the pure-XLA reference compositor on the same chip
   and scene — the reference repo publishes no numbers (BASELINE.md), so
   the in-framework oracle is the measurable baseline.
2. LGM-big train steps/s (batch 2, 16 supervision views @512², full
   loss + AdamW). ``vs_baseline`` is the ratio to the round-2
   hand-measured 1.49 steps/s (BENCHMARKS.md) — again no reference
   number exists. TPU only (the full step does not fit a CI CPU).

Timing protocol: the axon TPU tunnel adds ~30 ms per dispatch and its
block_until_ready is asynchronous, AND XLA hoists loop-invariant bodies
out of fori_loops — so each measurement chains the loop state through the
renderer input (data dependence defeats hoisting), runs ITERS iterations
inside one jit, reads back a scalar, and subtracts the measured empty
round trip.
"""

import json
import os
import time

import numpy as np

# Persistent XLA executable cache: repeat bench runs skip the slow
# remote compile through the TPU tunnel (~minutes for the Pallas graphs).
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 ".jax_cache_tpu"),
)


def _build_scene(n, seed=7):
    rng = np.random.default_rng(seed)
    g = np.zeros((n, 14), np.float32)
    g[:, 0:3] = rng.normal(0, 0.35, (n, 3))
    g[:, 3] = rng.uniform(0.2, 1.0, n)
    g[:, 4:7] = rng.uniform(0.005, 0.03, (n, 3))
    q = rng.normal(0, 1, (n, 4))
    g[:, 7:11] = q / np.linalg.norm(q, axis=1, keepdims=True)
    g[:, 11:14] = rng.uniform(0, 1, (n, 3))
    return g


def _roundtrip_overhead(jax, jnp):
    f = jax.jit(lambda a: a * 2.0)
    x = jnp.ones((8, 8))
    float(jnp.sum(f(x)))
    ts = []
    for _ in range(10):
        t0 = time.time()
        float(jnp.sum(f(x)))
        ts.append(time.time() - t0)
    return min(ts)


def _bench_chained(jax, jnp, render_fn, g, iters, overhead):
    @jax.jit
    def rep(gs):
        def body(i, carry):
            gs, acc = carry
            o = render_fn(gs)
            s = jnp.sum(o["image"][0]) + jnp.sum(o["alpha"][0])
            return (gs + 1e-20 * s, acc + s)

        return jax.lax.fori_loop(0, iters, body, (gs, 0.0))[1]

    float(rep(g))  # compile + warm
    # Best-of-3: the tunnel's round-trip latency varies run-to-run by
    # ±30% and occasionally degrades by integer factors after a broken
    # remote-compile session; min over repeats rejects those outliers.
    ts = []
    for _ in range(3):
        t0 = time.time()
        float(rep(g))
        ts.append(time.time() - t0)
    return max((min(ts) - overhead) / iters, 1e-9)


def main():
    import jax
    import jax.numpy as jnp

    from lgm_tpu.ops.gsplat.flatsort import render_flatsort
    from lgm_tpu.ops.gsplat.reference import render_reference
    from lgm_tpu.utils import camera

    S, N = 512, 65536
    g = jnp.asarray(_build_scene(N))
    pose = camera.orbit_camera(10.0, 30.0, 1.5)
    cams = camera.build_camera_inputs(pose[None], 49.1, 0.5, 2.5)
    view = jnp.asarray(cams["cam_view"][0])
    tan = float(np.tan(0.5 * np.deg2rad(49.1)))
    bg = jnp.ones(3)

    overhead = _roundtrip_overhead(jax, jnp)
    on_tpu = jax.default_backend() in ("tpu", "axon")
    iters = 10 if on_tpu else 2

    if on_tpu:
        fast = lambda gs: render_flatsort(gs, view, S, tan, bg,
                                          tile_h=32, tile_w=32, dup=16)
    else:
        fast = lambda gs: render_reference(gs, view, S, tan, bg)
    t_fast = _bench_chained(jax, jnp, fast, g, iters, overhead)
    t_xla = _bench_chained(
        jax, jnp, lambda gs: render_reference(gs, view, S, tan, bg), g,
        max(iters // 5, 1), overhead,
    )

    print(
        json.dumps(
            {
                "metric": "gsplat render frames/s/chip @512x512 "
                          "(65k splats, LGM-big scale)",
                "value": round(1.0 / t_fast, 2),
                "unit": "frames/s",
                "vs_baseline": round(t_xla / t_fast, 3),
            }
        ),
        flush=True,
    )

    if on_tpu:
        t_step = _bench_train_step(jax, jnp, overhead)
        print(
            json.dumps(
                {
                    "metric": "LGM-big train steps/s/chip (batch 2, "
                              "16 views @512x512, loss+AdamW)",
                    "value": round(1.0 / t_step, 3),
                    "unit": "steps/s",
                    # Ratio to the round-2 hand-measured 1.49 steps/s
                    # (BENCHMARKS.md); no reference number exists.
                    "vs_baseline": round((1.0 / t_step) / 1.49, 3),
                }
            ),
            flush=True,
        )
        # Metric 3 (BASELINE config 3): the full inference pipeline.
        # Guarded so a failure here can never cost the two metrics above.
        try:
            import signal

            signal.alarm(1500)  # hard bail if a remote compile wedges
            t_obj = _bench_inference_pipeline(jax, jnp)
            signal.alarm(0)
            print(
                json.dumps(
                    {
                        "metric": "LGM-big inference objects/min (image -> "
                                  "30-step ImageDream x2 CFG -> LGM -> "
                                  "180-frame orbit video @512)",
                        "value": round(60.0 / t_obj, 2),
                        "unit": "objects/min",
                        # Ratio to the round-3 hand-measured 11.35 s/object
                        # (BENCHMARKS.md inference table); the reference
                        # publishes no number (BASELINE.md).
                        "vs_baseline": round(11.35 / t_obj, 3),
                    }
                ),
                flush=True,
            )
        except Exception as e:  # pragma: no cover - bench robustness
            print(f"# inference metric skipped: {type(e).__name__}: {e}",
                  flush=True)


def _bench_train_step(jax, jnp, overhead, iters=4):
    """One full LGM-big training step (batch 2): loss fwd+bwd + AdamW."""
    from lgm_tpu.config import get_config
    from lgm_tpu.data.synthetic import SyntheticDataset
    from lgm_tpu.models.lgm import LGMWithLoss
    from lgm_tpu.train import TrainState, make_optimizer, train_step

    opt = get_config("big", batch_size=2)
    ds = SyntheticDataset(opt, training=True)
    batch = {k: jnp.asarray(v) for k, v in ds.batch(0).items()
             if k != "scenes"}
    rng = jax.random.PRNGKey(0)
    model = LGMWithLoss(opt, dtype=jnp.bfloat16)
    state = TrainState.create(
        apply_fn=model.apply,
        params=jax.jit(model.init)(rng, batch, jnp.ones(3))["params"],
        tx=make_optimizer(opt),
    )
    key = jax.random.PRNGKey(1)

    # batch as a jit ARGUMENT (closure constants become padded XLA
    # literals; see profile_train.py).
    @jax.jit
    def rep(st, data):
        def body(i, carry):
            st, acc = carry
            st, m = train_step(st, data, jax.random.fold_in(key, i))
            return (st, acc + m["loss"])

        return jax.lax.fori_loop(0, iters, body, (st, 0.0))[1]

    float(rep(state, batch))  # compile + warm
    ts = []
    for _ in range(3):
        t0 = time.time()
        float(rep(state, batch))
        ts.append(time.time() - t0)
    return max((min(ts) - overhead) / iters, 1e-9)


def _bench_inference_pipeline(jax, jnp, steps=30, frames=180):
    """End-to-end serving latency for one object (BASELINE config 3,
    ref: infer.py:26-157): image -> ImageDream multi-view diffusion
    (30 DDIM steps x 2 CFG branches, 5 frames @2562) -> LGM forward ->
    180-frame 360-degree orbit video @512 (render + readback + encode).
    Diffusion weights are random-init at full scale (published ckpts are
    env-blocked; timing is weight-value independent). Each stage is
    warmed (compile is cached across runs via JAX_COMPILATION_CACHE_DIR),
    then timed once; returns seconds/object."""
    import tempfile

    import cv2

    from transformers import CLIPTokenizer

    from lgm_tpu.config import get_config
    from lgm_tpu.diffusion import MVDreamPipeline
    from lgm_tpu.infer import build_input, render_orbit_video
    from lgm_tpu.models.lgm import LGM

    opt = get_config("big")
    pipe = MVDreamPipeline.from_config("imagedream", seed=0)
    fixture = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "tests", "fixtures", "clip_tokenizer")
    tok = CLIPTokenizer.from_pretrained(fixture)
    pipe.tokenizer = lambda text: np.asarray(
        tok(text, padding="max_length", max_length=pipe.cfg.max_tokens,
            truncation=True, return_tensors="np").input_ids)

    img = np.random.default_rng(0).uniform(0, 1, (256, 256, 3)).astype(
        np.float32)

    def one_object(timed):
        t0 = time.time()
        mv = pipe(image=img, prompt="", num_inference_steps=steps,
                  guidance_scale=5.0)
        mv4 = np.stack([
            cv2.resize(np.asarray(m, np.float32),
                       (opt.input_size, opt.input_size))
            for m in np.asarray(mv)[[1, 2, 3, 0]][:4]
        ])
        inp = jnp.asarray(build_input(mv4, opt))
        g = jax.block_until_ready(fwd(variables, inp))
        out = os.path.join(tempfile.mkdtemp(), "orbit.mp4")
        render_orbit_video(np.asarray(g)[0], opt, out, n_frames=frames,
                           chunk=30)
        return time.time() - t0

    model = LGM(opt)
    inp0 = jnp.asarray(build_input(
        np.zeros((4, opt.input_size, opt.input_size, 3), np.float32), opt))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), inp0)
    fwd = jax.jit(lambda v, x: model.apply(v, x))
    one_object(False)   # warm every stage's compile
    return one_object(True)


if __name__ == "__main__":
    main()
