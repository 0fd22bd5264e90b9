"""Deterministic dup-cap truncation measurement at TRAINING render
configuration (small preset: 65,536 model-produced Gaussians, 256²
supervision views) — the noise-free half of the round-4 dup A/B
(VERDICT r3 weak #4): the learning-curve A/B carries trajectory
variance; this measures the actual render error the dup cap introduces
on the tensors training supervises.

Renders the same scenes with the flatsort backend at dup 16/32/64 and
the exact XLA oracle, reporting per-dup max/mean abs image error vs
the oracle. Two scene families:
  - model: Gaussians from a random-init LGM forward (what early
    training renders),
  - synthetic: the synthetic dataset's supervision scenes.

Run on TPU:  python scripts/measure_dup_truncation.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_tpu"),
)


def main():
    import jax
    import jax.numpy as jnp

    from lgm_tpu.config import get_config
    from lgm_tpu.data.synthetic import make_batch, sample_scene
    from lgm_tpu.models.lgm import LGM
    from lgm_tpu.ops.gsplat.flatsort import render_flatsort
    from lgm_tpu.ops.gsplat.reference import render_reference
    from lgm_tpu.utils import camera

    opt = get_config("small")
    S = opt.output_size
    tan = float(np.tan(0.5 * np.deg2rad(opt.fovy)))

    scenes = {}
    # Model-output Gaussians (random init, like early training).
    batch = make_batch(np.random.default_rng(0), opt, batch_size=1)
    model = LGM(opt)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(batch["input"]))
    scenes["model"] = np.asarray(jax.jit(model.apply)(
        variables, jnp.asarray(batch["input"])))[0]
    # Synthetic supervision scene at the same count.
    scenes["synthetic"] = sample_scene(
        np.random.default_rng(1), opt.num_gaussians)

    poses = [camera.orbit_camera(e, a, opt.cam_radius)
             for e, a in ((0, 30), (20, 140), (-25, 260))]
    results = []
    for name, g in scenes.items():
        gj = jnp.asarray(g)
        for pose in poses:
            cams = camera.build_camera_inputs(
                pose[None], opt.fovy, opt.znear, opt.zfar)
            view = jnp.asarray(cams["cam_view"][0])
            bg = jnp.ones(3)
            ref = jax.jit(lambda gg: render_reference(
                gg, view, S, tan, bg))(gj)
            ref_img = np.clip(np.asarray(ref["image"]), 0, 1)
            for dup in (16, 32, 64):
                out = jax.jit(lambda gg, d=dup: render_flatsort(
                    gg, view, S, tan, bg, dup=d))(gj)
                img = np.clip(np.asarray(out["image"]), 0, 1)
                err = np.abs(img - ref_img)
                results.append({
                    "scene": name, "dup": dup,
                    "max_err": round(float(err.max()), 5),
                    "mean_err": round(float(err.mean()), 7),
                })
    agg = {}
    for r in results:
        k = (r["scene"], r["dup"])
        agg.setdefault(k, []).append(r)
    for (scene, dup), rows in sorted(agg.items()):
        print(json.dumps({
            "scene": scene, "dup": dup,
            "max_err": max(r["max_err"] for r in rows),
            "mean_err": round(float(np.mean(
                [r["mean_err"] for r in rows])), 7),
        }))


if __name__ == "__main__":
    main()
