"""Generate an on-disk LVIS-format dataset for long-horizon disk training.

Scales the test fixture generator (tests/test_train_disk.py) to real
training size: N synthetic Gaussian scenes rendered by our own XLA
rasterizer to per-view RGBA PNGs + orbit-metadata .npy files in the
reference's LVIS layout (ref: core/provider_lvis.py:75-218 — NNN.png +
NNN.npy {elevation, azimuth, radius} per view, scenes under a split
dir). Used by the round-5 2k-step disk-training run (VERDICT r4 ask #8:
demonstrate the reference's recipe shape beyond smoke length).

Run (CPU):  python scripts/gen_disk_dataset.py --out /tmp/lvis_2k \
                --scenes 64 --views 14 --size 256
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--scenes", type=int, default=64)
    p.add_argument("--views", type=int, default=14)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--gaussians", type=int, default=128)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import cv2
    import jax.numpy as jnp

    from lgm_tpu.data.synthetic import sample_scene
    from lgm_tpu.ops.gsplat import render_views
    from lgm_tpu.utils import camera

    tan = float(np.tan(0.5 * np.deg2rad(49.1)))
    render = jax.jit(lambda g, v: render_views(
        g[None], v[None], args.size, tan, backend="xla"))

    split = os.path.join(args.out, "00000-09999")
    os.makedirs(split, exist_ok=True)
    for s in range(args.scenes):
        rng = np.random.default_rng(args.seed * 100_000 + s)
        scene = sample_scene(rng, args.gaussians)
        els = rng.uniform(-30, 30, args.views)
        azs = rng.uniform(0, 360, args.views)
        poses = np.stack(
            [camera.orbit_camera(e, a, 1.5) for e, a in zip(els, azs)]
        )
        cams = camera.build_camera_inputs(poses, 49.1, 0.5, 2.5)
        out = render(jnp.asarray(scene), jnp.asarray(cams["cam_view"]))
        rgb = np.asarray(out["image"][0])
        alpha = np.clip(np.asarray(out["alpha"][0, ..., 0]), 0, 1)
        scene_dir = os.path.join(split, f"scene{s:04d}")
        os.makedirs(scene_dir, exist_ok=True)
        for v in range(args.views):
            rgba = np.concatenate(
                [rgb[v][..., ::-1], alpha[v][..., None]], axis=-1
            )
            cv2.imwrite(os.path.join(scene_dir, f"{v:03d}.png"),
                        (rgba * 255).astype(np.uint8))
            # Stored elevation is negated on load (reference quirk,
            # provider_lvis.py:132-136 — mirrored by our provider).
            np.save(os.path.join(scene_dir, f"{v:03d}.npy"),
                    {"elevation": -els[v], "azimuth": azs[v],
                     "radius": 1.5})
        if (s + 1) % 8 == 0:
            print(f"{s + 1}/{args.scenes} scenes")
    print(f"wrote {args.scenes} scenes x {args.views} views "
          f"@{args.size} to {split}")


if __name__ == "__main__":
    main()
