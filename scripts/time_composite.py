"""Quick composite fwd / fwd+bwd kernel timer (bench scene).

A trimmed roofline_v4 --measure for fast A/B during kernel work:
    python scripts/time_composite.py
"""

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

import jax
import jax.numpy as jnp

from lgm_tpu.ops.gsplat import flatsort
from lgm_tpu.utils import camera
from scripts.roofline_v4 import build_scene, DUP, MPT, S, TILE


def main():
    g = jnp.asarray(build_scene())
    pose = camera.orbit_camera(10.0, 30.0, 1.5)
    cams = camera.build_camera_inputs(pose[None], 49.1, 0.5, 2.5)
    view = jnp.asarray(cams["cam_view"][0])
    tan = float(np.tan(0.5 * np.deg2rad(49.1)))
    params, counts = jax.jit(
        lambda gg: flatsort._prepare_view(
            gg, view, S, tan, 1.0, TILE, TILE, DUP, MPT, False)
    )(g)
    pfs = flatsort._pf_split_t(TILE, TILE)
    tiles_x = S // TILE

    def roundtrip():
        f = jax.jit(lambda a: a * 2.0)
        x = jnp.ones((8, 8))
        float(jnp.sum(f(x)))
        ts = []
        for _ in range(8):
            t0 = time.time()
            float(jnp.sum(f(x)))
            ts.append(time.time() - t0)
        return min(ts)

    overhead = roundtrip()

    def chained(fn, a0, iters=20):
        @jax.jit
        def rep(a):
            def body(i, carry):
                a, acc = carry
                s = fn(a)
                return (a + 1e-20 * s, acc + s)
            return jax.lax.fori_loop(0, iters, body, (a, 0.0))[1]

        float(rep(a0))
        ts = []
        for _ in range(3):
            t0 = time.time()
            float(rep(a0))
            ts.append(time.time() - t0)
        return max((min(ts) - overhead) / iters, 1e-9)

    fwd = chained(
        lambda p: jnp.sum(flatsort._composite_flat(
            p, counts, pfs, False, tiles_x, TILE, TILE, False)[:, 0:5]),
        params)

    def fwdbwd(p):
        def loss(x):
            o = flatsort._composite_flat(x, counts, pfs, False, tiles_x,
                                         TILE, TILE, False)
            return jnp.sum(o[:, 0:5])
        l, gr = jax.value_and_grad(loss)(p)
        return l + jnp.sum(gr)

    fb = chained(fwdbwd, params)
    print(f"composite fwd      {fwd * 1e3:7.3f} ms/view")
    print(f"composite fwd+bwd  {fb * 1e3:7.3f} ms/view  "
          f"(bwd ~{(fb - fwd) * 1e3:.3f})")


if __name__ == "__main__":
    main()
