"""Breakdown profiler: where does an LGM-big train step spend its time?

Times each stage on the current backend (TPU under axon, CPU otherwise)
with the same chained-dependence protocol as bench.py (defeats loop
hoisting; subtracts the measured dispatch round trip). Run:

    python scripts/profile_step.py [--stages unet,raster,...]
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


def _roundtrip(jax, jnp):
    f = jax.jit(lambda a: a * 2.0)
    x = jnp.ones((8, 8))
    float(jnp.sum(f(x)))
    ts = []
    for _ in range(8):
        t0 = time.time()
        float(jnp.sum(f(x)))
        ts.append(time.time() - t0)
    return min(ts)


def chained(jax, jnp, fn, args, iters, overhead, reduce_fn):
    """fn(*args) -> pytree; chains a scalar back into args[0]."""

    @jax.jit
    def rep(a0):
        def body(i, carry):
            a0, acc = carry
            out = fn(a0, *args[1:])
            s = reduce_fn(out)
            return (a0 + 1e-20 * s, acc + s)

        return jax.lax.fori_loop(0, iters, body, (a0, 0.0))[1]

    float(rep(args[0]))
    ts = []
    for _ in range(3):
        t0 = time.time()
        float(rep(args[0]))
        ts.append(time.time() - t0)
    return max((min(ts) - overhead) / iters, 1e-9)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--n", type=int, default=65536)
    p.add_argument("--size", type=int, default=512)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from lgm_tpu.ops.gsplat import flatsort, projection
    from lgm_tpu.utils import camera

    S, N = args.size, args.n
    rng = np.random.default_rng(7)
    g = np.zeros((N, 14), np.float32)
    g[:, 0:3] = rng.normal(0, 0.35, (N, 3))
    g[:, 3] = rng.uniform(0.2, 1.0, N)
    g[:, 4:7] = rng.uniform(0.005, 0.03, (N, 3))
    q = rng.normal(0, 1, (N, 4))
    g[:, 7:11] = q / np.linalg.norm(q, axis=1, keepdims=True)
    g[:, 11:14] = rng.uniform(0, 1, N * 3).reshape(N, 3)
    g = jnp.asarray(g)

    pose = camera.orbit_camera(10.0, 30.0, 1.5)
    cams = camera.build_camera_inputs(pose[None], 49.1, 0.5, 2.5)
    view = jnp.asarray(cams["cam_view"][0])
    tan = float(np.tan(0.5 * np.deg2rad(49.1)))
    bg = jnp.ones(3)
    overhead = _roundtrip(jax, jnp)
    it = args.iters
    print(f"backend={jax.default_backend()} overhead={overhead*1e3:.2f}ms")

    results = {}

    # 1. projection only
    t = chained(
        jax, jnp,
        lambda gg: projection.project_gaussians(gg, view, S, tan),
        (g,), it * 4, overhead,
        lambda o: jnp.sum(o.mean2d) + jnp.sum(o.conic),
    )
    results["projection fwd"] = t

    # 2. projection + binning
    def binned(gg):
        proj = projection.project_gaussians(gg, view, S, tan)
        meta = flatsort._flat_binning(proj, S // 32, S // 32, 32, 32, 16)
        return meta

    t = chained(jax, jnp, binned, (g,), it, overhead,
                lambda m: jnp.sum(m.counts).astype(jnp.float32))
    results["projection+binning fwd"] = t

    # 3. full render fwd
    def fwd(gg):
        return flatsort.render_flatsort(gg, view, S, tan, bg,
                                        tile_h=32, tile_w=32, dup=16)

    t = chained(jax, jnp, fwd, (g,), it, overhead,
                lambda o: jnp.sum(o["image"][0]) + jnp.sum(o["alpha"][0]))
    results["render fwd"] = t

    # 4. full render fwd+bwd
    def fwdbwd(gg):
        def loss(x):
            o = flatsort.render_flatsort(x, view, S, tan, bg,
                                         tile_h=32, tile_w=32, dup=16)
            return jnp.sum(o["image"]) + jnp.sum(o["alpha"])

        l, grad = jax.value_and_grad(loss)(gg)
        return l + jnp.sum(grad)

    t = chained(jax, jnp, lambda gg: fwdbwd(gg), (g,), it, overhead,
                lambda s: s)
    results["render fwd+bwd"] = t

    # 5. composite kernel alone (fwd), on realistic binned params
    import functools

    tiles_x = S // 32

    @jax.jit
    def build_inputs(gg):
        # v4 layout: the kernel input is the raw-attr gather output
        # (coefficients are built in-kernel from the tile origin).
        proj = projection.project_gaussians(gg, view, S, tan)
        meta = flatsort._flat_binning(proj, S // 32, S // 32, 32, 32, 16)
        attrs = jnp.concatenate(
            [proj.mean2d, proj.conic, proj.opacity[:, None], proj.color],
            axis=1,
        )
        attrs = attrs[meta.order]
        attrs = jnp.concatenate([attrs, jnp.zeros_like(attrs[:1])], axis=0)
        a = attrs[meta.flat_rank]
        T = (S // 32) ** 2
        MPT = 1024
        params = a.reshape(T, MPT // 128, 128, 9).transpose(0, 1, 3, 2)
        return params, meta.counts

    params, counts = jax.block_until_ready(build_inputs(g))
    pf = flatsort._pf_split_t(32, 32)

    t = chained(
        jax, jnp,
        lambda pp: flatsort._composite_flat(pp, counts, pf, False,
                                            tiles_x, 32, 32, False),
        (params,), it, overhead,
        lambda o: jnp.sum(o[:, 0:5]),
    )
    results["composite fwd (kernel)"] = t

    def comp_fwdbwd(pp):
        def loss(x):
            o = flatsort._composite_flat(x, counts, pf, False,
                                         tiles_x, 32, 32, False)
            return jnp.sum(o[:, 0:5])

        l, gr = jax.value_and_grad(loss)(pp)
        return l + jnp.sum(gr)

    t = chained(jax, jnp, comp_fwdbwd, (params,), it, overhead,
                lambda s: s)
    results["composite fwd+bwd (kernel)"] = t

    # 6. glue pieces
    def gather_only(gg):
        proj = projection.project_gaussians(gg, view, S, tan)
        meta = flatsort._flat_binning(proj, S // 32, S // 32, 32, 32, 16)
        attrs = jnp.concatenate(
            [proj.mean2d, proj.conic, proj.opacity[:, None], proj.color],
            axis=1,
        )
        attrs = attrs[meta.order]
        attrs = jnp.concatenate([attrs, jnp.zeros_like(attrs[:1])], axis=0)
        return attrs[meta.flat_rank]

    t = chained(jax, jnp, gather_only, (g,), it, overhead,
                lambda a: jnp.sum(a))
    results["proj+bin+gather fwd"] = t

    t = chained(jax, jnp, build_inputs, (g,), it, overhead,
                lambda o: jnp.sum(o[0]))
    results["build_inputs fwd (all glue)"] = t

    print("tile counts: total=%d mean=%.0f max=%d" % (
        int(np.sum(np.asarray(counts))),
        float(np.mean(np.asarray(counts))),
        int(np.max(np.asarray(counts)))))
    for k, v in results.items():
        print(f"{k:28s} {v*1e3:8.3f} ms  ({1/v:8.1f}/s)")


if __name__ == "__main__":
    main()
