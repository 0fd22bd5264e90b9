"""Whole-train-step profiler: U-Net vs rasterizer vs LPIPS shares.

Times the major stages of one LGM training step on the current backend
with the chained-dependence protocol of bench.py (defeats loop hoisting,
subtracts the dispatch round trip). Run:

    python scripts/profile_train.py [--preset big] [--batch 1]
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


def chained(jax, jnp, fn, arg0, iters, overhead):
    """fn(arg0) -> scalar; chains the scalar back into arg0 (a pytree of
    float arrays) to defeat loop-invariant hoisting."""

    @jax.jit
    def rep(a0):
        def body(i, carry):
            a0, acc = carry
            s = fn(a0)
            a0 = jax.tree.map(
                lambda x: x + jnp.asarray(1e-20 * s, x.dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x,
                a0,
            )
            return (a0, acc + s)

        return jax.lax.fori_loop(0, iters, body, (a0, 0.0))[1]

    float(rep(arg0))
    ts = []
    for _ in range(3):
        t0 = time.time()
        float(rep(arg0))
        ts.append(time.time() - t0)
    return max((min(ts) - overhead) / iters, 1e-9)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="big")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--stages", default="all",
                   help="comma list: unet,raster,lpips,loss,step")
    p.add_argument("--no-lpips", action="store_true",
                   help="set lambda_lpips=0 (isolates the in-step LPIPS "
                        "+ resize share by difference against a normal run)")
    p.add_argument("--dup", type=int, default=0,
                   help="override config.rasterizer_dup (0 = keep default)")
    args = p.parse_args()
    stages = set(args.stages.split(","))
    def want(name):
        return "all" in stages or name in stages

    import jax
    import jax.numpy as jnp

    from lgm_tpu.config import get_config
    from lgm_tpu.data.synthetic import SyntheticDataset
    from lgm_tpu.models.lgm import LGM, LGMWithLoss
    from lgm_tpu.train import make_optimizer, train_step, TrainState

    opt = get_config(args.preset, batch_size=args.batch)
    if args.no_lpips:
        opt = opt.replace(lambda_lpips=0.0)
    if args.dup:
        opt = opt.replace(rasterizer_dup=args.dup)
    print(f"preset={args.preset} B={opt.batch_size} V={opt.num_views} "
          f"Vin={opt.num_input_views} splat={opt.splat_size} "
          f"out={opt.output_size} N={opt.num_gaussians}")

    ds = SyntheticDataset(opt, training=True)
    batch = {k: jnp.asarray(v) for k, v in ds.batch(0).items()
             if k != "scenes"}

    rng = jax.random.PRNGKey(0)
    model = LGMWithLoss(opt)
    bg = jnp.ones(3)
    variables = jax.jit(model.init)(rng, batch, bg)
    params = variables["params"]

    overhead = _roundtrip(jax, jnp)
    it = args.iters
    print(f"backend={jax.default_backend()} overhead={overhead*1e3:.2f}ms")
    results = {}

    # --- 1. LGM (U-Net) forward only ------------------------------------
    # params ride as part of the chained ARGUMENT (closure constants
    # become XLA literals: 1.6 GB of them stalls/breaks the remote
    # compile — measured, see round-1 lessons in the verify skill).
    lgm = LGM(opt)
    lgm_arg = (params["lgm"], batch["input"])

    def lgm_fwd(arg):
        pp, x = arg
        return jnp.sum(lgm.apply({"params": pp}, x))

    if want("unet"):
        results["unet fwd"] = chained(jax, jnp, lgm_fwd, lgm_arg,
                                      it, overhead)

    # --- 2. LGM (U-Net) fwd+bwd ------------------------------------------
    def lgm_fwdbwd(arg):
        pp, x = arg

        def loss(p):
            return jnp.sum(lgm.apply({"params": p}, x))

        l, gr = jax.value_and_grad(loss)(pp)
        return l + sum(jnp.sum(g) for g in jax.tree.leaves(gr))

    if want("unet"):
        results["unet fwd+bwd"] = chained(jax, jnp, lgm_fwdbwd,
                                          lgm_arg, it, overhead)

    # --- 3. rasterizer all B*V views fwd ---------------------------------
    from lgm_tpu.ops.gsplat import render_views

    tan = float(np.tan(0.5 * np.deg2rad(opt.fovy)))
    if want("unet"):
        g0 = jax.jit(
            lambda pp, x: lgm.apply({"params": pp}, x).astype(jnp.float32)
        )(params["lgm"], batch["input"])
    else:
        # Raster-only runs skip the (slow-to-compile) U-Net: a bench-style
        # random scene at the same Gaussian count stands in.
        from lgm_tpu.models.lgm import activate_gaussians

        raw = jax.random.normal(
            jax.random.PRNGKey(3),
            (batch["cam_view"].shape[0], opt.num_gaussians, 14),
        )
        g0 = activate_gaussians(raw).astype(jnp.float32)
        g0 = g0.at[..., 0:3].mul(0.35)
        g0 = g0.at[..., 4:7].mul(0.25)
    B, V = batch["cam_view"].shape[:2]
    bgv = jnp.broadcast_to(bg, (B, V, 3))

    def rast_fwd(gg):
        o = render_views(gg, batch["cam_view"], opt.output_size, tan,
                         bg_color=bgv)
        return jnp.sum(o["image"]) + jnp.sum(o["alpha"])

    if want("raster"):
        results[f"raster {B * V}v fwd"] = chained(jax, jnp, rast_fwd, g0,
                                                  it, overhead)

    def rast_fwdbwd(gg):
        l, gr = jax.value_and_grad(rast_fwd)(gg)
        return l + jnp.sum(gr)

    if want("raster"):
        results[f"raster {B * V}v fwd+bwd"] = chained(
            jax, jnp, rast_fwdbwd, g0, it, overhead)

    # --- 4. LPIPS fwd+bwd on the supervision stack ------------------------
    if opt.lambda_lpips > 0 and want("lpips"):
        from lgm_tpu.models.lgm import _resize_to_256
        from lgm_tpu.models.lpips import LPIPS

        lp = LPIPS()
        lp_params = {"params": params["lpips_loss"]["m"]}
        S = opt.output_size
        imgs = jnp.asarray(
            np.random.default_rng(0).uniform(
                -1, 1, (B * V, S, S, 3)
            ).astype(np.float32)
        )

        def lpips_fwdbwd(x):
            def loss(xx):
                a = _resize_to_256(xx)
                b = _resize_to_256(jnp.flip(xx, axis=1))
                return jnp.mean(lp.apply(lp_params, a, b))

            l, gr = jax.value_and_grad(loss)(x)
            return l + jnp.sum(gr)

        results[f"lpips {B * V}v fwd+bwd"] = chained(
            jax, jnp, lpips_fwdbwd, imgs, it, overhead
        )

    # --- 5. full loss fwd+bwd (no optimizer) ------------------------------
    def full_fwdbwd(pp):
        def loss(q):
            return model.apply({"params": q}, batch, bg)["loss"]

        l, gr = jax.value_and_grad(loss)(pp)
        return l + sum(jnp.sum(g) for g in jax.tree.leaves(gr))

    if want("loss"):
        results["full loss fwd+bwd"] = chained(jax, jnp, full_fwdbwd,
                                               params, it, overhead)

    # --- 5b. optimizer update alone (AdamW + clip + frozen mask) ---------
    if want("opt"):
        from lgm_tpu.train import TrainState as TS

        state0 = TS.create(apply_fn=model.apply, params=params,
                           tx=make_optimizer(opt))

        def opt_only(arg):
            st, grads = arg
            st2 = st.apply_gradients(grads=grads)
            # Depend on EVERY updated leaf (params + opt state): a
            # partial readout would let XLA DCE the rest of the update.
            return sum(
                jnp.sum(l).astype(jnp.float32)
                for l in jax.tree.leaves((st2.params, st2.opt_state))
                if hasattr(l, "dtype") and jnp.issubdtype(
                    l.dtype, jnp.floating)
            )

        grads0 = jax.tree.map(lambda x: jnp.full_like(x, 1e-6), params)
        results["optimizer only"] = chained(
            jax, jnp, opt_only, (state0, grads0), it, overhead)

    # --- 6. full train step (loss + optimizer) ----------------------------
    if want("step"):
        state = TrainState.create(apply_fn=model.apply, params=params,
                                  tx=make_optimizer(opt))
        key = jax.random.PRNGKey(1)

        # batch MUST be an argument, not a closed-over constant: XLA
        # embeds closure constants as literals with padded layouts
        # (measured 1.5 GB each for [V,B,256,256,3] f32 at 21x padding).
        @jax.jit
        def rep_step(st, data):
            def body(i, carry):
                st, acc = carry
                st, m = train_step(st, data, jax.random.fold_in(key, i))
                return (st, acc + m["loss"])

            return jax.lax.fori_loop(0, it, body, (st, 0.0))[1]

        float(rep_step(state, batch))
        ts = []
        for _ in range(3):
            t0 = time.time()
            float(rep_step(state, batch))
            ts.append(time.time() - t0)
        results["train step (loss+opt)"] = max(
            (min(ts) - overhead) / it, 1e-9)

    for k, v in results.items():
        print(f"{k:26s} {v*1e3:9.2f} ms  ({1/v:7.2f}/s)")


if __name__ == "__main__":
    main()
