"""Optimizer-update variants at LGM-big scale (round 5 glue-bucket cut).

The r5 isolated measurement put the production optimizer update (clip
1.0 -> AdamW(bf16 mu) -> frozen-LPIPS mask, ~415M params in ~360
leaves) at 35.5 ms/step vs a ~14 ms HBM-stream bound. Candidates, each
measured with the chained protocol:

  base        the production make_optimizer chain
  flat        optax.flatten(base): one concatenated update stream
              instead of ~360 per-leaf kernel chains
  f32mu       base with f32 first moment (is the bf16 cast chain the
              overhead?)
  noclip      base without clip_by_global_norm (isolates the norm
              barrier + rescale pass)

Run on TPU:  python scripts/bench_optimizer.py
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
import optax


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


def chained(fn, args, iters, overhead):
    @jax.jit
    def rep(a):
        def body(i, carry):
            a, acc = carry
            s = fn(a)
            a = jax.tree.map(
                lambda x: x + (1e-20 * s).astype(x.dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, a)
            return (a, acc + s)
        return jax.lax.fori_loop(0, iters, body, (a, 0.0))[1]

    float(rep(args))
    ts = []
    for _ in range(3):
        t0 = time.time()
        float(rep(args))
        ts.append(time.time() - t0)
    return max((min(ts) - overhead) / iters, 1e-9)


def main():
    from lgm_tpu.config import get_config
    from lgm_tpu.data.synthetic import SyntheticDataset
    from lgm_tpu.models.lgm import LGMWithLoss
    from lgm_tpu.train import make_optimizer

    opt = get_config("big", batch_size=2)
    ds = SyntheticDataset(opt, training=True)
    batch = {k: jnp.asarray(v) for k, v in ds.batch(0).items()
             if k != "scenes"}
    model = LGMWithLoss(opt, dtype=jnp.bfloat16)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), batch, jnp.ones(3))["params"]
    n_leaves = len(jax.tree.leaves(params))
    n_params = sum(x.size for x in jax.tree.leaves(params))
    overhead = roundtrip()
    print(f"backend={jax.default_backend()} leaves={n_leaves} "
          f"params={n_params/1e6:.0f}M overhead={overhead*1e3:.1f}ms")

    grads = jax.tree.map(lambda x: jnp.full_like(x, 1e-6), params)

    variants = {
        "base": make_optimizer(opt),
        "flat": optax.flatten(make_optimizer(opt)),
    }
    # f32 mu / noclip: rebuild the chain pieces like make_optimizer does.
    from lgm_tpu.train import _is_lpips

    def build(mu_dtype, clip):
        sched = optax.cosine_onecycle_schedule(
            transition_steps=opt.total_steps, peak_value=opt.lr,
            pct_start=opt.warmup_steps / opt.total_steps,
            div_factor=25.0, final_div_factor=1e4)
        parts = []
        if clip:
            parts.append(optax.clip_by_global_norm(opt.gradient_clip))
        parts.append(optax.adamw(sched, b1=0.9, b2=0.95,
                                 weight_decay=0.05, mu_dtype=mu_dtype))
        tx = optax.chain(*parts)
        label = lambda p: jax.tree_util.tree_map_with_path(
            lambda path, x: "frozen" if _is_lpips(path, x) else "train", p)
        return optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, label)

    variants["f32mu"] = build(jnp.float32, True)
    variants["noclip"] = build(jnp.bfloat16, False)
    variants["flat_f32mu"] = optax.flatten(build(jnp.float32, True))

    for name, tx in variants.items():
        opt_state = jax.jit(tx.init)(params)

        # Natural loop-carry (params, opt_state) -> next iteration, the
        # same dependence shape as the real train step: no hoisting is
        # possible (every update reads the previous state) and the
        # harness adds no epsilon-chain traffic over the 8 GB tree (the
        # first measurement of this bench paid ~15 GB/iter in that
        # chain and read 36 ms; this form is the honest one).
        def many(arg, tx=tx, iters=4):
            def body(i, carry):
                p, st = carry
                upd, st2 = tx.update(grads, st, p)
                return (optax.apply_updates(p, upd), st2)

            p2, st2 = jax.lax.fori_loop(0, iters, body,
                                        (arg[0], arg[1]))
            return sum(
                jnp.sum(l).astype(jnp.float32)
                for l in jax.tree.leaves((p2, st2))
                if hasattr(l, "dtype")
                and jnp.issubdtype(l.dtype, jnp.floating))

        try:
            f = jax.jit(many)
            float(f((params, opt_state)))
            ts = []
            for _ in range(3):
                t0 = time.time()
                float(f((params, opt_state)))
                ts.append(time.time() - t0)
            t = max((min(ts) - overhead) / 4, 1e-9)
            print(f"{name:12s} {t*1e3:8.2f} ms")
        except Exception as e:
            print(f"{name:12s} FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
