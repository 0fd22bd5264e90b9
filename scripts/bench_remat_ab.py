"""A/B the big-bs2 train step with U-Net block remat on vs off.

Remat re-runs each U-Net block's forward during backward (+3.5 TFLOP
of the step's 10.5) to keep activation memory flat — required for the
96-view small-bs8 recipe that fills the chip, but at big-bs2 (8 input
images) the activations are small and the replay may be pure waste.
Prints ms/step for both settings plus peak-memory estimates.

Run: python scripts/bench_remat_ab.py
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


def bench(remat: bool, iters=4):
    import jax
    import jax.numpy as jnp

    from lgm_tpu.config import get_config
    from lgm_tpu.data.synthetic import SyntheticDataset
    from lgm_tpu.models.lgm import LGMWithLoss
    from lgm_tpu.train import TrainState, make_optimizer, train_step

    opt = get_config("big", batch_size=2, unet_remat=remat)
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

    @jax.jit
    def rep(st, data):
        def body(i, carry):
            st, acc = carry
            st, m = train_step(st, data, jax.random.fold_in(key, i))
            return (st, acc + m["loss"])

        return jax.lax.fori_loop(0, iters, body, (st, 0.0))[1]

    lowered = rep.lower(state, batch).compile()
    mem = lowered.memory_analysis()
    float(rep(state, batch))
    ts = []
    for _ in range(3):
        t0 = time.time()
        float(rep(state, batch))
        ts.append(time.time() - t0)
    ms = min(ts) / iters * 1e3
    print(f"unet_remat={remat}: {ms:.1f} ms/step  "
          f"(peak temp {mem.temp_size_in_bytes/2**30:.2f} GiB, "
          f"args+out {(mem.argument_size_in_bytes + mem.output_size_in_bytes)/2**30:.2f} GiB)",
          flush=True)
    return ms


def main():
    a = bench(True)
    b = bench(False)
    print(f"remat off is {a / b:.3f}x the speed of remat on")


if __name__ == "__main__":
    main()
