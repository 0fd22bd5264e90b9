"""Attention kernel A/B at the U-Net's cross-view shapes (round 5).

Compares, at B2/S4096/h16/d32 (the five S=4096 levels that dominate the
38 ms/step attention bucket, BENCHMARKS.md v4 roofline):
  - dense jax.nn.dot_product_attention
  - stock Pallas flash with the r3-tuned 1024 blocks (current prod path)
  - the K-resident kernel (lgm_tpu/ops/mha.py)

Chained-dependence protocol (see bench.py). Run on TPU:
    python scripts/bench_attention.py
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
            a = jax.tree.map(lambda x: x + (1e-20 * s).astype(x.dtype), a)
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
    B, S, H, D = 2, 4096, 16, 32
    scale = float(D) ** -0.5
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, (B, S, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 1, (B, S, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(0, 1, (B, S, H, D)), jnp.bfloat16)
    overhead = roundtrip()
    print(f"backend={jax.default_backend()} B{B} S{S} h{H} d{D} "
          f"overhead={overhead*1e3:.1f}ms")

    def dense(a):
        qq, kk, vv = a
        return jnp.sum(jax.nn.dot_product_attention(qq, kk, vv)
                       .astype(jnp.float32))

    def flash(a):
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, flash_attention)

        b = 1024
        bs = BlockSizes(block_q=b, block_k_major=b, block_k=b, block_b=1,
                        block_q_major_dkv=b, block_k_major_dkv=b,
                        block_k_dkv=b, block_q_dkv=b, block_k_major_dq=b,
                        block_k_dq=b, block_q_dq=b)
        qq, kk, vv = a
        o = flash_attention(
            qq.transpose(0, 2, 1, 3), kk.transpose(0, 2, 1, 3),
            vv.transpose(0, 2, 1, 3), sm_scale=scale, block_sizes=bs)
        return jnp.sum(o.astype(jnp.float32))

    def kres(a):
        from lgm_tpu.ops.mha import mha_kresident

        qq, kk, vv = a
        def flat(x):
            return x.transpose(0, 2, 1, 3).reshape(B * H, S, D)
        o = mha_kresident(flat(qq), flat(kk), flat(vv), scale)
        return jnp.sum(o.astype(jnp.float32))

    args = (q, k, v)
    for name, fn in (("dense", dense), ("flash1024", flash),
                     ("kresident", kres)):
        try:
            fwd = chained(fn, args, 10, overhead)
            fb = chained(
                lambda a, fn=fn: fn(a)
                + sum(jnp.sum(g.astype(jnp.float32))
                      for g in jax.grad(
                          lambda aa: fn(aa))(a)),
                args, 10, overhead)
            print(f"{name:10s} fwd {fwd*1e3:7.3f} ms   "
                  f"fwd+bwd {fb*1e3:7.3f} ms")
        except Exception as e:
            print(f"{name:10s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
