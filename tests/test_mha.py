"""K-resident MHA kernel vs the dense oracle: forward + gradients.

The kernel (lgm_tpu/ops/mha.py) replaces the stock Pallas flash kernel
at the U-Net's S=4096/d=32 cross-view levels (ref attention contract:
core/attention.py:67-84 — plain scaled dot-product, no mask)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.quick


def _dense(q, k, v, scale):
    logits = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p, v.astype(jnp.float32))


@pytest.mark.parametrize("S,D", [(512, 32), (1024, 64), (4096, 32)])
def test_mha_kresident_matches_dense(S, D):
    from lgm_tpu.ops.mha import mha_kresident

    rng = np.random.default_rng(0)
    BH = 4
    q, k, v = (
        jnp.asarray(rng.normal(0, 1, (BH, S, D)).astype(np.float32))
        .astype(jnp.bfloat16)
        for _ in range(3)
    )
    # distinct tensors (the generator above would alias one sample)
    q = jnp.asarray(rng.normal(0, 1, (BH, S, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 1, (BH, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(0, 1, (BH, S, D)), jnp.bfloat16)
    scale = float(D) ** -0.5

    o = jax.jit(lambda a, b, c: mha_kresident(a, b, c, scale))(q, k, v)
    o_ref = _dense(q, k, v, scale)
    err = jnp.max(jnp.abs(o.astype(jnp.float32) - o_ref))
    assert float(err) < 2e-2, float(err)  # bf16 matmul rounding

    def loss_k(fn):
        def f(qq, kk, vv):
            out = fn(qq, kk, vv)
            w = jnp.sin(jnp.arange(out.size, dtype=jnp.float32)
                        ).reshape(out.shape)
            return jnp.sum(out.astype(jnp.float32) * w)
        return f

    g = jax.jit(jax.grad(loss_k(
        lambda a, b, c: mha_kresident(a, b, c, scale)), argnums=(0, 1, 2)))(
            q, k, v)
    g_ref = jax.grad(loss_k(lambda a, b, c: _dense(a, b, c, scale)),
                     argnums=(0, 1, 2))(q, k, v)
    for name, gi, gr in zip("qkv", g, g_ref):
        gi = np.asarray(gi, np.float32).ravel()
        gr = np.asarray(gr, np.float32).ravel()
        cos = float(gi @ gr / (np.linalg.norm(gi) * np.linalg.norm(gr)))
        assert cos > 0.9995, (name, cos)
        scale_ratio = np.linalg.norm(gi) / np.linalg.norm(gr)
        assert 0.98 < scale_ratio < 1.02, (name, scale_ratio)
