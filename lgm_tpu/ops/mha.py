"""K-resident multi-head attention kernel for the U-Net's cross-view levels.

The MVAttention sequence lengths are small by flash-attention standards
(S = V·32² = 4096 tokens at the coarse levels, ref: core/unet.py:43-45 /
core/attention.py:74-84) but the head dim is 32, which caps MXU
contraction efficiency at 25% (a 128-lane K axis holds one head's worth
of useful work). The stock Pallas flash kernel pays that tax AND the
full flash machinery designed for S ≫ VMEM: online-softmax rescaling in
the forward and TWO backward passes (dq, then dkv), each recomputing
the logits.

At S=4096/d=32 an entire head's K and V fit in VMEM (≤1 MB padded
each), so this kernel instead:

- forward: one grid step per (batch·head, q-block): full-width logits
  [bq, S] in one bf16 matmul against the RESIDENT K, exact (not online)
  softmax, one PV matmul. No softmax statistics are stored: a per-row
  f32 residual is 1-wide in its minor dim and lane-pads 128x (measured
  256 MB per level at small-bs8 — an OOM).
- backward: ONE fused pass per q-block that recomputes P (one matmul +
  two row-reductions, bit-identical to the forward's), then forms dq
  directly and accumulates dK/dV in VMEM scratch across q-blocks,
  flushing on the last block. 5 matmuls total vs the stock kernel's ~9,
  and no online-rescaling VPU traffic.

Numerics: matmuls run bf16→f32 (DEFAULT precision — same contract as
the stock flash kernel); softmax/statistics in f32. Gradient parity vs
the dense oracle is pinned by tests/test_mha.py; the on-chip A/B vs
flash-1024/dense is in BENCHMARKS.md (round 5 attention section).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale):
    q = q_ref[0]                                   # [bq, D] bf16
    k = k_ref[0]                                   # [S, D] bf16
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * sm_scale                                   # [bq, S] f32
    m = jnp.max(logits, axis=1, keepdims=True)
    p = jnp.exp(logits - m)
    s = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(jnp.bfloat16), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / s                                          # [bq, D]
    o_ref[0] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, o_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dk_scr, dv_scr, *, sm_scale,
                nq):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0]                                   # [bq, D] bf16
    k = k_ref[0]                                   # [S, D]
    v = v_ref[0]
    o = o_ref[0].astype(jnp.float32)               # [bq, D]
    do = do_ref[0].astype(jnp.float32)

    # No stored softmax statistics: the first revision saved per-row
    # logsumexp as [BH, S, 1] f32, whose 1-wide minor dim lane-padded
    # the residual 128x (256 MB per level at small-bs8 — an OOM), and
    # every 2-D layout fights the (8, 128) block-shape rules. The
    # backward recomputes the logits anyway, so max/sum are two extra
    # row-reductions — identical bits to the forward (same matmul,
    # deterministic) at zero storage.
    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * sm_scale
    m = jnp.max(logits, axis=1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)      # [bq, S]
    dob = do.astype(jnp.bfloat16)
    dp = jax.lax.dot_general(
        dob, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                              # [bq, S]
    drow = jnp.sum(do * o, axis=1, keepdims=True)  # [bq, 1]
    ds = (p * (dp - drow)).astype(jnp.bfloat16)    # [bq, S]
    dq = jax.lax.dot_general(
        ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * sm_scale
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_scr[:] += jax.lax.dot_general(
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * sm_scale                                   # [S, D]
    dv_scr[:] += jax.lax.dot_general(
        p.astype(jnp.bfloat16), dob,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == nq - 1)
    def _():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _pick_bq(S: int) -> int:
    # Full-width f32 logits [bq, S] live in VMEM: 4 MB at bq=256/S=4096.
    for bq in (256, 128, 64, 8):
        if S % bq == 0 and bq * S * 4 <= 4 << 20:
            return bq
    return 8


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def mha_kresident(q, k, v, sm_scale):
    """Full (unmasked) MHA; q/k/v [BH, S, D] (batch·heads flattened).

    Specialized for S·4 bytes of logits per row fitting VMEM and whole-
    head K/V residency — the U-Net cross-view regime. Returns [BH, S, D].
    """
    o, _ = _mha_fwd(q, k, v, sm_scale)
    return o


def _mha_fwd(q, k, v, sm_scale):
    BH, S, D = q.shape
    bq = _pick_bq(S)
    nq = S // bq
    interpret = jax.default_backend() != "tpu"
    o = pl.pallas_call(
        functools.partial(_fwd_kernel, sm_scale=sm_scale),
        grid=(BH, nq),
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, S, D), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, S, D), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, D), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, S, D), q.dtype),
        interpret=interpret,
    )(q, k, v)
    return o, (q, k, v, o)


def _mha_bwd(sm_scale, res, g):
    q, k, v, o = res
    BH, S, D = q.shape
    # The backward holds ~3 full-width [bq, S] f32 transients (p, dp,
    # ds) plus the resident K/V and the dK/dV scratch: bq=256 at S=4096
    # compiled standalone but hit the 16 MB scoped-VMEM limit by 128 KB
    # inside the train step (in-step operand layouts pad differently),
    # so the backward halves the block; re-measured A/B at this setting
    # in BENCHMARKS.md.
    bq = min(_pick_bq(S), 128)
    nq = S // bq
    interpret = jax.default_backend() != "tpu"
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, sm_scale=sm_scale, nq=nq),
        grid=(BH, nq),
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, S, D), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, S, D), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, bq, D), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, bq, D), lambda i, j: (i, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, D), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, S, D), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, S, D), lambda i, j: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, S, D), q.dtype),
            jax.ShapeDtypeStruct((BH, S, D), q.dtype),
            jax.ShapeDtypeStruct((BH, S, D), q.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((S, D), jnp.float32),
            pltpu.VMEM((S, D), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, o, g)
    return dq, dk, dv


mha_kresident.defvjp(_mha_fwd, _mha_bwd)
