"""Microbenchmarks for the rasterizer's gather/scatter glue layouts.

The flat-sort pipeline moves per-splat attributes to per-slot layout with
one gather (fwd) and reduces slot cotangents back with one scatter-add
(bwd). Rows of C<=16 floats lane-pad 14x under the TPU's (8,128) tiling,
so the row-major forms pay ~134 MB of padded traffic per view; this
script measures the lane-major alternatives on the real chip.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_gs.py
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


def _roundtrip():
    f = jax.jit(lambda a: a * 2.0)
    x = jnp.ones((8, 8))
    float(jnp.sum(f(x)))
    ts = []
    for _ in range(8):
        t0 = time.time()
        float(jnp.sum(f(x)))
        ts.append(time.time() - t0)
    return min(ts)


def chained(fn, arg0, iters, overhead):
    @jax.jit
    def rep(a0):
        def body(i, carry):
            a0, acc = carry
            s = fn(a0)
            return (a0 + 1e-20 * s, acc + s)

        return jax.lax.fori_loop(0, iters, body, (a0, 0.0))[1]

    float(rep(arg0))
    ts = []
    for _ in range(3):
        t0 = time.time()
        float(rep(arg0))
        ts.append(time.time() - t0)
    return max((min(ts) - overhead) / iters, 1e-9)


def main():
    N = 65536
    T = 256           # tiles at 512^2 / 32x32
    MPT = 1024
    NC = MPT // 128
    C = 9
    S = T * MPT       # 262144 slots
    rng = np.random.default_rng(0)

    # Realistic flat_rank: per-tile sorted runs; ~75% live.
    fr_np = np.full((T, MPT), N, np.int32)
    for t in range(T):
        cnt = int(rng.integers(MPT // 2, MPT))
        fr_np[t, :cnt] = np.sort(
            rng.choice(N, size=cnt, replace=False).astype(np.int32)
        )
    fr = jnp.asarray(fr_np.reshape(-1))

    attrs = jnp.asarray(rng.normal(size=(N + 1, C)).astype(np.float32))
    attrs_T = attrs.T.copy()                     # [C, N+1]
    dslot = jnp.asarray(rng.normal(size=(S, C)).astype(np.float32))
    dslot_T = dslot.T.copy()                     # [C, S]
    dslot_fm = jnp.asarray(
        rng.normal(size=(T, NC, 16, 128)).astype(np.float32)
    )                                            # feature-major kernel out

    overhead = _roundtrip()
    it = 20
    res = {}

    # --- forward gather variants ---------------------------------------
    res["fwd row-gather [S,C]"] = chained(
        lambda a: jnp.sum(a[fr]), attrs, it, overhead)

    res["fwd lane-gather [C,S]"] = chained(
        lambda a: jnp.sum(jnp.take(a, fr, axis=1)), attrs_T, it, overhead)

    def row_to_kernel(a):
        g = a[fr]                                # [S, C]
        k = g.reshape(T, NC, 128, C).transpose(0, 1, 3, 2)
        return jnp.sum(k)

    res["fwd row-gather + to [T,NC,C,G]"] = chained(
        row_to_kernel, attrs, it, overhead)

    def lane_to_kernel(a):
        g = jnp.take(a, fr, axis=1)              # [C, S]
        k = g.reshape(C, T, NC, 128).transpose(1, 2, 0, 3)
        return jnp.sum(k)

    res["fwd lane-gather + to [T,NC,C,G]"] = chained(
        lane_to_kernel, attrs_T, it, overhead)

    # --- backward reduction variants -----------------------------------
    res["bwd row-scatter [S,C]->[N,C]"] = chained(
        lambda d: jnp.sum(
            jnp.zeros((N + 1, C), jnp.float32).at[fr].add(d, mode="drop")),
        dslot, it, overhead)

    res["bwd lane-scatter [C,S]->[C,N]"] = chained(
        lambda d: jnp.sum(
            jnp.zeros((C, N + 1), jnp.float32).at[:, fr].add(
                d, mode="drop")),
        dslot_T, it, overhead)

    def fm_transpose_scatter(d):
        rows = d.transpose(0, 1, 3, 2).reshape(S, 16)[:, :C]
        return jnp.sum(
            jnp.zeros((N + 1, C), jnp.float32).at[fr].add(rows, mode="drop"))

    res["bwd fm->rows + scatter"] = chained(
        fm_transpose_scatter, dslot_fm, it, overhead)

    def fm_lane_scatter(d):
        lanes = d.reshape(T * NC, 16, 128).transpose(1, 0, 2).reshape(16, S)
        return jnp.sum(
            jnp.zeros((16, N + 1), jnp.float32).at[:, fr].add(
                lanes, mode="drop"))

    res["bwd fm->lanes + lane-scatter"] = chained(
        fm_lane_scatter, dslot_fm, it, overhead)

    # sorted-indices hint
    res["bwd row-scatter sorted-hint"] = chained(
        lambda d: jnp.sum(
            jax.lax.scatter_add(
                jnp.zeros((N + 1, C), jnp.float32),
                fr[:, None], d,
                jax.lax.ScatterDimensionNumbers(
                    update_window_dims=(1,),
                    inserted_window_dims=(0,),
                    scatter_dims_to_operand_dims=(0,),
                ),
                indices_are_sorted=False, unique_indices=False,
                mode=jax.lax.GatherScatterMode.FILL_OR_DROP,
            )),
        dslot, it, overhead)

    for k, v in res.items():
        print(f"{k:38s} {v*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
