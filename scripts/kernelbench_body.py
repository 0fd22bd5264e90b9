"""Composite-kernel BODY attribution bench (round 5).

The v4 roofline puts the composite fwd kernel at 19% and bwd at 22% of
their VPU-op bounds, with the around-the-kernel hypotheses (KPT
batching, MXU scans, remat) measured and rejected — so the remaining
gap is inside the body. This script measures surgical variants of the
forward kernel on the exact bench scene to attribute the per-chunk
cost:

  full        : the production kernel (baseline)
  countgate   : gate chunks on the prefetched count only — removes the
                data-dependent max(t_scr) scalar read (sync cost probe);
                does MORE compute (1649 vs 530 live chunks), so if it is
                not ~3x slower the gate sync dominates
  nogate      : no gate at all (2048 chunks) — pl.when removal probe
  writeonly   : body only resets scratch and writes — per-grid-step +
                DMA floor
  alphaonly   : alpha chain + matmuls, prefix network replaced by
                alpha itself — the shift network's cost by difference
  hoistmask   : production math, but the shift networks use [G, 1]
                row-iota masks hoisted out of the loop instead of a
                fresh [G, P] broadcasted_iota + compare per step
  noexp       : alpha = op_col * power (no exp) — transcendental cost

Usage: python scripts/kernelbench_body.py
"""

import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lgm_tpu.ops.gsplat import flatsort
from lgm_tpu.ops.gsplat.flatsort import (
    _chunk_alpha_t, _coef_from_raw, _pixel_features_t, _prefix_prod_rows,
    _shift_rows,
)
from lgm_tpu.ops.gsplat.tiled import G_CHUNK, T_EPS, _HI
from lgm_tpu.utils import camera
from scripts.roofline_v4 import build_scene, DUP, MPT, N, S, TILE


def _hoisted_prefix_prod(x, masks):
    for (s, m) in masks:
        rolled = pltpu.roll(x, shift=s, axis=0)
        x = x * jnp.where(m, 1.0, rolled)
    return x


def make_fwd_kernel(variant):
    def kernel(cnt_ref, params_ref, pf_ref, out_ref, t_scr, acc_scr,
               *, tiles_x, tile_w, tile_h):
        t = pl.program_id(0)
        NC = params_ref.shape[1]
        P = pf_ref.shape[1]
        eye = jnp.eye(G_CHUNK, dtype=jnp.float32)
        count = cnt_ref[t]
        tox = ((t % tiles_x) * tile_w).astype(jnp.float32)
        toy = ((t // tiles_x) * tile_h).astype(jnp.float32)
        t_scr[:] = jnp.ones((1, P), jnp.float32)
        acc_scr[:] = jnp.zeros((8, P), jnp.float32)
        if variant == "hoistmask":
            row = jax.lax.broadcasted_iota(jnp.int32, (G_CHUNK, 1), 0)
            masks = [(s, row < s) for s in (1, 2, 4, 8, 16, 32, 64)]

        for k in range(NC):
            if variant == "nogate":
                live = True
            elif variant in ("countgate", "writeonly"):
                live = k * G_CHUNK < count
            else:
                live = (k * G_CHUNK < count) & (jnp.max(t_scr[:]) > T_EPS)

            def body(k=k, tox=tox, toy=toy):
                if variant == "writeonly":
                    # touch the params block (keeps its DMA) without math
                    acc_scr[:] += jnp.sum(params_ref[0, k])
                    return
                pf = pf_ref[:]
                blk = params_ref[0, k]
                pcoef, colmat, _, _, _, _ = _coef_from_raw(
                    blk, tox, toy, False)
                if variant == "noexp":
                    power = jax.lax.dot_general(
                        pcoef, pf,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=_HI)
                    op_col = jax.lax.dot_general(
                        eye, pcoef[6:7],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=_HI)
                    araw = op_col * power
                    alpha = jnp.where(power <= 0.0,
                                      jnp.minimum(araw, 0.99), 0.0)
                    om = 1.0 - alpha
                else:
                    alpha, om, _, _ = _chunk_alpha_t(pf, pcoef, eye)
                if variant == "alphaonly":
                    cp = om
                    t_excl = om
                elif variant == "hoistmask":
                    cp = _hoisted_prefix_prod(om, masks)
                    rolled = pltpu.roll(cp, shift=1, axis=0)
                    t_excl = jnp.where(masks[0][1], 1.0, rolled)
                else:
                    cp = _prefix_prod_rows(om)
                    t_excl = _shift_rows(cp, 1, 1.0)
                w = alpha * t_excl * t_scr[:]
                acc_scr[:] += jax.lax.dot_general(
                    colmat, w,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=_HI)
                t_scr[:] *= cp[G_CHUNK - 1:G_CHUNK, :]

            if live is True:
                body()
            else:
                pl.when(live)(body)

        acc = acc_scr[:]
        row = jax.lax.broadcasted_iota(jnp.int32, (8, P), 0)
        out_ref[0] = jnp.where(row == 4, t_scr[:], acc)

    return kernel


def run_variant(variant, params, counts, pf, tiles_x):
    T, NC, R = params.shape[0], params.shape[1], params.shape[2]
    P = pf.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, NC, R, G_CHUNK), lambda t, cnt: (t, 0, 0, 0)),
            pl.BlockSpec((8, P), lambda t, cnt: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 8, P), lambda t, cnt: (t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((1, P), jnp.float32),
            pltpu.VMEM((8, P), jnp.float32),
        ],
    )
    kernel = functools.partial(make_fwd_kernel(variant), tiles_x=tiles_x,
                               tile_w=TILE, tile_h=TILE)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, 8, P), jnp.float32),
    )(counts, params, pf)


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
    pf = _pixel_features_t(TILE, TILE)
    tiles_x = S // TILE
    print(f"scene: binned={int(np.asarray(counts).sum())} "
          f"max={int(np.asarray(counts).max())}")

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
                s = jnp.sum(fn(a)[:, 0:5])
                return (a + 1e-20 * s, acc + s)
            return jax.lax.fori_loop(0, iters, body, (a, 0.0))[1]

        float(rep(a0))
        ts = []
        for _ in range(3):
            t0 = time.time()
            float(rep(a0))
            ts.append(time.time() - t0)
        return max((min(ts) - overhead) / iters, 1e-9)

    variants = ["full", "countgate", "nogate", "writeonly", "alphaonly",
                "hoistmask", "noexp"]
    base = None
    for v in variants:
        t = chained(lambda p, v=v: run_variant(v, p, counts, pf, tiles_x),
                    params)
        if v == "full":
            base = t
        print(f"  {v:12s} {t * 1e3:7.3f} ms/view  "
              f"({t / base * 100:5.1f}% of full)")
        # correctness spot-check for the semantics-preserving variants
        if v in ("hoistmask",):
            a = run_variant("full", params, counts, pf, tiles_x)
            b = run_variant(v, params, counts, pf, tiles_x)
            err = float(jnp.max(jnp.abs(a - b)))
            print(f"               max |delta| vs full: {err:.2e}")


if __name__ == "__main__":
    main()
