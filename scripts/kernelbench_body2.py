"""Composite fwd kernel: additive marginal-cost attribution + v5
candidates (round 5).

kernelbench_body.py established: per-step floor 0.26 ms/view (20%),
T_EPS gate worth keeping, hoisted shift-network masks -12%. The
`alphaonly`/`noexp` variants there were confounded (changing alpha
changes the saturation gate -> more live chunks). This script measures
marginal costs by DUPLICATING one component at a time with a 1e-7 input
perturbation (defeats CSE, preserves gate behavior to ~1e-7), so
  cost(component) ~= t(dup_X) - t(full).

Candidates measured alongside:
  hoist     : hoisted [G,1] masks (from bench 1)
  stackmm   : hoist + one [8, 2G] x [8, P] matmul emitting power AND
              ln(araw) = power + ln(op) stacked on the M axis — deletes
              the N=1 eye-transpose matmul and the op_col * exp mul
  gatesum   : hoist + gate on lane-SUM of t_scr (conservative since
              sum >= max; probes whether the reduction flavor matters)

Usage: python scripts/kernelbench_body2.py
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
from lgm_tpu.ops.gsplat.flatsort import _coef_from_raw, _pixel_features_t
from lgm_tpu.ops.gsplat.projection import ALPHA_MAX, ALPHA_MIN
from lgm_tpu.ops.gsplat.tiled import G_CHUNK, T_EPS, _HI
from lgm_tpu.utils import camera
from scripts.roofline_v4 import build_scene, DUP, MPT, S, TILE

EPS = 1.0000001


def make_kernel(variant):
    hoisted = variant != "full"

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
        row = jax.lax.broadcasted_iota(jnp.int32, (G_CHUNK, 1), 0)
        masks = [(s, row < s) for s in (1, 2, 4, 8, 16, 32, 64)]

        def prefix_prod(x):
            if hoisted:
                for (s, m) in masks:
                    x = x * jnp.where(m, 1.0, pltpu.roll(x, shift=s, axis=0))
                return x
            return flatsort._prefix_prod_rows(x)

        def shift1(x, fill):
            if hoisted:
                return jnp.where(masks[0][1], fill,
                                 pltpu.roll(x, shift=1, axis=0))
            return flatsort._shift_rows(x, 1, fill)

        for k in range(NC):
            live = (k * G_CHUNK < count) & (
                (jnp.sum(t_scr[:]) > T_EPS) if variant == "gatesum"
                else (jnp.max(t_scr[:]) > T_EPS))

            @pl.when(live)
            def body(k=k, tox=tox, toy=toy):
                pf = pf_ref[:]
                blk = params_ref[0, k]
                pcoef, colmat, _, _, _, _ = _coef_from_raw(
                    blk, tox, toy, False)
                if variant == "dup_coef":
                    p2 = _coef_from_raw(blk * EPS, tox, toy, False)[0]
                    pcoef = 0.5 * (pcoef + p2 * (2.0 - EPS))

                if variant == "stackmm":
                    op = pcoef[6:7]
                    lnop = jnp.log(jnp.maximum(op, 1e-38))
                    pc2 = pcoef.at[5:6].add(lnop) if False else (
                        jnp.concatenate(
                            [pcoef[0:5], pcoef[5:6] + lnop, pcoef[6:8]],
                            axis=0))
                    stacked = jnp.concatenate([pcoef, pc2], axis=1)
                    both = jax.lax.dot_general(
                        stacked, pf,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=_HI)
                    power = both[:G_CHUNK]
                    araw = jnp.exp(both[G_CHUNK:])
                    use = (power <= 0.0) & (araw >= ALPHA_MIN)
                    alpha = jnp.where(use, jnp.minimum(araw, ALPHA_MAX),
                                      0.0)
                    om = 1.0 - alpha
                else:
                    power = jax.lax.dot_general(
                        pcoef, pf,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=_HI)
                    if variant == "dup_powermm":
                        p2 = jax.lax.dot_general(
                            pcoef * EPS, pf,
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=_HI)
                        power = 0.5 * (power + p2 * (2.0 - EPS))
                    op_col = jax.lax.dot_general(
                        eye, pcoef[6:7],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=_HI)
                    if variant == "dup_eyemm":
                        o2 = jax.lax.dot_general(
                            eye, pcoef[6:7] * EPS,
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=_HI)
                        op_col = 0.5 * (op_col + o2 * (2.0 - EPS))
                    e = jnp.exp(power)
                    if variant == "dup_exp":
                        e = 0.5 * (e + jnp.exp(power * EPS) * EPS)
                    araw = op_col * e
                    use = (power <= 0.0) & (araw >= ALPHA_MIN)
                    alpha = jnp.where(use, jnp.minimum(araw, ALPHA_MAX),
                                      0.0)
                    om = 1.0 - alpha

                cp = prefix_prod(om)
                if variant == "dup_prefix":
                    cp2 = prefix_prod(om * EPS)
                    cp = jnp.minimum(cp, cp2)
                t_excl = shift1(cp, 1.0)
                w = alpha * t_excl * t_scr[:]
                acc = jax.lax.dot_general(
                    colmat, w,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=_HI)
                if variant == "dup_accmm":
                    a2 = jax.lax.dot_general(
                        colmat * EPS, w,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=_HI)
                    acc = 0.5 * (acc + a2 * (2.0 - EPS))
                acc_scr[:] += acc
                t_scr[:] *= cp[G_CHUNK - 1:G_CHUNK, :]

        acc = acc_scr[:]
        orow = jax.lax.broadcasted_iota(jnp.int32, (8, P), 0)
        out_ref[0] = jnp.where(orow == 4, t_scr[:], acc)

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
    kernel = functools.partial(make_kernel(variant), tiles_x=tiles_x,
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

    variants = ["full", "hoist", "dup_coef", "dup_powermm", "dup_eyemm",
                "dup_exp", "dup_prefix", "dup_accmm", "stackmm",
                "gatesum"]
    ref_out = run_variant("full", params, counts, pf, tiles_x)
    times = {}
    for v in variants:
        try:
            t = chained(
                lambda p, v=v: run_variant(v, p, counts, pf, tiles_x),
                params)
        except Exception as e:  # noqa: BLE001 — survey bench, keep going
            print(f"  {v:12s} FAILED: {str(e).splitlines()[0][:100]}",
                  flush=True)
            continue
        times[v] = t
        extra = ""
        if v.startswith("dup_"):
            # dup_* variants share the hoisted-mask structure, so their
            # marginal is relative to the `hoist` variant.
            extra = f"  marginal {1e3 * (t - times['hoist']):+6.3f} ms"
        if v in ("hoist", "stackmm", "gatesum"):
            out = run_variant(v, params, counts, pf, tiles_x)
            err = float(jnp.max(jnp.abs(out - ref_out)))
            extra = f"  max|delta|={err:.2e}"
        print(f"  {v:12s} {t * 1e3:7.3f} ms/view{extra}", flush=True)


if __name__ == "__main__":
    main()
