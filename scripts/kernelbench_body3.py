"""Split-K bf16 power matmul: the v5 composite-kernel candidate.

kernelbench_body2 attribution: the [8, G]x[8, P] f32-HIGHEST power
matmul is ~54% of the hoisted fwd body (+0.572 ms/view marginal). Root
cause: K=8 pads to the MXU's 128 (6% utilization) TIMES the 6-pass
bf16 decomposition HIGHEST uses for f32 operands.

Fix measured here: the pixel features are small integers (x², y²,
xy <= 961; x, y <= 31; 1) — exactly two (or one) bf16 terms — and each
quadratic coefficient splits into three bf16 terms capturing its full
f32 mantissa. The rank-6 contraction then becomes a K=27 bf16 DEFAULT
matmul (one MXU pass; K<=128 pads anyway), f32-faithful to ~4e-7
relative (validated in numpy, see round-5 notes).

Variants:
  hoist        : body2's best (hoisted masks), baseline
  splitmm      : + split-K power matmul
  splitmm_acch : + the acc contraction (colmat @ w, K=128) at HIGH
                 (3-pass) instead of HIGHEST (6-pass)

Usage: python scripts/kernelbench_body3.py
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

# Per-feature pf term counts: x²,y²,xy need two exact bf16 terms
# (integers <= 961); x, y, 1 are exact in one.
PF_TERMS = (2, 2, 2, 1, 1, 1)
KSPLIT = 3 * sum(PF_TERMS)          # 27
KPAD = 32                            # bf16 sublane tile


def build_pf_split(tile_h, tile_w):
    """[KPAD, P] bf16 RHS for the split power matmul (host-side)."""
    pf = np.asarray(_pixel_features_t(tile_h, tile_w))  # [8, P] f32
    rows = []
    for f in range(6):
        if PF_TERMS[f] == 2:
            hi = pf[f].astype(jnp.bfloat16).astype(np.float32)
            lo = pf[f] - hi
            assert np.all(lo.astype(jnp.bfloat16).astype(np.float32) == lo)
            terms = [hi, lo]
        else:
            t = pf[f]
            assert np.all(t.astype(jnp.bfloat16).astype(np.float32) == t)
            terms = [t]
        for i in range(3):          # one copy per coefficient term
            rows.extend(terms)
    rows.extend([np.zeros_like(pf[0])] * (KPAD - len(rows)))
    return jnp.asarray(np.stack(rows, 0), jnp.bfloat16)


def split_lhs(pcoef):
    """[8, G] f32 coefficient rows -> [KPAD, G] bf16 LHS, row order
    matching build_pf_split."""
    rows = []
    for f in range(6):
        c = pcoef[f:f + 1]
        t1 = c.astype(jnp.bfloat16).astype(jnp.float32)
        r = c - t1
        t2 = r.astype(jnp.bfloat16).astype(jnp.float32)
        t3 = r - t2
        for t in (t1, t2, t3):
            rows.extend([t] * PF_TERMS[f])
    zeros = jnp.zeros_like(pcoef[0:1])
    rows.extend([zeros] * (KPAD - len(rows)))
    return jnp.concatenate(rows, axis=0).astype(jnp.bfloat16)


def power_split(pcoef, pfs_ref):
    return jax.lax.dot_general(
        split_lhs(pcoef), pfs_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def make_kernel(variant):
    def kernel(cnt_ref, params_ref, pf_ref, pfs_ref, out_ref, t_scr,
               acc_scr, *, tiles_x, tile_w, tile_h):
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
            for (s, m) in masks:
                x = x * jnp.where(m, 1.0, pltpu.roll(x, shift=s, axis=0))
            return x

        for k in range(NC):
            live = (k * G_CHUNK < count) & (jnp.max(t_scr[:]) > T_EPS)

            @pl.when(live)
            def body(k=k, tox=tox, toy=toy):
                pf = pf_ref[:]
                blk = params_ref[0, k]
                pcoef, colmat, _, _, _, _ = _coef_from_raw(
                    blk, tox, toy, False)
                if variant == "hoist":
                    power = jax.lax.dot_general(
                        pcoef, pf,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=_HI)
                else:
                    power = power_split(pcoef, pfs_ref)
                op_col = jax.lax.dot_general(
                    eye, pcoef[6:7],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=_HI)
                araw = op_col * jnp.exp(power)
                use = (power <= 0.0) & (araw >= ALPHA_MIN)
                alpha = jnp.where(use, jnp.minimum(araw, ALPHA_MAX), 0.0)
                om = 1.0 - alpha
                cp = prefix_prod(om)
                t_excl = jnp.where(masks[0][1], 1.0,
                                   pltpu.roll(cp, shift=1, axis=0))
                w = alpha * t_excl * t_scr[:]
                prec = (jax.lax.Precision.HIGH
                        if variant == "splitmm_acch" else _HI)
                acc_scr[:] += jax.lax.dot_general(
                    colmat, w,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec)
                t_scr[:] *= cp[G_CHUNK - 1:G_CHUNK, :]

        acc = acc_scr[:]
        orow = jax.lax.broadcasted_iota(jnp.int32, (8, P), 0)
        out_ref[0] = jnp.where(orow == 4, t_scr[:], acc)

    return kernel


def run_variant(variant, params, counts, pf, pfs, tiles_x):
    T, NC, R = params.shape[0], params.shape[1], params.shape[2]
    P = pf.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, NC, R, G_CHUNK), lambda t, cnt: (t, 0, 0, 0)),
            pl.BlockSpec((8, P), lambda t, cnt: (0, 0)),
            pl.BlockSpec((KPAD, P), lambda t, cnt: (0, 0)),
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
    )(counts, params, pf, pfs)


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
    pfs = build_pf_split(TILE, TILE)
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

    ref_out = run_variant("hoist", params, counts, pf, pfs, tiles_x)
    for v in ("hoist", "splitmm", "splitmm_acch"):
        try:
            t = chained(
                lambda p, v=v: run_variant(v, p, counts, pf, pfs, tiles_x),
                params)
        except Exception as e:  # noqa: BLE001
            print(f"  {v:14s} FAILED: {str(e).splitlines()[0][:100]}",
                  flush=True)
            continue
        out = run_variant(v, params, counts, pf, pfs, tiles_x)
        err = float(jnp.max(jnp.abs(out - ref_out)))
        print(f"  {v:14s} {t * 1e3:7.3f} ms/view  max|delta|={err:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
