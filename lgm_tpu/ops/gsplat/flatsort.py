"""Flat-sort Pallas Gaussian rasterizer (v4) — tile-grid, transposed layout.

Follows the GPU rasterizer's *logical* structure — duplicate per covered
tile, sort once, contiguous per-tile depth-ordered ranges (ref: the CUDA
backend of core/gs.py; SURVEY.md §2b N1) — with a TPU-native execution
plan that evolved over four versions:

v1 (tiled.py): [T, N] intersection masks; backward scatters — too slow.
v2: scatter-free binning + flat chunk grid; measured compositing cost was
    dominated by Mosaic per-grid-step overhead (2048 steps x ~2.7 us) and
    by degenerate layouts ([P, 8] accumulators use 8 of 128 lanes).
v4 (on top of v3): the kernel input is the RAW per-splat attribute rows
    (x̄, ȳ, conic, op, rgb[, z]) — the gather output itself — and the
    tile-local quadratic coefficients are built INSIDE the kernel from
    the tile origin (derived from program_id). This deletes the XLA-side
    per-slot coefficient pass ([T*MPT, 16] elementwise + transpose) from
    the forward AND its autodiff mirror from the backward: the backward
    kernel chains d(coef) -> d(raw attrs) on the VPU and emits cotangent
    rows already in the scatter's column layout.
v3 (execution plan, still current):
  1. Binning: each active splat emits up to D duplicates, one per covered
     tile; key = tile_id * N + depth_rank; ONE variadic lax.sort groups
     them per tile front-to-back. searchsorted gives per-tile ranges,
     capped at MPT nearest entries. The per-tile layout is *static*:
     slot (t, i) -> sorted entry starts[t] + i, so there is no chunk
     metadata at all — binning is sort + gathers, nothing else.
  2. Compositing: grid = tiles (one step per tile, static output block).
     Everything lives TRANSPOSED: splats on sublanes, pixels on lanes —
     alpha [G, P] from one MXU matmul (8-feature contraction), color
     accumulation contracts over the full 128-splat axis on the MXU, the
     exclusive-transmittance prefix product runs as a 7-step
     Hillis-Steele network along sublanes, and per-pixel state (T, acc)
     is [rows, P] at full lane width. Per-splat opacity is broadcast
     across lanes with an identity-matmul transpose ([1,G] -> [G,1]).
  3. Backward: custom VJP, front-to-back replay using
     suffix_i = U_total - prefix_i (no back-to-front sweep, O(pixels)
     residuals). All reductions land MXU-shaped: d(coef) [8, G],
     d(opacity) [1, G], d(color) [8, G] are direct matmuls in the
     transposed layout.
  4. Per-splat attributes reach the slots via ONE gather whose custom
     VJP is one flat [T*MPT, C] -> [N, C] scatter-add over the
     slot->gaussian map (dead slots map to a zero pad row). Two
     segment-sum replacements were tried and lost end-to-end:
     (a) grouped-by-gaussian cumsum via a 262k-row permute gather, and
     (b) variadic lax.sort carrying the cotangent columns as payloads +
     prefix-sum differencing at rank boundaries (13.6 -> 27.4 ms/view
     fwd+bwd on a v5e) — in isolation each beats the 3.3-3.9 ms
     scatter, but the scatter fuses with its cotangent producer while
     the sort forfeits that fusion. A round-3 sweep of rank-sorted
     alternatives (scripts/microbench_scatter2.py, measured on chip)
     confirms the scatter is at its practical floor: permute+cumsum+
     ends-gather 4.9 ms (the [262k, 9] cumsum alone exceeds the
     scatter), permuted indices_are_sorted scatter 3.76 vs 3.95 ms but
     the forward-side argsort + merge-searchsorted it requires costs
     4.9 ms, and a blocked masked-matmul two-level reduce 6.5 ms (its
     combine step is itself a 262k scatter). The per-index cost of XLA
     scatter on this chip bounds every irregular-reduction formulation;
     further wins must reduce index COUNT, which the static T*MPT slot
     layout fixes by construction.
  5. Grid batching: KPT>1 tiles per Mosaic grid step was measured at
     ~2x SLOWER @512/65k (larger blocks starve the DMA/compute
     pipeline; the per-step overhead is not the bottleneck) — keep one
     tile per step.
  6. Image-layout kernel output (writing (8, th, tw) blocks of the
     final [8, S, S] image instead of [T, 8, P] + XLA transpose) was
     evaluated and rejected: Mosaic cannot shape-cast the [8, P]
     accumulator's lane axis into (th, tw) sublanes x lanes
     ("infer-vector-layout: unsupported shape cast"), and measurement
     shows there is nothing to win — the XLA output transpose fuses to
     0.045 ms/view (channels-first) / 0.10 ms (NHWC) @512/65k.

Capacity is T * MPT slots (MPT = max_per_tile rounded to the 128 lane
width); each splat enumerates 2D candidate cells over the exact per-axis
ellipse AABB, conic-culls provably-zero (splat, tile) pairs, compacts the
survivors, and keeps the first D live tiles in row-major bbox order;
tiles past MPT keep the nearest entries — front-to-back saturation makes
the dropped tail invisible."""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Residuals tagged with this name survive the per-view jax.checkpoint in
# render_views_flatsort (see render_flatsort's checkpoint seam comment).
CKPT_NAME = "gsplat_binned"

from lgm_tpu.ops.gsplat.projection import (
    ALPHA_MAX,
    ALPHA_MIN,
    project_gaussians,
)
from lgm_tpu.ops.gsplat.tiled import (
    G_CHUNK,
    T_EPS,
    _HI,
    _tile_bboxes_xy,
)


class FlatBins(NamedTuple):
    """Static-shape flat binning layout (all int32)."""

    flat_rank: jnp.ndarray    # [T*MPT] depth rank per slot (N = dead pad)
    slot_tile: jnp.ndarray    # [T*MPT] tile id per slot
    counts: jnp.ndarray       # [T] valid entries per tile
    order: jnp.ndarray        # [N] gaussian id per depth rank
    rank: jnp.ndarray         # [N] depth rank per gaussian id


def _flat_binning(proj, tiles_y: int, tiles_x: int, tile_h: int,
                  tile_w: int, dup: int,
                  max_per_tile: int = 1024) -> FlatBins:
    N = proj.mean2d.shape[0]
    D = dup
    T = tiles_y * tiles_x
    G = G_CHUNK
    MPT = max(G, (max_per_tile // G) * G)

    D2 = 2 * D  # candidate cells enumerated before live-cell compaction

    active = proj.valid & (proj.radius > 0)
    order = jnp.argsort(jnp.where(active, proj.depth, jnp.inf)).astype(
        jnp.int32
    )
    rank = jnp.argsort(order).astype(jnp.int32)  # depth rank per gaussian

    # Per-axis AABB of the visibility ellipse (projection computes the
    # exact half-widths) — much tighter than the square lam_max box for
    # anisotropic splats.
    rx = proj.radius_x if proj.radius_x is not None else proj.radius
    ry = proj.radius_y if proj.radius_y is not None else proj.radius
    x0, x1, y0, y1 = _tile_bboxes_xy(
        proj.mean2d, rx, ry, tile_h, tile_w, tiles_y, tiles_x
    )
    w = x1 - x0
    h = y1 - y0
    d = jnp.arange(D2, dtype=jnp.int32)
    wi = jnp.maximum(w, 1)[:, None]
    tx = x0[:, None] + d[None, :] % wi
    ty = y0[:, None] + d[None, :] // wi
    slot_ok = active[:, None] & (d[None, :] < (w * h)[:, None])

    # Exact conic-vs-tile culling: a (splat, tile) pair only contributes
    # if some pixel center passes the kernel's alpha cutoff
    # op*exp(-q/2) >= ALPHA_MIN, i.e. q <= 2(ln op - ln ALPHA_MIN). The
    # continuous min of the PD quadratic q over the tile's pixel-center
    # rect lower-bounds the discrete min, so culling on it is exact: it
    # drops only provably-zero entries (the square 3-sigma bbox wildly
    # overestimates coverage for anisotropic splats). Min over rect =
    # 0 if the mean is inside, else the min over the 4 edges (each a 1D
    # quadratic with closed-form clamped argmin). ~30 flops/candidate.
    A = proj.conic[:, 0:1]
    Bc = proj.conic[:, 1:2]
    C = proj.conic[:, 2:3]
    rx0 = tx.astype(jnp.float32) * tile_w - proj.mean2d[:, 0:1]
    rx1 = rx0 + (tile_w - 1)
    ry0 = ty.astype(jnp.float32) * tile_h - proj.mean2d[:, 1:2]
    ry1 = ry0 + (tile_h - 1)
    A_s = jnp.maximum(A, 1e-8)
    C_s = jnp.maximum(C, 1e-8)

    def _edge_x(e):  # dx fixed at e, dy free in [ry0, ry1]
        dy = jnp.clip(-Bc * e / C_s, ry0, ry1)
        return A * e * e + 2.0 * Bc * e * dy + C * dy * dy

    def _edge_y(e):  # dy fixed at e, dx free in [rx0, rx1]
        dx = jnp.clip(-Bc * e / A_s, rx0, rx1)
        return A * dx * dx + 2.0 * Bc * dx * e + C * e * e

    qmin = jnp.minimum(
        jnp.minimum(_edge_x(rx0), _edge_x(rx1)),
        jnp.minimum(_edge_y(ry0), _edge_y(ry1)),
    )
    inside = (rx0 <= 0) & (0 <= rx1) & (ry0 <= 0) & (0 <= ry1)
    qmin = jnp.where(inside, 0.0, qmin)
    tau = 2.0 * (
        jnp.log(jnp.maximum(proj.opacity[:, None], 1e-12))
        - jnp.log(ALPHA_MIN)
    )
    slot_ok = slot_ok & (qmin <= tau)

    tile_id = ty * tiles_x + tx
    INVALID = jnp.int32(T) * jnp.int32(N)
    key2d = jnp.where(
        slot_ok, tile_id * N + rank[:, None], INVALID
    )  # [N, D2] int32 (requires T*N < 2^31)

    # Live-cell compaction: a row-major bbox walk capped at D slots drops
    # *visible* tiles once the bbox exceeds D cells (an isotropic splat's
    # 3x6-cell box overflows D=16), while the conic test proves many of
    # the candidates dead (ellipse area ~ pi/4 of its AABB). Sorting each
    # row moves live keys to the front — rank is constant per row, so the
    # sort is a stable compaction in tile order — and the first D
    # survivors of 2D candidates are kept. Only splats whose *live* cell
    # count exceeds D still truncate.
    key = jax.lax.sort(key2d, dimension=1)[:, :D].reshape(-1)  # [N*D]

    # Single-operand sort: the sorted key itself encodes everything —
    # tile = key // N, depth rank = key % N. (Carrying an iota payload and
    # gathering it per slot costs ~2 ms/view more: 262k scalar gathers.)
    skeys = jax.lax.sort(key)
    tgrid = jnp.arange(T + 1, dtype=jnp.int32) * N
    bounds = jnp.searchsorted(skeys, tgrid).astype(jnp.int32)  # [T+1]
    starts = bounds[:-1]
    counts = jnp.minimum(bounds[1:] - starts, MPT)

    # Static per-tile layout: slot (t, i) -> sorted entry starts[t] + i.
    # Each tile's entries are CONTIGUOUS in skeys, so this is T dynamic
    # slices (full-lane DMA), not a random gather.
    skeys_pad = jnp.concatenate(
        [skeys, jnp.full((MPT,), INVALID, jnp.int32)]
    )
    keys_t = jax.vmap(
        lambda s: jax.lax.dynamic_slice(skeys_pad, (s,), (MPT,))
    )(starts)                                          # [T, MPT]
    pos = jnp.arange(MPT, dtype=jnp.int32)
    live = pos[None, :] < counts[:, None]
    tvec = jnp.arange(T, dtype=jnp.int32)
    flat_rank = jnp.where(
        live, keys_t - (tvec * N)[:, None], N
    ).reshape(-1).astype(jnp.int32)
    slot_tile = jnp.broadcast_to(tvec[:, None], (T, MPT)).reshape(-1)
    return FlatBins(flat_rank, slot_tile, counts, order, rank)


# ---------------------------------------------------------------------------
# Scatter-free gather with scatter-add backward
# ---------------------------------------------------------------------------


@jax.custom_vjp
def _gather_entries(attrs_pad, flat_rank):
    """attrs_pad [N+1, C] (depth-rank order) -> per-slot attrs
    [T*MPT, C]. Backward is one flat scatter-add back onto the rank rows
    (dead slots carry index N, the zero pad row, and are dropped
    there)."""
    return attrs_pad[flat_rank]


def _ge_fwd(attrs_pad, flat_rank):
    return attrs_pad[flat_rank], (attrs_pad.shape[0], flat_rank)


def _ge_bwd(res, g):
    n_pad, flat_rank = res
    dattrs = jnp.zeros((n_pad, g.shape[1]), g.dtype).at[flat_rank].add(
        g, mode="drop"
    )
    return dattrs, None


_gather_entries.defvjp(_ge_fwd, _ge_bwd)


@jax.custom_vjp
def _permute_rows(x, perm, inv_perm):
    """x[perm] with an exact gather backward (perm is a permutation, so
    the cotangent is just the inverse gather — no scatter)."""
    return x[perm]


def _pr_fwd(x, perm, inv_perm):
    return x[perm], inv_perm


def _pr_bwd(inv_perm, g):
    return g[inv_perm], None, None


_permute_rows.defvjp(_pr_fwd, _pr_bwd)


# ---------------------------------------------------------------------------
# In-kernel helpers (sublane-axis prefix networks; splats live on rows)
# ---------------------------------------------------------------------------


def _row_masks():
    """The 7 static [G, 1] row masks of the Hillis-Steele networks,
    built ONCE per tile (r5): a fresh [G, P] broadcasted_iota + compare
    per shift step was ~12% of the whole fwd kernel
    (scripts/kernelbench_body.py, `hoistmask` variant)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (G_CHUNK, 1), 0)
    return [(s, row < s) for s in (1, 2, 4, 8, 16, 32, 64)]


def _prefix_prod_rows(x, masks):
    """Inclusive prefix product along the 128-row axis (Hillis-Steele).

    Measured-and-rejected alternative (r4, on chip): a lower-triangular
    [G, G] ones MXU contraction (exp(L @ log x) for the product, L @ x
    for the backward's prefix sum) was 60% SLOWER end-to-end —
    composite fwd 28.1 -> 44.9 ms/step, bwd 58.5 -> 90.1 at big-bs2.
    The MXU is not idle in these kernels (alpha + accumulation
    contractions), f32 MXU runs at quarter rate, and the log/exp
    transcendentals cost more VPU than the 7-step shift network they
    replace. The shift network stays."""
    for (s, m) in masks:
        x = x * jnp.where(m, 1.0, pltpu.roll(x, shift=s, axis=0))
    return x


# ---------------------------------------------------------------------------
# Split-K bf16 contractions (r5)
#
# The r4 roofline put the composite kernels at ~20% of their VPU-op
# bound; r5 attribution (scripts/kernelbench_body2.py) found the real
# sink is the MXU: every in-kernel contraction ran f32-HIGHEST (6 bf16
# passes) and the hot ones contract tiny K=8 feature axes the MXU pads
# to 128 lanes (6% utilization x 6 passes). The pixel-feature rows are
# small INTEGERS (x², y², xy <= 961; x, y <= 31; 1) — exactly one or
# two bf16 terms — and an f32 coefficient splits into three bf16 terms
# capturing its full mantissa. Expanding each (coef term x pf term)
# product as its own contraction row turns the rank-6 quadratic into a
# K=27 bf16 DEFAULT matmul: ONE MXU pass (K <= 128 pads regardless),
# f32-faithful to ~4e-7 relative (numpy-validated; on-chip kernel delta
# vs HIGHEST 8.9e-7). Measured: fwd kernel 1.11 -> 0.82 ms/view on the
# bench scene (scripts/kernelbench_body3.py). The same hi/lo idea at
# 16-bit capture (rel ~2^-16) replaces HIGHEST in the backward's
# gradient contractions, where K=8 or M=8 padding made 6-pass f32 cost
# 6-12x its useful work.
# ---------------------------------------------------------------------------

# Per-feature pf term counts for the power split: x², y², xy need two
# exact bf16 terms, x, y, 1 are exact in one.
_PF_TERMS = (2, 2, 2, 1, 1, 1)
_KPAD = 32  # 3 coef terms x sum(_PF_TERMS) = 27 rows, padded to bf16 tile


def _pf_split_t(tile_h: int, tile_w: int) -> jnp.ndarray:
    """[_KPAD, P] bf16 RHS of the split power contraction (static)."""
    pf = _pixel_features_t(tile_h, tile_w)
    rows = []
    for f in range(6):
        if _PF_TERMS[f] == 2:
            hi = pf[f].astype(jnp.bfloat16).astype(jnp.float32)
            terms = [hi, pf[f] - hi]
        else:
            terms = [pf[f]]
        for _ in range(3):  # one copy per coefficient term
            rows.extend(terms)
    rows.extend([jnp.zeros_like(pf[0])] * (_KPAD - len(rows)))
    return jnp.stack(rows, 0).astype(jnp.bfloat16)


def _pf_hilo_t(tile_h: int, tile_w: int) -> jnp.ndarray:
    """[16, P] bf16: rows 0-7 = bf16(pf), rows 8-15 = the exact bf16
    remainder — the backward's dcoef contraction LHS (static)."""
    pf = _pixel_features_t(tile_h, tile_w)
    hi = pf.astype(jnp.bfloat16).astype(jnp.float32)
    return jnp.concatenate([hi, pf - hi], axis=0).astype(jnp.bfloat16)


def _split3_rows(c):
    """[1, G] f32 -> three bf16 terms capturing the full mantissa."""
    t1 = c.astype(jnp.bfloat16).astype(jnp.float32)
    r = c - t1
    t2 = r.astype(jnp.bfloat16).astype(jnp.float32)
    return t1, t2, r - t2


def _hilo(x):
    """bf16 hi/lo pair of an f32 array (16-bit capture, rel ~2^-16)."""
    hi = x.astype(jnp.bfloat16)
    return hi, (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)


def _power_split(pcoef, pfs):
    """power [G, P] from the split-K bf16 contraction (see block
    comment). Row order must match _pf_split_t."""
    rows = []
    for f in range(6):
        for t in _split3_rows(pcoef[f:f + 1]):
            rows.extend([t] * _PF_TERMS[f])
    zeros = jnp.zeros_like(pcoef[0:1])
    rows.extend([zeros] * (_KPAD - len(rows)))
    lhs = jnp.concatenate(rows, axis=0).astype(jnp.bfloat16)
    return jax.lax.dot_general(
        lhs, pfs,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _coef_from_raw(blk, tox, toy, with_depth):
    """Quadratic coefficient + color rows from RAW per-splat attributes.

    ``blk`` [R, G] rows: 0 x̄, 1 ȳ (global px), 2 A, 3 B, 4 C (conic),
    5 op, 6-8 rgb, 9 z (when ``with_depth``). The tile-origin shift
    happens HERE (v4): coefficients were previously built per-slot on the
    XLA side ([T*MPT, 16] elementwise + transpose, ~1 ms/view of glue
    that fused poorly between the binning sort and the kernel); building
    them in-kernel from the raw rows makes the kernel input the gather
    output itself. Tile-LOCAL coordinates (mx = x̄ - tox ≤ tile_w) keep
    the quadratic's terms small — global-coordinate coefficients at 512²
    would cancel catastrophically in f32 (|A·x̄²| up to ~1e6 vs |power|
    ≤ 40).

    Returns (pcoef [8, G] rows c0..c5, op, 0 — matching the pf feature
    rows; colmat [8, G] rows r, g, b, 1, 0, z, 0, 0 — the accumulator
    contraction; mx, my, c3, c4 [1, G] for the backward chain)."""
    mx = blk[0:1] - tox
    my = blk[1:2] - toy
    A, B, C = blk[2:3], blk[3:4], blk[4:5]
    op = blk[5:6]
    c3 = A * mx + B * my
    c4 = C * my + B * mx
    c5 = -(0.5 * A * mx * mx + 0.5 * C * my * my + B * mx * my)
    zeros = jnp.zeros_like(op)
    pcoef = jnp.concatenate(
        [-0.5 * A, -0.5 * C, -B, c3, c4, c5, op, zeros], axis=0
    )
    ones = jnp.ones_like(op)
    z = blk[9:10] if with_depth else zeros
    # Explicit [1, G] rows: a mixed-width concat ([3, G] slice + [1, G]
    # rows) mis-lowers in Mosaic (measured on chip: wrong rgb rows with
    # correct alpha); row-by-row concat lowers correctly.
    colmat = jnp.concatenate(
        [blk[6:7], blk[7:8], blk[8:9], ones, zeros, z, zeros, zeros],
        axis=0,
    )
    return pcoef, colmat, mx, my, c3, c4


def _chunk_alpha_t(pfs, pcoef, eye):
    """Alpha for one [G, P] block in the transposed layout. ``pfs`` is
    the static [_KPAD, P] bf16 split pixel-feature block; ``eye`` is a
    bf16 identity (exactly representable).

    Returns (alpha, one_minus_alpha, araw, power)."""
    power = _power_split(pcoef, pfs)  # [G, P] (f32-faithful, one pass)
    # Opacity is stored as a lane-vector [1, G]; broadcast it across the
    # pixel lanes by an identity-matmul transpose -> [G, 1]. f32-HIGHEST
    # with an exact-bf16-representable identity reconstructs op exactly
    # (hi/mid/lo terms sum back bit-exact); N=1 keeps it cheap. (r5
    # measured-and-rejected: splitting op's three exact terms onto the
    # N axis of one bf16 DEFAULT pass + a 3-lane row sum — the narrow
    # [G, 3] output relayout cost more than the 6-pass matmul saved.)
    op_col = jax.lax.dot_general(
        eye.astype(jnp.float32), pcoef[6:7],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HI,
    )  # [G, 1]
    araw = op_col * jnp.exp(power)
    use = (power <= 0.0) & (araw >= ALPHA_MIN)
    alpha = jnp.where(use, jnp.minimum(araw, ALPHA_MAX), 0.0)
    return alpha, 1.0 - alpha, araw, power


# ---------------------------------------------------------------------------
# Kernels: one grid step per tile, NC static chunks inside
# ---------------------------------------------------------------------------


def _fwd_kernel(cnt_ref, params_ref, pfs_ref, out_ref, t_scr, acc_scr,
                *, tiles_x, tile_w, tile_h, with_depth, kpt=1):
    pid = pl.program_id(0)
    NC = params_ref.shape[1]
    P = pfs_ref.shape[1]
    eye = jnp.eye(G_CHUNK, dtype=jnp.bfloat16)
    masks = _row_masks()
    # kpt tiles per grid step amortize the per-step Mosaic overhead
    # (~3 us/step measured r4 — comparable to the whole per-tile compute
    # on sparse scenes); scratch is reset and reused per tile.
    for j in range(kpt):
        t = pid * kpt + j
        count = cnt_ref[t]
        tox = ((t % tiles_x) * tile_w).astype(jnp.float32)
        toy = ((t // tiles_x) * tile_h).astype(jnp.float32)

        t_scr[:] = jnp.ones((1, P), jnp.float32)
        acc_scr[:] = jnp.zeros((8, P), jnp.float32)

        for k in range(NC):
            live = (k * G_CHUNK < count) & (jnp.max(t_scr[:]) > T_EPS)

            @pl.when(live)
            def _(j=j, k=k, tox=tox, toy=toy):
                pfs = pfs_ref[:]
                blk = params_ref[j, k]
                pcoef, colmat, _, _, _, _ = _coef_from_raw(
                    blk, tox, toy, with_depth)
                alpha, om, _, _ = _chunk_alpha_t(pfs, pcoef, eye)
                cp = _prefix_prod_rows(om, masks)
                t_excl = jnp.where(masks[0][1], 1.0,
                                   pltpu.roll(cp, shift=1, axis=0))
                w = alpha * t_excl * t_scr[:]        # [G, P]
                # Full-width MXU contraction over G, f32-HIGHEST. (r5
                # measured-and-rejected: three bf16 DEFAULT passes over
                # hi/lo splits regressed the fwd kernel 0.49 -> 0.89
                # ms/view — the two [G, P] split casts plus three
                # accumulator adds cost more VPU than the saved MXU
                # passes, unlike the backward's contractions where the
                # same trick wins.)
                acc_scr[:] += jax.lax.dot_general(
                    colmat, w,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=_HI,
                )  # [8, P]
                t_scr[:] *= cp[G_CHUNK - 1:G_CHUNK, :]

        acc = acc_scr[:]
        row = jax.lax.broadcasted_iota(jnp.int32, (8, P), 0)
        out_ref[j] = jnp.where(row == 4, t_scr[:], acc)


def _bwd_kernel(cnt_ref, params_ref, pfs_ref, pf2_ref, fo_ref, go_ref,
                dparams_ref, t_scr, prefu_scr,
                *, tiles_x, tile_w, tile_h, with_depth, kpt=1):
    pid = pl.program_id(0)
    NC = params_ref.shape[1]
    R = params_ref.shape[2]
    P = pfs_ref.shape[1]
    eye = jnp.eye(G_CHUNK, dtype=jnp.bfloat16)
    for j in range(kpt):
        _bwd_tile(cnt_ref, params_ref, pfs_ref, pf2_ref, fo_ref, go_ref,
                  dparams_ref, t_scr, prefu_scr, eye, pid * kpt + j, j,
                  NC, R, P, tiles_x, tile_w, tile_h, with_depth)


def _bwd_tile(cnt_ref, params_ref, pfs_ref, pf2_ref, fo_ref, go_ref,
              dparams_ref, t_scr, prefu_scr, eye, t, j, NC, R, P,
              tiles_x, tile_w, tile_h, with_depth):
    count = cnt_ref[t]
    tox = ((t % tiles_x) * tile_w).astype(jnp.float32)
    toy = ((t // tiles_x) * tile_h).astype(jnp.float32)
    masks = _row_masks()
    # Exact lower-triangular ones (bf16) for the u prefix-sum
    # contraction; built once per tile.
    tri = (jax.lax.broadcasted_iota(jnp.int32, (G_CHUNK, G_CHUNK), 0)
           >= jax.lax.broadcasted_iota(jnp.int32, (G_CHUNK, G_CHUNK), 1)
           ).astype(jnp.bfloat16)

    t_scr[:] = jnp.ones((1, P), jnp.float32)
    prefu_scr[:] = jnp.zeros((1, P), jnp.float32)

    fo = fo_ref[j]
    go = go_ref[j]
    T_final = fo[4:5, :]
    gT = go[4:5, :]
    # U = sum_i s_i w_i over ALL accumulated channels: rgb+alpha (rows
    # 0:4) and depth (row 5). Row 4 is T, handled by the gT term —
    # folded into U_eff here (loop-invariant [1, P]) so the chunk
    # loop's dalpha needs ONE [G, P] division instead of two.
    U_eff = (jnp.sum(go[0:4] * fo[0:4], axis=0, keepdims=True)
             + go[5:6] * fo[5:6] + gT * T_final)  # [1, P]
    # 16-bit hi/lo capture of the output cotangent rows, shared by the
    # chunk loop's s and dcol contractions (loop-invariant; see the
    # split-K block comment — gradients tolerate rel ~2^-16).
    go_hi, go_lo = _hilo(go)

    for k in range(NC):
        live = (k * G_CHUNK < count) & (jnp.max(t_scr[:]) > T_EPS)

        @pl.when(jnp.logical_not(live))
        def _(k=k):
            dparams_ref[j, k] = jnp.zeros((R, G_CHUNK), jnp.float32)

        @pl.when(live)
        def _(k=k):
            pfs = pfs_ref[:]
            blk = params_ref[j, k]
            T = t_scr[:]                   # [1, P]
            prefU = prefu_scr[:]           # [1, P]
            pcoef, colmat, mx, my, c3, c4 = _coef_from_raw(
                blk, tox, toy, with_depth)
            alpha, om, araw, power = _chunk_alpha_t(pfs, pcoef, eye)
            cp = _prefix_prod_rows(om, masks)
            t_excl = jnp.where(masks[0][1], 1.0,
                               pltpu.roll(cp, shift=1, axis=0))
            Ti = t_excl * T                # [G, P]
            w = alpha * Ti

            # s = colmat^T @ go: K=8 at f32-HIGHEST was 6 passes at 6%
            # MXU K-utilization; hi/lo-split both operands and expand
            # the (hi*hi, hi*lo, lo*hi) products as their own K rows ->
            # one bf16 DEFAULT pass, K=24 (pads to 128 anyway).
            cm_hi, cm_lo = _hilo(colmat)
            s_lhs = jnp.concatenate(
                [cm_hi, cm_hi, cm_lo], axis=0)          # [24, G]
            s_rhs = jnp.concatenate(
                [go_hi, go_lo, go_hi], axis=0)          # [24, P]
            s = jax.lax.dot_general(
                s_lhs, s_rhs,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G, P]
            u = s * w
            # Inclusive prefix sum over splat rows as TWO bf16 DEFAULT
            # contractions against an exact lower-triangular ones matrix
            # (r5): K=128 is fully utilized, so this beats the 21-op
            # Hillis-Steele shift network the product scan still needs.
            # (r4 rejected MXU scans at f32-HIGHEST — 6 passes plus
            # log/exp for the PRODUCT scan; the sum scan with split
            # operands has neither cost.)
            u_hi, u_lo = _hilo(u)
            tridims = (((1,), (0,)), ((), ()))
            u_scan = (
                jax.lax.dot_general(
                    tri, u_hi, dimension_numbers=tridims,
                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(
                    tri, u_lo, dimension_numbers=tridims,
                    preferred_element_type=jnp.float32)
            )
            prefU_i = prefU + u_scan

            active = alpha > 0.0
            om_safe = jnp.maximum(om, 1.0 - ALPHA_MAX)
            dalpha = s * Ti - (U_eff - prefU_i) / om_safe
            dalpha = jnp.where(active, dalpha, 0.0)
            unclamped = araw < ALPHA_MAX
            dpower = dalpha * alpha * unclamped

            # dcoef = pf @ dpower^T (contract pixels): M=8 pads to 128,
            # so stacking the pf hi/lo rows on M is free, and stacking
            # the dpower hi/lo halves on N costs one extra 128-block —
            # one bf16 DEFAULT pass replaces 6 HIGHEST passes; the
            # dropped lo*lo term is rel ~2^-16.
            dp_hi, dp_lo = _hilo(dpower)
            pdims = (((1,), (1,)), ((), ()))
            dc_a = jax.lax.dot_general(
                pf2_ref[:], dp_hi, dimension_numbers=pdims,
                preferred_element_type=jnp.float32)  # [16, G]
            dc_b = jax.lax.dot_general(
                pf2_ref[0:8], dp_lo, dimension_numbers=pdims,
                preferred_element_type=jnp.float32)  # [8, G]
            dcoef = dc_a[0:8] + dc_a[8:16] + dc_b
            # [8, G] rows = d/d(c0..c5), rows 6-7 zero (pf rows 6-7)
            # dL/d(op) = sum_p dalpha*e = sum_p dpower / op (alpha = op*e
            # wherever dpower != 0), and sum_p dpower is dcoef's constant-
            # feature row (pf row 5 == 1) — no extra K=P matmul needed.
            # Dead slots have op == 0 and dcoef[5] == 0; the max() guard
            # keeps that 0/0 at zero.
            dc0, dc1, dc2 = dcoef[0:1], dcoef[1:2], dcoef[2:3]
            dc3, dc4, dc5 = dcoef[3:4], dcoef[4:5], dcoef[5:6]
            dop = dc5 / jnp.maximum(pcoef[6:7], 1e-12)  # [1, G]
            # Chain the coefficient cotangents to the RAW attr rows (v4:
            # this chain ran as an XLA elementwise pass over [T*MPT, 16]
            # before; in-kernel it is ~20 VPU ops on [1, G] vectors).
            A, B, C = blk[2:3], blk[3:4], blk[4:5]
            dA = -0.5 * dc0 + mx * dc3 - 0.5 * mx * mx * dc5
            dC = -0.5 * dc1 + my * dc4 - 0.5 * my * my * dc5
            dB = -dc2 + my * dc3 + mx * dc4 - mx * my * dc5
            dx = A * dc3 + B * dc4 - c3 * dc5
            dy = B * dc3 + C * dc4 - c4 * dc5
            # dcol = go @ w^T: same M-pad hi/lo structure (go splits are
            # loop-invariant, hoisted above).
            w_hi, w_lo = _hilo(w)
            dl_a = jax.lax.dot_general(
                go_hi, w_hi, dimension_numbers=pdims,
                preferred_element_type=jnp.float32)  # [8, G]
            dl_b = jax.lax.dot_general(
                go_lo, w_hi, dimension_numbers=pdims,
                preferred_element_type=jnp.float32)
            dl_c = jax.lax.dot_general(
                go_hi, w_lo, dimension_numbers=pdims,
                preferred_element_type=jnp.float32)
            dcol = dl_a + dl_b + dl_c
            # [8, G] (rows 0..3 rgb+alpha, row 5 depth meaningful)
            rows = [dx, dy, dA, dB, dC, dop,
                    dcol[0:1], dcol[1:2], dcol[2:3]]  # explicit [1, G]
            # rows (a mixed-width concat mis-lowers in Mosaic, see
            # _coef_from_raw)
            if with_depth:
                rows.append(dcol[5:6])
            dparams_ref[j, k] = jnp.concatenate(rows, axis=0)  # [R, G]

            prefu_scr[:] = prefU + u_scan[G_CHUNK - 1:G_CHUNK, :]
            t_scr[:] = T * cp[G_CHUNK - 1:G_CHUNK, :]


def _pixel_features_t(tile_h: int, tile_w: int) -> jnp.ndarray:
    """[8, P] per-pixel features in tile-local coords (transposed:
    features on sublanes, pixels on lanes): (x², y², xy, x, y, 1, 0, 0)."""
    ys = jax.lax.broadcasted_iota(jnp.float32, (tile_h, tile_w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (tile_h, tile_w), 1)
    x = xs.reshape(-1)
    y = ys.reshape(-1)
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [x * x, y * y, x * y, x, y, one, zero, zero], axis=0
    )


# Tiles per Mosaic grid step. Swept on chip (r4, bench scene @512/65k):
# cap 1/2/4/8 -> fwd 4.03/4.36/4.14/4.38, fwd+bwd 10.44/12.26/12.29/
# 12.49 ms/view — batching tiles per step LOSES (same verdict as the
# v3-era note: the per-step overhead is not recoverable by unrolling;
# longer steps delay the output-block pipeline). Keep 1; the kpt
# machinery stays (zero-cost at 1, interpret-tested) so the sweep is
# one constant away from re-running on future hardware.
KPT_CAP = 1


def _pick_kpt(T: int) -> int:
    k = 1
    while k * 2 <= KPT_CAP and T % (k * 2) == 0:
        k *= 2
    return k


def _run_fwd(params, counts, pfs, interpret, tiles_x, tile_w, tile_h,
             with_depth):
    T, NC, R = params.shape[0], params.shape[1], params.shape[2]
    P = pfs.shape[1]
    kpt = _pick_kpt(T)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T // kpt,),
        in_specs=[
            pl.BlockSpec((kpt, NC, R, G_CHUNK),
                         lambda t, cnt: (t, 0, 0, 0)),
            pl.BlockSpec((_KPAD, P), lambda t, cnt: (0, 0)),
        ],
        out_specs=pl.BlockSpec((kpt, 8, P), lambda t, cnt: (t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((1, P), jnp.float32),
            pltpu.VMEM((8, P), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _fwd_kernel, tiles_x=tiles_x, tile_w=tile_w, tile_h=tile_h,
        with_depth=with_depth, kpt=kpt,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, 8, P), jnp.float32),
        interpret=interpret,
    )(counts, params, pfs)


def _run_bwd(params, counts, pfs, pf2, fo, go, interpret, tiles_x,
             tile_w, tile_h, with_depth):
    T, NC, R = params.shape[0], params.shape[1], params.shape[2]
    P = pfs.shape[1]
    kpt = _pick_kpt(T)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T // kpt,),
        in_specs=[
            pl.BlockSpec((kpt, NC, R, G_CHUNK),
                         lambda t, cnt: (t, 0, 0, 0)),
            pl.BlockSpec((_KPAD, P), lambda t, cnt: (0, 0)),
            pl.BlockSpec((16, P), lambda t, cnt: (0, 0)),
            pl.BlockSpec((kpt, 8, P), lambda t, cnt: (t, 0, 0)),
            pl.BlockSpec((kpt, 8, P), lambda t, cnt: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((kpt, NC, R, G_CHUNK),
                               lambda t, cnt: (t, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((1, P), jnp.float32),
            pltpu.VMEM((1, P), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _bwd_kernel, tiles_x=tiles_x, tile_w=tile_w, tile_h=tile_h,
        with_depth=with_depth, kpt=kpt,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(params.shape, jnp.float32),
        interpret=interpret,
    )(counts, params, pfs, pf2, fo, go)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _composite_flat(params, counts, pfs, interpret, tiles_x, tile_w,
                    tile_h, with_depth):
    return _run_fwd(params, counts, pfs, interpret, tiles_x, tile_w,
                    tile_h, with_depth)


def _cf_fwd(params, counts, pfs, interpret, tiles_x, tile_w, tile_h,
            with_depth):
    out = _run_fwd(params, counts, pfs, interpret, tiles_x, tile_w,
                   tile_h, with_depth)
    return out, (params, counts, pfs, out)


def _cf_bwd(interpret, tiles_x, tile_w, tile_h, with_depth, res, go):
    params, counts, pfs, fo = res
    dparams = _run_bwd(params, counts, pfs, _pf_hilo_t(tile_h, tile_w),
                       fo, go, interpret, tiles_x, tile_w, tile_h,
                       with_depth)
    return dparams, None, None


_composite_flat.defvjp(_cf_fwd, _cf_bwd)


# ---------------------------------------------------------------------------
# Per-view entry point
# ---------------------------------------------------------------------------


def render_flatsort(
    gaussians: jnp.ndarray,
    view: jnp.ndarray,
    image_size: int,
    tan_half_fov: float,
    bg_color: jnp.ndarray,
    scale_modifier: float = 1.0,
    tile_h: int = 32,
    tile_w: int = 32,
    dup: int = 16,
    max_per_tile: int = 1024,
    interpret: bool = False,
    channels_first: bool = False,
    with_depth: bool = True,
):
    """Render one view via the flat-sort pipeline. Returns
    dict(image [S, S, 3] unclamped, alpha [S, S], and depth [S, S] when
    ``with_depth``); with ``channels_first`` the image is [3, S, S] —
    used by the batched path so the lax.map accumulator and remat
    residuals keep a minor dim of S (a [.., S, S, 3] loop buffer is
    stored (8,128)-tiled on its 3-wide minor dim, a 42x padding blow-up).

    ``with_depth=False`` keeps camera-space z out of the per-slot
    attribute gather (9 instead of 10 columns), shaving ~10% off the
    backward's [T*MPT, C] scatter-add — the training path, which never
    reads depth, uses it."""
    out, counts = _prepare_and_composite(
        gaussians, view, image_size, tan_half_fov, scale_modifier,
        tile_h, tile_w, dup, max_per_tile, interpret, with_depth,
    )
    del counts
    return _pack_output(out, bg_color, image_size, tile_h, tile_w,
                        with_depth, channels_first)


def _prepare_view(gaussians, view, image_size, tan_half_fov,
                  scale_modifier, tile_h, tile_w, dup, max_per_tile,
                  with_depth):
    """Projection + binning + slot gather for one view; returns the
    composite kernel's inputs (params [T, NC, R, G], counts [T]).

    Checkpoint seam: when this stage is wrapped in jax.checkpoint(...,
    policy=save_only_these_names(CKPT_NAME)) (as render_views_flatsort
    does), the four named buffers (~10 MB/view) are the saved residuals,
    and the backward's replay DCEs the whole binning pipeline — the
    depth argsorts, the [N, 2D] candidate compaction sort, the [N*D]
    flat sort, and the slot gather (measured 3.4 ms of the 4.9 ms
    forward @512/65k). The composite kernel deliberately sits OUTSIDE
    the checkpointed region: its custom-VJP fwd rule is opaque to the
    remat machinery, so placing it inside makes the backward re-run the
    forward kernel just to regenerate residuals the policy had already
    saved by name (measured 28 ms/step of pure replay at big-bs2)."""
    S = image_size
    assert S % tile_h == 0 and S % tile_w == 0
    tiles_y, tiles_x = S // tile_h, S // tile_w
    T = tiles_y * tiles_x
    N = gaussians.shape[0]
    assert T * N < 2**31, "int32 sort key space exceeded"
    MPT = max(G_CHUNK, (max_per_tile // G_CHUNK) * G_CHUNK)
    NC = MPT // G_CHUNK

    proj = project_gaussians(gaussians, view, S, tan_half_fov,
                             scale_modifier)
    meta = _flat_binning(
        jax.tree.map(jax.lax.stop_gradient, proj),
        tiles_y, tiles_x, tile_h, tile_w, dup, max_per_tile,
    )
    fr = checkpoint_name(meta.flat_rank, CKPT_NAME)
    counts = checkpoint_name(meta.counts, CKPT_NAME)
    inv_perm = checkpoint_name(meta.rank, CKPT_NAME)

    # Per-gaussian attributes, reordered to depth-rank rows (+ zero pad
    # row), then gathered per slot by rank. With ``with_depth``,
    # camera-space z rides along so the composite can emit the
    # accumulated-depth channel (the reference CUDA fork's extra output;
    # ref: core/gs.py:7-10). The packed block comes CHANNEL-MAJOR from
    # projection (proj.attrs_t) so its cotangent slices [1, N] rows in
    # the natural lane layout — concatenating the [N, k] per-field views
    # here instead costs ~7 ms/step of [N, 1] backward layout copies
    # (traced r4, big-bs2).
    attrs_t = proj.attrs_t
    if with_depth:
        attrs_t = jnp.concatenate([attrs_t, proj.depth[None]], axis=0)
    attrs = attrs_t.T  # [N, 9 or 10]
    attrs = _permute_rows(attrs, meta.order, inv_perm)
    attrs = jnp.concatenate([attrs, jnp.zeros_like(attrs[:1])], axis=0)
    a = _gather_entries(attrs, fr)

    # v4: no per-slot coefficient construction here — the gather output
    # IS the kernel input (raw attr rows; the kernel shifts by the tile
    # origin and builds the quadratic coefficients on the VPU). The only
    # remaining glue between the binning sort and the kernel is the
    # gather itself plus this layout transpose to feature-major rows.
    #
    # params needs NO checkpoint_name: it is the checkpointed REGION'S
    # OUTPUT (render_views_flatsort wraps exactly this function), so it
    # is live for the backward already — naming it as well risks a
    # duplicate saved copy per view (the bs8-small recipe sits at
    # 15.7 of 15.75 GiB). The row-major gather output `a` must still
    # never be a residual ([T*MPT, 9] rows lane-pad 14x to 134 MB/view
    # under (8,128) tiling; the transposed layout stores ~17 MB).
    R = a.shape[1]  # 9, or 10 with depth
    params = a.reshape(T, NC, G_CHUNK, R).transpose(0, 1, 3, 2)
    return params, counts  # [T, NC, R, G], [T]


def _prepare_and_composite(gaussians, view, image_size, tan_half_fov,
                           scale_modifier, tile_h, tile_w, dup,
                           max_per_tile, interpret, with_depth):
    """Single-view prepare + composite (no checkpoint wrapper).
    Returns (out [T, 8, P], counts [T])."""
    params, counts = _prepare_view(
        gaussians, view, image_size, tan_half_fov, scale_modifier,
        tile_h, tile_w, dup, max_per_tile, with_depth,
    )
    tiles_x = image_size // tile_w
    pfs = _pf_split_t(tile_h, tile_w)
    out = _composite_flat(params, counts, pfs, interpret, tiles_x,
                          tile_w, tile_h, with_depth)
    return out, counts


def _pack_output(out, bg_color, image_size, tile_h, tile_w, with_depth,
                 channels_first):
    """[T, 8, P] kernel output -> image/alpha(/depth) dict."""
    S = image_size
    tiles_y, tiles_x = S // tile_h, S // tile_w
    out = out.reshape(tiles_y, tiles_x, 8, tile_h, tile_w)
    if channels_first:
        out = out.transpose(2, 0, 3, 1, 4).reshape(8, S, S)
        rgb, alpha, Tf = out[0:3], out[3], out[4]
        image = rgb + Tf[None] * bg_color[:, None, None]
        result = {"image": image, "alpha": alpha}
        if with_depth:
            result["depth"] = out[5]
        return result
    out = out.transpose(0, 3, 1, 4, 2).reshape(S, S, 8)
    rgb, alpha, Tf = out[..., 0:3], out[..., 3], out[..., 4]
    image = rgb + Tf[..., None] * bg_color[None, None, :]
    result = {"image": image, "alpha": alpha}
    if with_depth:
        result["depth"] = out[..., 5]
    return result


def render_views_flatsort(
    gaussians: jnp.ndarray,
    cam_view: jnp.ndarray,
    image_size: int,
    tan_half_fov: float,
    bg: jnp.ndarray,
    scale_modifier: float = 1.0,
    tile_h: int = 32,
    tile_w: int = 32,
    dup: int = 16,
    max_per_tile: int = 1024,
    interpret: bool = False,
    with_depth: bool = True,
):
    """All [B, V] views, sequential lax.map with rematerialization.

    The map runs over (scene index, view, bg); each body step slices its
    scene's Gaussians out of the closed-over [B, N, 14] array — repeating
    the Gaussians V-fold up front would write B*V*N*14 floats of HBM
    (235 MB at the big preset) before rendering starts.

    Only the prepare stage (projection + binning + gather) is inside the
    jax.checkpoint region; the composite kernel runs OUTSIDE it so its
    custom-VJP residuals (params/counts/output) are saved by the scan
    rather than regenerated by re-running the forward kernel in the
    backward pass (see _prepare_view's seam note; the replay measured
    28 ms/step at big-bs2 — pure waste, since the named policy had
    already saved equal tensors)."""
    B, V = cam_view.shape[:2]
    sidx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), V)
    v_flat = cam_view.reshape(B * V, 4, 4)
    bg_flat = bg.reshape(B * V, 3)
    tiles_x = image_size // tile_w
    pfs = _pf_split_t(tile_h, tile_w)

    @functools.partial(
        jax.checkpoint,
        policy=jax.checkpoint_policies.save_only_these_names(CKPT_NAME),
    )
    def prep(i, v):
        g = jax.lax.dynamic_index_in_dim(gaussians, i, 0, keepdims=False)
        return _prepare_view(
            g, v, image_size, tan_half_fov, scale_modifier,
            tile_h, tile_w, dup, max_per_tile, with_depth,
        )

    def one(args):
        i, v, b = args
        params, counts = prep(i, v)
        o = _composite_flat(params, counts, pfs, interpret, tiles_x,
                            tile_w, tile_h, with_depth)
        return _pack_output(o, b, image_size, tile_h, tile_w,
                            with_depth, channels_first=True)

    out = jax.lax.map(one, (sidx, v_flat, bg_flat))
    # Reshape while still channels-first (a bitcast), THEN transpose to
    # NHWC as the very last op: the transpose output can take XLA's
    # default smart layout (3-dim off-minor). Doing reshape after the
    # transpose forces a row-major [.., 3]-minor copy — 42x padded on
    # TPU ((8,128) tiling over a 3-wide minor dim).
    S = image_size
    image = out["image"].reshape(B, V, 3, S, S).transpose(0, 1, 3, 4, 2)
    result = {
        "image": image,
        "alpha": out["alpha"].reshape(B, V, S, S),
    }
    if with_depth:
        result["depth"] = out["depth"].reshape(B, V, S, S)
    return result
