"""Flat-sort Pallas Gaussian rasterizer (v2) — scatter-free binning.

The v1 pipeline (tiled.py) builds [T, K] per-tile index lists from a
[T, N] intersection mask; its autodiff backward turns the per-tile gather
into scatter-adds, which are pathologically slow on TPU (measured ~20x
the forward). This v2 follows the GPU rasterizer's *logical* structure —
duplicate per covered tile, sort once, contiguous per-tile ranges
(ref: the CUDA backend of core/gs.py; SURVEY.md §2b N1) — but implemented
with only XLA-friendly primitives: elementwise math, two argsorts,
cumsum, searchsorted, gathers, and one flat scatter-add in the backward:

1. Each Gaussian emits up to D duplicate entries, one per covered tile
   (slot d -> tile (x0 + d mod w, y0 + d div w)); entries get the key
   tile_id * N + depth_rank, so one variadic sort groups them by tile in
   depth order (lax.sort on (key, iota) — sorted keys + permutation in
   one pass, no post-sort gather).
2. Per-tile ranges come from searchsorted; each range is capped at
   max_per_tile nearest entries and padded to a multiple of the 128-lane
   chunk (empty tiles keep one chunk), laid out contiguously. The padded
   slot -> sorted entry map is *computed by gather* (searchsorted over
   the offset table), not scattered.
3. Per-entry attributes come from ONE gather; its custom VJP is one flat
   [PAD, C] -> [N, C] scatter-add over the slot->gaussian map (a 262k-row
   scatter-add measures ~6.5 ms on a v5e vs ~20 ms for the
   inverse-permutation gather + dense slot-sum it replaces).
4. The compositing kernel runs a flat chunk grid; scalar-prefetched
   chunk->tile metadata drives the output block index map, so a tile's
   chunks stream through while its accumulators live in scratch.

Compared to v1 this removes the O(T*N) binning mask and the backward
per-tile scatters; capacity is O(min(N*D, T*max_per_tile)) with D = max
covered tiles per splat (overflowing splats keep their first D tiles in
row-major bbox order; tiles beyond max_per_tile keep the nearest ones,
which front-to-back saturation makes invisible)."""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lgm_tpu.ops.gsplat.projection import project_gaussians
from lgm_tpu.ops.gsplat.tiled import (
    G_CHUNK,
    N_ROWS,
    T_EPS,
    _HI,
    _chunk_alpha,
    _pixel_features,
    _prefix_prod_incl,
    _prefix_sum_incl,
    _shift_lanes,
    _tile_bboxes,
)


class FlatBins(NamedTuple):
    """Static-shape flat binning layout (all int32)."""

    flat_gauss: jnp.ndarray   # [PAD] gaussian id per padded slot (N = pad)
    slot_tile: jnp.ndarray    # [PAD] tile id per padded slot
    chunk_tile: jnp.ndarray   # [CAP]
    chunk_local: jnp.ndarray  # [CAP] chunk index within its tile
    chunk_last: jnp.ndarray   # [CAP] 1 if last chunk of its tile
    counts: jnp.ndarray       # [T] valid entries per tile


def _flat_binning(proj, tiles_y: int, tiles_x: int, tile_h: int,
                  tile_w: int, dup: int,
                  max_per_tile: int = 1024) -> FlatBins:
    N = proj.mean2d.shape[0]
    D = dup
    T = tiles_y * tiles_x
    G = G_CHUNK
    # Static chunk capacity: the worst case is bounded both globally
    # (every splat emits D entries) and per tile (entries beyond
    # max_per_tile are dropped — they are depth-sorted, so this keeps the
    # nearest M; with front-to-back saturation at T_EPS anything past a
    # few hundred overlaps is invisible). The per-tile cap is what keeps
    # the compositing grid small: without it every view pays the global
    # worst case in grid steps + DMA even when most chunks are dead.
    MPT = max(G, (max_per_tile // G) * G)
    CAP = min((N * D) // G + T, T * (MPT // G))
    PAD = CAP * G

    active = proj.valid & (proj.radius > 0)
    order = jnp.argsort(jnp.where(active, proj.depth, jnp.inf))
    rank = jnp.argsort(order).astype(jnp.int32)  # depth rank per gaussian

    x0, x1, y0, y1 = _tile_bboxes(
        proj.mean2d, proj.radius, tile_h, tile_w, tiles_y, tiles_x
    )
    w = x1 - x0
    h = y1 - y0
    d = jnp.arange(D, dtype=jnp.int32)
    wi = jnp.maximum(w, 1)[:, None]
    tx = x0[:, None] + d[None, :] % wi
    ty = y0[:, None] + d[None, :] // wi
    slot_ok = active[:, None] & (d[None, :] < (w * h)[:, None])
    tile_id = ty * tiles_x + tx
    INVALID = jnp.int32(T) * jnp.int32(N)
    key = jnp.where(
        slot_ok, tile_id * N + rank[:, None], INVALID
    ).reshape(-1)  # [N*D] int32 (requires T*N < 2^31)

    # One variadic sort yields both the sorted keys and the permutation;
    # `argsort` + `key[sidx]` would pay an extra 1M-element random gather
    # (~7 ms/view on a v5e, slower than the sort itself).
    iota = jnp.arange(key.shape[0], dtype=jnp.int32)
    skeys, sidx = jax.lax.sort((key, iota), num_keys=1)
    tgrid = jnp.arange(T + 1, dtype=jnp.int32) * N
    bounds = jnp.searchsorted(skeys, tgrid).astype(jnp.int32)  # [T+1]
    starts, ends = bounds[:-1], bounds[1:]
    counts = jnp.minimum(ends - starts, MPT)

    pcount = ((jnp.maximum(counts, 1) + G - 1) // G) * G

    # All slot-level index math happens at CHUNK granularity (CAP entries,
    # 128x fewer) and is broadcast across lanes — a PAD-sized searchsorted
    # here costs ~80 ms/view on a v5e.
    nchunks = (pcount // G).astype(jnp.int32)
    cbounds = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(nchunks).astype(jnp.int32)]
    )  # [T+1]
    c = jnp.arange(CAP, dtype=jnp.int32)
    chunk_tile = jnp.clip(
        jnp.searchsorted(cbounds, c, side="right").astype(jnp.int32) - 1,
        0, T - 1,
    )
    chunk_local = c - cbounds[chunk_tile]
    chunk_last = (chunk_local == nchunks[chunk_tile] - 1).astype(jnp.int32)

    lane = jnp.arange(G, dtype=jnp.int32)
    src = (starts[chunk_tile] + chunk_local * G)[:, None] + lane[None, :]
    pos_in_tile = (chunk_local * G)[:, None] + lane[None, :]
    slot_live = (pos_in_tile < counts[chunk_tile][:, None]) & (
        src < N * D
    )
    entry = jnp.where(slot_live, sidx[jnp.clip(src, 0, N * D - 1)], 0)
    flat_gauss = jnp.where(slot_live, entry // D, N).reshape(-1).astype(
        jnp.int32
    )
    slot_tile = jnp.broadcast_to(
        chunk_tile[:, None], (CAP, G)
    ).reshape(-1)

    return FlatBins(flat_gauss, slot_tile, chunk_tile,
                    chunk_local, chunk_last, counts)


# ---------------------------------------------------------------------------
# Scatter-free gather with permutation backward
# ---------------------------------------------------------------------------


@jax.custom_vjp
def _gather_entries(attrs_pad, flat_gauss):
    """attrs_pad [N+1, C] -> per-slot attrs [PAD, C]. Backward is one flat
    scatter-add back onto the gaussians (dead slots carry index N, the
    zero pad row, and are dropped there)."""
    return attrs_pad[flat_gauss]


def _ge_fwd(attrs_pad, flat_gauss):
    return attrs_pad[flat_gauss], (attrs_pad.shape[0], flat_gauss)


def _ge_bwd(res, g):
    n_pad, flat_gauss = res
    dattrs = jnp.zeros((n_pad, g.shape[1]), g.dtype).at[flat_gauss].add(
        g, mode="drop"
    )
    return dattrs, None


_gather_entries.defvjp(_ge_fwd, _ge_bwd)


# ---------------------------------------------------------------------------
# Kernels (flat chunk grid)
# ---------------------------------------------------------------------------


def _fwd_kernel(ct_ref, cl_ref, cla_ref, cnt_ref, params_ref, pf_ref,
                out_ref, t_scr, acc_scr):
    c = pl.program_id(0)
    t = ct_ref[c]
    local = cl_ref[c]
    count = cnt_ref[t]
    P = pf_ref.shape[0]

    @pl.when(local == 0)
    def _():
        t_scr[:] = jnp.ones((P, 1), jnp.float32)
        acc_scr[:] = jnp.zeros((P, 8), jnp.float32)

    live = (local * G_CHUNK < count) & (jnp.max(t_scr[:]) > T_EPS)

    @pl.when(live)
    def _():
        pf = pf_ref[:]
        blk = params_ref[0]
        alpha, om, _, _ = _chunk_alpha(pf, blk)
        cp = _prefix_prod_incl(om)
        t_excl = _shift_lanes(cp, 1, 1.0)
        w = alpha * t_excl * t_scr[:]
        acc_scr[:] += jax.lax.dot_general(
            w, blk[8:16], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI,
        )
        t_scr[:] *= cp[:, G_CHUNK - 1:G_CHUNK]

    @pl.when(cla_ref[c] == 1)
    def _():
        col = jax.lax.broadcasted_iota(jnp.int32, (P, 8), 1)
        out_ref[0] = jnp.where(col == 4, t_scr[:], acc_scr[:])


def _bwd_kernel(ct_ref, cl_ref, cla_ref, cnt_ref, params_ref, pf_ref,
                fo_ref, go_ref, dparams_ref, t_scr, prefu_scr):
    c = pl.program_id(0)
    t = ct_ref[c]
    local = cl_ref[c]
    count = cnt_ref[t]
    P = pf_ref.shape[0]

    @pl.when(local == 0)
    def _():
        t_scr[:] = jnp.ones((P, 1), jnp.float32)
        prefu_scr[:] = jnp.zeros((P, 1), jnp.float32)

    live = (local * G_CHUNK < count) & (jnp.max(t_scr[:]) > T_EPS)

    @pl.when(jnp.logical_not(live))
    def _():
        dparams_ref[0] = jnp.zeros(dparams_ref.shape[1:],
                                   dparams_ref.dtype)

    @pl.when(live)
    def _():
        pf = pf_ref[:]
        blk = params_ref[0]
        fo = fo_ref[0]
        go = go_ref[0]
        T_final = fo[:, 4:5]
        gT = go[:, 4:5]
        U_total = jnp.sum(go[:, 0:4] * fo[:, 0:4], axis=1, keepdims=True)

        T = t_scr[:]
        prefU = prefu_scr[:]
        alpha, om, araw, power = _chunk_alpha(pf, blk)
        cp = _prefix_prod_incl(om)
        t_excl = _shift_lanes(cp, 1, 1.0)
        Ti = t_excl * T
        w = alpha * Ti

        s = jax.lax.dot_general(
            go, blk[8:16], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI,
        )
        u = s * w
        u_scan = _prefix_sum_incl(u)
        prefU_i = prefU + u_scan

        active = alpha > 0.0
        om_safe = jnp.maximum(om, 1.0 - 0.99)
        dalpha = (s * Ti - (U_total - prefU_i) / om_safe
                  - gT * T_final / om_safe)
        dalpha = jnp.where(active, dalpha, 0.0)
        unclamped = araw < 0.99
        dpower = dalpha * alpha * unclamped

        dcoef = jax.lax.dot_general(
            pf, dpower, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI,
        )
        e = jnp.where(active & unclamped, jnp.exp(power), 0.0)
        dop = jnp.sum(dalpha * e, axis=0, keepdims=True)
        dcol = jax.lax.dot_general(
            go, w, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI,
        )

        row = jax.lax.broadcasted_iota(jnp.int32, (N_ROWS, G_CHUNK), 0)
        dblk = jnp.where(
            row < 6,
            jnp.concatenate([dcoef, jnp.zeros_like(dcoef)], axis=0), 0.0,
        )
        dblk = jnp.where(row == 6, jnp.broadcast_to(dop, dblk.shape), dblk)
        dcol_sh = jnp.concatenate(
            [jnp.zeros((8, G_CHUNK), jnp.float32), dcol], axis=0
        )
        dblk = jnp.where((row >= 8) & (row <= 10), dcol_sh, dblk)
        dparams_ref[0] = dblk

        prefu_scr[:] = prefU + u_scan[:, G_CHUNK - 1:G_CHUNK]
        t_scr[:] = T * cp[:, G_CHUNK - 1:G_CHUNK]


def _imap_params(c, ct, cl, cla, cnt):
    return (c, 0, 0)


def _imap_pf(c, ct, cl, cla, cnt):
    return (0, 0)


def _imap_tileout(c, ct, cl, cla, cnt):
    return (ct[c], 0, 0)


def _run_fwd(params_flat, meta: FlatBins, pf, n_tiles, interpret):
    CAP = params_flat.shape[0]
    P = pf.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(CAP,),
        in_specs=[
            pl.BlockSpec((1, N_ROWS, G_CHUNK), _imap_params),
            pl.BlockSpec((P, 8), _imap_pf),
        ],
        out_specs=pl.BlockSpec((1, P, 8), _imap_tileout),
        scratch_shapes=[
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.VMEM((P, 8), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _fwd_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, P, 8), jnp.float32),
        interpret=interpret,
    )(meta.chunk_tile, meta.chunk_local, meta.chunk_last, meta.counts,
      params_flat, pf)


def _run_bwd(params_flat, meta: FlatBins, pf, fo, go, interpret):
    CAP = params_flat.shape[0]
    P = pf.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(CAP,),
        in_specs=[
            pl.BlockSpec((1, N_ROWS, G_CHUNK), _imap_params),
            pl.BlockSpec((P, 8), _imap_pf),
            pl.BlockSpec((1, P, 8), _imap_tileout),
            pl.BlockSpec((1, P, 8), _imap_tileout),
        ],
        out_specs=pl.BlockSpec((1, N_ROWS, G_CHUNK), _imap_params),
        scratch_shapes=[
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.VMEM((P, 1), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _bwd_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(params_flat.shape, jnp.float32),
        interpret=interpret,
    )(meta.chunk_tile, meta.chunk_local, meta.chunk_last, meta.counts,
      params_flat, pf, fo, go)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _composite_flat(params_flat, meta: FlatBins, pf, n_tiles, interpret):
    return _run_fwd(params_flat, meta, pf, n_tiles, interpret)


def _cf_fwd(params_flat, meta, pf, n_tiles, interpret):
    out = _run_fwd(params_flat, meta, pf, n_tiles, interpret)
    return out, (params_flat, meta, pf, out)


def _cf_bwd(n_tiles, interpret, res, go):
    params_flat, meta, pf, fo = res
    dparams = _run_bwd(params_flat, meta, pf, fo, go, interpret)
    return dparams, FlatBins(*([None] * len(meta))), None


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
):
    """Render one view via the flat-sort pipeline. Returns
    dict(image [S, S, 3] unclamped, alpha [S, S])."""
    S = image_size
    assert S % tile_h == 0 and S % tile_w == 0
    tiles_y, tiles_x = S // tile_h, S // tile_w
    T = tiles_y * tiles_x
    N = gaussians.shape[0]
    assert T * N < 2**31, "int32 sort key space exceeded"

    proj = project_gaussians(gaussians, view, S, tan_half_fov,
                             scale_modifier)
    meta = _flat_binning(
        jax.tree.map(jax.lax.stop_gradient, proj),
        tiles_y, tiles_x, tile_h, tile_w, dup, max_per_tile,
    )

    # Per-gaussian attributes (+ zero pad row), gathered per slot.
    attrs = jnp.concatenate(
        [proj.mean2d, proj.conic, proj.opacity[:, None], proj.color],
        axis=1,
    )  # [N, 9]
    attrs = jnp.concatenate([attrs, jnp.zeros_like(attrs[:1])], axis=0)
    a = _gather_entries(attrs, meta.flat_gauss)

    # Tile-local coefficient construction (elementwise, autodiff).
    torig_x = (meta.slot_tile % tiles_x).astype(jnp.float32) * tile_w
    torig_y = (meta.slot_tile // tiles_x).astype(jnp.float32) * tile_h
    mx = a[:, 0] - torig_x
    my = a[:, 1] - torig_y
    A, B, C = a[:, 2], a[:, 3], a[:, 4]
    op = a[:, 5]
    ones = jnp.where(meta.flat_gauss < N, 1.0, 0.0)
    zeros = jnp.zeros_like(op)
    rows = [
        -0.5 * A, -0.5 * C, -B,
        A * mx + B * my, C * my + B * mx,
        -(0.5 * A * mx * mx + 0.5 * C * my * my + B * mx * my),
        op, zeros, a[:, 6], a[:, 7], a[:, 8], ones,
        zeros, zeros, zeros, zeros,
    ]
    params_flat = jnp.stack(rows, axis=-1)           # [PAD, 16]
    CAP = params_flat.shape[0] // G_CHUNK
    params_flat = params_flat.reshape(CAP, G_CHUNK, N_ROWS).transpose(
        0, 2, 1
    )  # [CAP, 16, G]

    pf = _pixel_features(tile_h, tile_w)
    out = _composite_flat(params_flat, meta, pf, T, interpret)

    out = out.reshape(tiles_y, tiles_x, tile_h, tile_w, 8)
    out = out.transpose(0, 2, 1, 3, 4).reshape(S, S, 8)
    rgb, alpha, Tf = out[..., 0:3], out[..., 3], out[..., 4]
    image = rgb + Tf[..., None] * bg_color[None, None, :]
    return {"image": image, "alpha": alpha}


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
):
    """All [B, V] views, sequential lax.map with rematerialization."""
    B, V = cam_view.shape[:2]
    g_flat = jnp.repeat(gaussians, V, axis=0)
    v_flat = cam_view.reshape(B * V, 4, 4)
    bg_flat = bg.reshape(B * V, 3)

    @jax.checkpoint
    def one(args):
        g, v, b = args
        return render_flatsort(
            g, v, image_size, tan_half_fov, b, scale_modifier,
            tile_h, tile_w, dup, max_per_tile, interpret,
        )

    out = jax.lax.map(one, (g_flat, v_flat, bg_flat))
    return {
        "image": out["image"].reshape(B, V, image_size, image_size, 3),
        "alpha": out["alpha"].reshape(B, V, image_size, image_size),
    }
