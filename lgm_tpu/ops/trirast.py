"""Differentiable triangle rasterization in pure XLA (nvdiffrast equiv).

TPU-native replacement for nvdiffrast's rasterize/interpolate/texture used
by the mesh-fitting stages (ref: convert.py:82-85,239-254,382-384;
SURVEY.md §2b N3). Same split as nvdiffrast:

1. ``rasterize``: hard visibility — per pixel the nearest covering face id.
   Non-differentiable (gradients flow through interpolation, exactly as in
   nvdiffrast's design). Implemented tile-binned like the Gaussian
   rasterizer: faces are binned to screen tiles (static caps), each tile
   z-resolves its candidates with dense [pixels x faces] edge tests.
2. ``interpolate``: differentiable perspective-correct barycentric
   interpolation of vertex attributes at the rasterized faces.
3. ``texture``: differentiable bilinear texture sampling.

Antialiasing is approximated by the caller via silhouette-mask supervision
(the reference's antialias call mainly smooths silhouette gradients).

Clip-space convention matches the renderer: clip = [x, y, z, w] with
pixel = ((x/w) * 0.5 + 0.5) * S - 0.5 and w > 0 in front of the camera.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def project_vertices(verts: jnp.ndarray, view_proj: jnp.ndarray):
    """verts [V, 3] x transposed view-proj [4, 4] (reference layout,
    row-vector convention) -> clip [V, 4]."""
    homo = jnp.concatenate([verts, jnp.ones_like(verts[:, :1])], axis=1)
    return jnp.matmul(homo, view_proj, precision=_HI)


def rasterize(
    clip: jnp.ndarray,
    faces: jnp.ndarray,
    image_size: int,
    tile: int = 32,
    max_faces_per_tile: int = 1024,
    tile_chunk: int = 16,
):
    """Hard rasterization.

    Args:
      clip: [V, 4] clip-space vertices.
      faces: [F, 3] int32.
    Returns dict(face_id [S, S] int32 (-1 = background),
                 bary [S, S, 3] screen-space barycentrics (non-diff)).
    """
    S = image_size
    assert S % tile == 0
    nt = S // tile
    F = faces.shape[0]

    w = clip[:, 3:4]
    w_safe = jnp.where(jnp.abs(w) < 1e-8, 1e-8, w)
    ndc = clip[:, :3] / w_safe
    px = (ndc[:, 0] * 0.5 + 0.5) * S - 0.5
    py = (ndc[:, 1] * 0.5 + 0.5) * S - 0.5
    pz = ndc[:, 2]

    v0, v1, v2 = faces[:, 0], faces[:, 1], faces[:, 2]
    x0, y0 = px[v0], py[v0]
    x1, y1 = px[v1], py[v1]
    x2, y2 = px[v2], py[v2]
    valid = (w[v0, 0] > 1e-6) & (w[v1, 0] > 1e-6) & (w[v2, 0] > 1e-6)

    # Tile binning by face screen bbox.
    fx0 = jnp.clip(jnp.floor(jnp.minimum(jnp.minimum(x0, x1), x2) / tile),
                   0, nt).astype(jnp.int32)
    fx1 = jnp.clip(jnp.floor(jnp.maximum(jnp.maximum(x0, x1), x2) / tile)
                   + 1, 0, nt).astype(jnp.int32)
    fy0 = jnp.clip(jnp.floor(jnp.minimum(jnp.minimum(y0, y1), y2) / tile),
                   0, nt).astype(jnp.int32)
    fy1 = jnp.clip(jnp.floor(jnp.maximum(jnp.maximum(y0, y1), y2) / tile)
                   + 1, 0, nt).astype(jnp.int32)

    T = nt * nt
    tids = jnp.arange(T, dtype=jnp.int32)

    def bin_chunk(tid_chunk):
        tx = (tid_chunk % nt)[:, None]
        ty = (tid_chunk // nt)[:, None]
        m = (valid[None, :] & (fx0[None] <= tx) & (tx < fx1[None])
             & (fy0[None] <= ty) & (ty < fy1[None]))
        idx = jax.vmap(
            lambda mm: jnp.nonzero(mm, size=max_faces_per_tile,
                                   fill_value=F)[0]
        )(m)
        return idx.astype(jnp.int32)

    pad = (-T) % tile_chunk
    idx = jax.lax.map(
        bin_chunk, jnp.pad(tids, (0, pad)).reshape(-1, tile_chunk)
    ).reshape(-1, max_faces_per_tile)[:T]

    # Padded face entry -> degenerate (never covers, infinite depth).
    pad1 = lambda a, val: jnp.concatenate(
        [a, jnp.full_like(a[:1], val)], axis=0
    )
    fx = jnp.stack([pad1(x0, 0.0), pad1(x1, 0.0), pad1(x2, 0.0)], -1)[idx]
    fy = jnp.stack([pad1(y0, 0.0), pad1(y1, 0.0), pad1(y2, 0.0)], -1)[idx]
    fz = jnp.stack([pad1(pz[v0], jnp.inf), pad1(pz[v1], jnp.inf),
                    pad1(pz[v2], jnp.inf)], -1)[idx]  # [T, K, 3]

    ys = (jnp.arange(tile, dtype=jnp.float32))
    gy, gx = jnp.meshgrid(ys, ys, indexing="ij")
    P = tile * tile

    def resolve_tile(args):
        t_idx, tfx, tfy, tfz = args
        tx = (t_idx % nt).astype(jnp.float32) * tile
        ty = (t_idx // nt).astype(jnp.float32) * tile
        pxs = (gx + tx).reshape(P)[:, None]  # [P, 1]
        pys = (gy + ty).reshape(P)[:, None]
        ax, bx, cx = tfx[:, 0][None], tfx[:, 1][None], tfx[:, 2][None]
        ay, by, cy = tfy[:, 0][None], tfy[:, 1][None], tfy[:, 2][None]
        # Edge functions.
        e0 = (bx - ax) * (pys - ay) - (by - ay) * (pxs - ax)
        e1 = (cx - bx) * (pys - by) - (cy - by) * (pxs - bx)
        e2 = (ax - cx) * (pys - cy) - (ay - cy) * (pxs - cx)
        area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
        inside = (
            ((e0 >= 0) & (e1 >= 0) & (e2 >= 0) & (area > 1e-12))
            | ((e0 <= 0) & (e1 <= 0) & (e2 <= 0) & (area < -1e-12))
        )  # [P, K] — both windings rasterized
        area_safe = jnp.where(jnp.abs(area) < 1e-12, 1.0, area)
        b0 = e1 / area_safe
        b1 = e2 / area_safe
        b2 = e0 / area_safe
        z = b0 * tfz[None, :, 0] + b1 * tfz[None, :, 1] + b2 * tfz[None, :, 2]
        z = jnp.where(inside, z, jnp.inf)
        best = jnp.argmin(z, axis=1)  # [P]
        hit = jnp.isfinite(jnp.min(z, axis=1))
        take = lambda a: jnp.take_along_axis(a, best[:, None], 1)[:, 0]
        bary = jnp.stack([take(b0), take(b1), take(b2)], axis=-1)
        return (
            jnp.where(hit, best, -1).astype(jnp.int32),
            jnp.where(hit[:, None], bary, 0.0),
        )

    local, bary = jax.lax.map(
        resolve_tile, (tids, fx, fy, fz)
    )  # [T, P], [T, P, 3]
    # Local candidate index -> global face id.
    face_id = jnp.where(
        local >= 0,
        jnp.take_along_axis(
            idx, jnp.maximum(local, 0), axis=1
        ),
        -1,
    )
    face_id = jnp.where(face_id >= F, -1, face_id)

    def detile(a):
        shp = (nt, nt, tile, tile) + a.shape[2:]
        return a.reshape(shp).transpose(
            (0, 2, 1, 3) + tuple(range(4, a.ndim + 2))
        ).reshape((S, S) + a.shape[2:])

    return {"face_id": detile(face_id), "bary": detile(bary)}


def interpolate(
    attrs: jnp.ndarray,
    faces: jnp.ndarray,
    face_id: jnp.ndarray,
    verts: jnp.ndarray,
    view_proj: jnp.ndarray,
    image_size: int,
):
    """Differentiable perspective-correct attribute interpolation.

    Recomputes barycentrics analytically from the (fixed) face ids so
    gradients flow into ``verts`` and ``attrs`` (nvdiffrast's
    rasterize-then-interpolate contract).

    attrs [V, C] -> out [S, S, C]; background pixels get zeros.
    Also returns the hit mask [S, S].
    """
    S = image_size
    clip = project_vertices(verts, view_proj)
    w = clip[:, 3:4]
    w_safe = jnp.where(jnp.abs(w) < 1e-8, 1e-8, w)
    ndc = clip[:, :3] / w_safe
    px = (ndc[:, 0] * 0.5 + 0.5) * S - 0.5
    py = (ndc[:, 1] * 0.5 + 0.5) * S - 0.5

    fid = jnp.maximum(face_id, 0)
    tri = faces[fid]  # [S, S, 3]
    ax, ay, aw = px[tri[..., 0]], py[tri[..., 0]], w_safe[tri[..., 0], 0]
    bx, by, bw = px[tri[..., 1]], py[tri[..., 1]], w_safe[tri[..., 1], 0]
    cx, cy, cw = px[tri[..., 2]], py[tri[..., 2]], w_safe[tri[..., 2], 0]

    ys = jnp.arange(S, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, ys, indexing="ij")

    e0 = (bx - ax) * (gy - ay) - (by - ay) * (gx - ax)
    e1 = (cx - bx) * (gy - by) - (cy - by) * (gx - bx)
    e2 = (ax - cx) * (gy - cy) - (ay - cy) * (gx - cx)
    area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    area = jnp.where(jnp.abs(area) < 1e-12, 1e-12, area)
    b0, b1, b2 = e1 / area, e2 / area, e0 / area

    # Perspective correction: weight screen barycentrics by 1/w.
    q0, q1, q2 = b0 / aw, b1 / bw, b2 / cw
    qs = q0 + q1 + q2
    qs = jnp.where(jnp.abs(qs) < 1e-12, 1e-12, qs)
    p0, p1, p2 = q0 / qs, q1 / qs, q2 / qs

    out = (
        p0[..., None] * attrs[tri[..., 0]]
        + p1[..., None] * attrs[tri[..., 1]]
        + p2[..., None] * attrs[tri[..., 2]]
    )
    mask = face_id >= 0
    return jnp.where(mask[..., None], out, 0.0), mask


def texture(tex: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Differentiable bilinear sampling: tex [H, W, C], uv [..., 2] in
    [0, 1] -> [..., C] (clamped addressing)."""
    H, W = tex.shape[:2]
    x = jnp.clip(uv[..., 0] * W - 0.5, 0.0, W - 1.0)
    y = jnp.clip(uv[..., 1] * H - 0.5, 0.0, H - 1.0)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    t00 = tex[y0, x0]
    t01 = tex[y0, x0 + 1]
    t10 = tex[y0 + 1, x0]
    t11 = tex[y0 + 1, x0 + 1]
    return (
        t00 * (1 - wx) * (1 - wy) + t01 * wx * (1 - wy)
        + t10 * (1 - wx) * wy + t11 * wx * wy
    )


def render_mesh(
    verts: jnp.ndarray,
    faces: jnp.ndarray,
    attrs: jnp.ndarray,
    view_proj: jnp.ndarray,
    image_size: int,
    max_faces_per_tile: int = 1024,
):
    """rasterize + interpolate in one call. Returns (out [S,S,C], mask)."""
    clip = project_vertices(jax.lax.stop_gradient(verts), view_proj)
    rast = rasterize(clip, faces, image_size,
                     max_faces_per_tile=max_faces_per_tile)
    return interpolate(attrs, faces, rast["face_id"], verts, view_proj,
                       image_size)
