"""Gaussians -> NeRF -> textured mesh conversion (reference convert.py).

Three-stage distillation matching the reference pipeline
(ref: convert.py:61-462), rebuilt on TPU-native ops:

1. ``fit_nerf``: fit a hash-grid NeRF (ops/hashgrid + MLP heads) to random
   orbit renders of the Gaussians produced by our own splat renderer
   (teacher), via the occupancy-grid ray marcher (ops/raymarch)
   (ref: convert.py:131-224).
2. ``fit_mesh``: extract a density isosurface with the native marching
   tetrahedra (native/meshops.cpp), clean + decimate to the face target,
   then optimize per-vertex offsets against the Gaussian renders through
   the differentiable triangle rasterizer (ops/trirast) with Laplacian and
   offset regularizers (ref: convert.py:263-361; periodic remeshing is
   replaced by the stronger Laplacian term).
3. ``fit_mesh_uv``: chart-based UV unwrap (xatlas replacement: native
   normal-coherent chart growing + per-chart plane projection + shelf
   packing in native/meshops.cpp, with a 6-way box-projection fallback
   when the native library is unavailable), bake albedo from the NeRF
   color field, then optimize the texture against front-biased Gaussian
   renders (ref: convert.py:364-442).

Export: binary glTF (.glb) with embedded PNG texture, plus .obj fallback.

Run: python -m lgm_tpu.convert big --test-path model.ply
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Optional, Tuple

import numpy as np

from lgm_tpu.config import CONFIGS, Options
from lgm_tpu.utils import camera


def mixture_field(gaussians, pts, density_scale: float = 30.0):
    """Analytic density/color of the 3D Gaussian mixture at points.

    Not in the reference (which distills through renders only,
    convert.py:186-224): direct 3D supervision from the mixture makes the
    NeRF stage converge an order of magnitude faster and pins density
    where splats actually are. pts [M, 3] -> (sigma [M], rgb [M, 3],
    weight-sum [M])."""
    import jax.numpy as jnp

    from lgm_tpu.ops.gsplat.projection import quat_to_rotmat

    pos = gaussians[:, 0:3]
    op = gaussians[:, 3]
    scl = jnp.maximum(gaussians[:, 4:7], 1e-4)
    quat = gaussians[:, 7:11]
    col = gaussians[:, 11:14]
    # Normalize locally: the analytic density needs an orthonormal frame
    # so that it matches the rendered covariance R S S^T R^T for
    # arbitrary-norm quats (the renderer itself uses raw quats for
    # reference parity, but trained-checkpoint quats are near-zero and
    # their R ~ I either way — here exactness is cheap, so take it).
    quat = quat / jnp.maximum(
        jnp.linalg.norm(quat, axis=-1, keepdims=True), 1e-8
    )
    R = quat_to_rotmat(quat)  # [N, 3, 3]

    d = pts[:, None, :] - pos[None, :, :]          # [M, N, 3]
    local = jnp.einsum("mnj,njk->mnk", d, R)       # into gaussian frame
    q = jnp.sum((local / scl[None]) ** 2, axis=-1)  # [M, N]
    w = op[None] * jnp.exp(-0.5 * q)               # [M, N]
    wsum = jnp.sum(w, axis=1)
    rgb = (w @ col) / jnp.maximum(wsum[:, None], 1e-6)
    return density_scale * wsum, rgb, wsum


def _orbit_pose(rng, radius, front_bias=False):
    if front_bias and rng.random() < 0.5:
        el = rng.uniform(-30, 30)
        az = rng.uniform(-60, 60)
    else:
        el = rng.uniform(-60, 60)
        az = rng.uniform(0, 360)
    return camera.orbit_camera(el, az, radius)


class Converter:
    def __init__(self, opt: Options, gaussians: np.ndarray,
                 seed: int = 0):
        import jax

        self.opt = opt
        self.gaussians = np.asarray(gaussians, np.float32)
        self.rng = np.random.default_rng(seed)
        self.tan = float(np.tan(0.5 * np.deg2rad(opt.fovy)))
        self.key = jax.random.PRNGKey(seed)

        self.nerf_params = None
        self.grid = None
        self.verts = None
        self.faces = None
        self.uv = None
        self.texture = None

    # ------------------------------------------------------------------
    # Teacher: Gaussian renders
    # ------------------------------------------------------------------

    def render_gs(self, pose: np.ndarray, size: int):
        """One teacher view: rgb [S, S, 3] on white bg + alpha [S, S]
        (ref: convert.py:106-120). The render is jitted per size and
        reused across the hundreds of fit iterations (eager dispatch
        through the remote-TPU tunnel costs ~1 s/frame)."""
        import jax
        import jax.numpy as jnp

        from lgm_tpu.ops.gsplat import render_views

        if not hasattr(self, "_render_jit"):
            self._render_jit = {}
        if size not in self._render_jit:
            self._render_jit[size] = jax.jit(
                lambda g, v: render_views(g, v, size, self.tan, dup=32)
            )
        cams = camera.build_camera_inputs(pose[None], self.opt.fovy,
                                          self.opt.znear, self.opt.zfar)
        out = self._render_jit[size](
            jnp.asarray(self.gaussians)[None],
            jnp.asarray(cams["cam_view"])[None],
        )
        return (np.asarray(out["image"][0, 0]),
                np.asarray(out["alpha"][0, 0, :, :, 0]),
                np.asarray(cams["cam_view_proj"][0]))

    # ------------------------------------------------------------------
    # Stage 1: NeRF distillation
    # ------------------------------------------------------------------

    def _field_model(self):
        import flax.linen as nn
        import jax.numpy as jnp

        from lgm_tpu.ops.hashgrid import HashGridEncoder

        class Field(nn.Module):
            @nn.compact
            def __call__(self, pts, dirs=None):
                # pts in [-1, 1] -> [0, 1]
                x = (pts + 1.0) * 0.5
                h = HashGridEncoder(
                    num_levels=12, features=2, log2_table_size=17,
                    base_resolution=16, max_resolution=512, name="grid",
                )(x)
                h = nn.Dense(64, name="mlp1")(h)
                h = nn.relu(h)
                h = nn.Dense(4, name="mlp2")(h)
                sigma = jnp.exp(jnp.clip(h[:, 0], -10, 10))
                rgb = nn.sigmoid(h[:, 1:4])
                return sigma, rgb

        return Field()

    def fit_nerf(self, iters: int = 512, resolution: int = 128,
                 lr: float = 1e-2, log_every: int = 128):
        """(ref: convert.py:186-224)"""
        import jax
        import jax.numpy as jnp
        import optax

        from lgm_tpu.ops.raymarch import OccupancyGrid, render_rays

        field = self._field_model()
        params = field.init(self.key, jnp.zeros((8, 3)))["params"]
        grid = OccupancyGrid.dense(64, aabb=1.0)
        tx = optax.adam(lr)
        opt_state = tx.init(params)

        gaussians = jnp.asarray(self.gaussians)

        @jax.jit
        def step(params, opt_state, grid, rays_o, rays_d, gt_rgb, gt_a,
                 pts3d, key):
            # Direct 3D mixture distillation targets (see mixture_field).
            sig_gt, rgb_gt, wsum = mixture_field(gaussians, pts3d)

            def loss_fn(p):
                out = render_rays(
                    rays_o, rays_d,
                    lambda pts, dirs: field.apply({"params": p}, pts, dirs),
                    grid, num_samples=128, rng=key,
                )
                rgb = out["rgb"] + (1.0 - out["alpha"][:, None])  # white bg
                l_photo = (jnp.mean((rgb - gt_rgb) ** 2)
                           + jnp.mean((out["alpha"] - gt_a) ** 2))
                sig_p, rgb_p = field.apply({"params": p}, pts3d)
                l_sigma = jnp.mean(
                    (jnp.log1p(sig_p) - jnp.log1p(sig_gt)) ** 2
                )
                cw = jnp.minimum(wsum, 1.0)[:, None]
                l_col = jnp.mean(cw * (rgb_p - rgb_gt) ** 2)
                return l_photo + l_sigma + l_col

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        def sample_points(n=2048):
            """Half near gaussian centers, half uniform in the AABB."""
            k = n // 2
            sel = self.rng.integers(0, len(self.gaussians), k)
            near = (self.gaussians[sel, 0:3]
                    + self.rng.normal(0, 1, (k, 3))
                    * self.gaussians[sel, 4:7] * 2.0)
            uni = self.rng.uniform(-1, 1, (n - k, 3))
            return np.clip(
                np.concatenate([near, uni]), -1, 1
            ).astype(np.float32)

        @jax.jit
        def density_fn(params, pts):
            return field.apply({"params": params}, pts)[0]

        @jax.jit
        def occ_update(params, grid):
            # grid.update's eager lax.map re-compiles per call (a fresh
            # closure each time — measured ~2 min of remote compile every
            # 32 iters through the TPU tunnel); one jitted graph instead.
            return grid.update(lambda pts: density_fn(params, pts),
                               threshold=1.0)

        # Random-ray subsampling: training on every ray of the teacher
        # image evaluates the field at rays*samples = 2M points/iter; the
        # hash-table GRADIENT is then a 16M-index scatter-add per level
        # (index-loop-bound, like the rasterizer's — see BENCHMARKS.md).
        # 4096 random rays/iter keep the same per-sample signal at ~1/4
        # the cost (and match how nerfacc-based fits sample).
        n_rays = 4096
        for it in range(iters):
            pose = _orbit_pose(self.rng, self.opt.cam_radius)
            rgb, alpha, _ = self.render_gs(pose, resolution)
            rays_o, rays_d = camera.get_rays(pose, resolution, resolution,
                                             self.opt.fovy)
            sel = self.rng.integers(0, resolution * resolution, n_rays)
            self.key, sub = jax.random.split(self.key)
            params, opt_state, loss = step(
                params, opt_state, grid,
                jnp.asarray(rays_o.reshape(-1, 3)[sel]),
                jnp.asarray(rays_d.reshape(-1, 3)[sel]),
                jnp.asarray(rgb.reshape(-1, 3)[sel]),
                jnp.asarray(alpha.reshape(-1)[sel]),
                jnp.asarray(sample_points()), sub,
            )
            if (it + 1) % 32 == 0:  # periodic occupancy update
                grid = occ_update(params, grid)
            if (it + 1) % log_every == 0:
                print(f"[fit_nerf] iter {it + 1}/{iters} loss "
                      f"{float(loss):.5f}")
        self.nerf_params = params
        self.grid = grid
        self._field = field
        return self

    def query_field(self, pts: np.ndarray):
        import jax
        import jax.numpy as jnp

        if not hasattr(self, "_query_jit"):
            self._query_jit = jax.jit(
                lambda p, x: self._field.apply({"params": p}, x)
            )
        sigma, rgb = self._query_jit(
            self.nerf_params, jnp.asarray(pts, jnp.float32)
        )
        return np.asarray(sigma), np.asarray(rgb)

    # ------------------------------------------------------------------
    # Stage 2: mesh extraction + geometry fit
    # ------------------------------------------------------------------

    def extract_mesh(self, grid_resolution: int = 192,
                     density_thresh: float = 10.0,
                     target_faces: int = 50_000):
        """(ref: convert.py:268-296; 5e4 face target)"""
        from lgm_tpu.native import clean, decimate_to_target, marching_cubes

        n = grid_resolution
        xs = np.linspace(-1, 1, n, dtype=np.float32)
        X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
        pts = np.stack([X, Y, Z], -1).reshape(-1, 3)
        sig = np.concatenate(
            [self.query_field(c)[0] for c in np.array_split(pts, 64)]
        )
        density = sig.reshape(n, n, n)
        verts, faces = marching_cubes(density, density_thresh)
        verts = verts / (n - 1) * 2.0 - 1.0  # grid -> world [-1, 1]
        verts, faces = clean(verts, faces, eps=1e-4)
        verts, faces = decimate_to_target(verts, faces, target_faces)
        self.verts, self.faces = verts, faces
        print(f"[extract_mesh] {len(verts)} verts, {len(faces)} faces")
        return self

    def fit_mesh(self, iters: int = 256, resolution: int = 256,
                 lr: float = 1e-3, lap_weight: float = 0.1,
                 off_weight: float = 0.1, log_every: int = 64):
        """Optimize vertex offsets against GS renders
        (ref: convert.py:302-349)."""
        import jax
        import jax.numpy as jnp
        import optax

        from lgm_tpu.ops.trirast import render_mesh

        verts0 = jnp.asarray(self.verts)
        faces = jnp.asarray(self.faces)
        # Uniform Laplacian via face-edge adjacency (segment mean).
        e = np.concatenate(
            [self.faces[:, [0, 1]], self.faces[:, [1, 2]],
             self.faces[:, [2, 0]]]
        )
        e = np.concatenate([e, e[:, ::-1]])
        nbr_idx = jnp.asarray(e[:, 1])
        nbr_seg = jnp.asarray(e[:, 0])
        deg = jnp.maximum(
            jax.ops.segment_sum(jnp.ones(len(e)), nbr_seg,
                                len(self.verts)), 1.0
        )

        offsets = jnp.zeros_like(verts0)
        tx = optax.adam(lr)
        opt_state = tx.init(offsets)

        @jax.jit
        def step(offsets, opt_state, vp, gt_rgb, gt_a):
            def loss_fn(off):
                v = verts0 + off
                _, rgb = self._field.apply(
                    {"params": self.nerf_params}, v
                )
                out, mask = render_mesh(v, faces, rgb, vp, resolution)
                img = out + (1.0 - mask[..., None])  # white bg
                l_img = jnp.mean((img - gt_rgb) ** 2)
                l_mask = jnp.mean(
                    (mask.astype(jnp.float32) - gt_a) ** 2
                )
                nbr_mean = (
                    jax.ops.segment_sum(
                        (verts0 + off)[nbr_idx], nbr_seg, len(self.verts)
                    ) / deg[:, None]
                )
                l_lap = jnp.mean(
                    jnp.sum(((verts0 + off) - nbr_mean) ** 2, -1)
                )
                l_off = jnp.mean(jnp.sum(off**2, -1))
                return (l_img + l_mask + lap_weight * l_lap
                        + off_weight * l_off)

            loss, grads = jax.value_and_grad(loss_fn)(offsets)
            updates, opt_state = tx.update(grads, opt_state, offsets)
            return optax.apply_updates(offsets, updates), opt_state, loss

        for it in range(iters):
            pose = _orbit_pose(self.rng, self.opt.cam_radius)
            rgb, alpha, vp = self.render_gs(pose, resolution)
            offsets, opt_state, loss = step(
                offsets, opt_state, jnp.asarray(vp), jnp.asarray(rgb),
                jnp.asarray(alpha),
            )
            if (it + 1) % log_every == 0:
                print(f"[fit_mesh] iter {it + 1}/{iters} loss "
                      f"{float(loss):.5f}")
        self.verts = np.asarray(verts0 + offsets)
        return self

    # ------------------------------------------------------------------
    # Stage 3: UV atlas + texture
    # ------------------------------------------------------------------

    def unwrap_uv(self):
        """UV atlas (xatlas replacement, ref: convert.py:370-372).

        Preferred path: native chart-based unwrap (normal-coherent chart
        growing + per-chart plane projection + shelf packing,
        native/meshops.cpp) — follows surface regions, so concave meshes
        avoid the box atlas's cross-chart stretch. Falls back to the
        6-way box projection if the native library cannot build."""
        try:
            from lgm_tpu import native

            verts, uv, faces, n_charts = native.chart_unwrap(
                self.verts, self.faces)
            self.verts, self.faces, self.uv = verts, faces, uv
            self.n_charts = n_charts
            return self
        except Exception as e:  # pragma: no cover - fallback path
            print(f"[unwrap_uv] native chart unwrap unavailable ({e}); "
                  "using box projection")
            return self._unwrap_uv_box()

    def _unwrap_uv_box(self):
        """Box-projection atlas: faces grouped by dominant normal axis
        into 6 charts packed 3x2. Vertices used by multiple charts are
        duplicated so UVs are per-corner consistent."""
        v, f = self.verts, self.faces
        fn = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
        axis = np.abs(fn).argmax(1)
        sign = np.take_along_axis(np.sign(fn), axis[:, None], 1)[:, 0]
        chart = axis * 2 + (sign > 0)  # 0..5

        new_index: Dict[Tuple[int, int], int] = {}
        new_verts, new_uv, new_faces = [], [], []
        proj_axes = {0: (1, 2), 1: (0, 2), 2: (0, 1)}
        for fi in range(len(f)):
            c = int(chart[fi])
            a0, a1 = proj_axes[c // 2]
            tri = []
            for vi in f[fi]:
                key = (int(vi), c)
                if key not in new_index:
                    new_index[key] = len(new_verts)
                    new_verts.append(v[vi])
                    new_uv.append([v[vi][a0], v[vi][a1], c])
                tri.append(new_index[key])
            new_faces.append(tri)

        verts = np.asarray(new_verts, np.float32)
        uv_raw = np.asarray(new_uv, np.float32)
        faces = np.asarray(new_faces, np.int32)

        # Normalize each chart to its cell in a 3x2 atlas with margins.
        uv = np.zeros((len(verts), 2), np.float32)
        for c in range(6):
            m = uv_raw[:, 2] == c
            if not m.any():
                continue
            p = uv_raw[m, :2]
            lo, hi = p.min(0), p.max(0)
            p = (p - lo) / np.maximum(hi - lo, 1e-6)
            cell_x, cell_y = c % 3, c // 3
            uv[m, 0] = (cell_x + 0.05 + 0.9 * p[:, 0]) / 3.0
            uv[m, 1] = (cell_y + 0.05 + 0.9 * p[:, 1]) / 2.0

        self.verts, self.faces, self.uv = verts, faces, uv
        return self

    def fit_texture(self, iters: int = 128, tex_size: int = 1024,
                    resolution: int = 256, lr: float = 1e-2,
                    log_every: int = 64):
        """Bake albedo from the NeRF color field, then optimize against
        front-biased GS renders (ref: convert.py:364-442)."""
        import jax
        import jax.numpy as jnp
        import optax

        from lgm_tpu.ops.trirast import render_mesh, texture as tex_sample

        if self.uv is None:
            self.unwrap_uv()
        verts = jnp.asarray(self.verts)
        faces = jnp.asarray(self.faces)
        uv = jnp.asarray(self.uv)

        # Initial bake: splat vertex colors into the texture.
        _, vcol = self.query_field(self.verts)
        tex = np.full((tex_size, tex_size, 3), 0.5, np.float32)
        ti = np.clip((self.uv * tex_size).astype(np.int64), 0,
                     tex_size - 1)
        tex[ti[:, 1], ti[:, 0]] = vcol
        tex = jnp.asarray(tex)

        tx = optax.adam(lr)
        opt_state = tx.init(tex)

        @jax.jit
        def step(tex, opt_state, vp, gt_rgb):
            def loss_fn(t):
                uv_img, mask = render_mesh(verts, faces, uv, vp,
                                           resolution)
                rgb = tex_sample(t, uv_img)
                img = jnp.where(mask[..., None], rgb, 1.0)
                return jnp.mean((img - gt_rgb) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(tex)
            updates, opt_state = tx.update(grads, opt_state, tex)
            return optax.apply_updates(tex, updates), opt_state, loss

        for it in range(iters):
            pose = _orbit_pose(self.rng, self.opt.cam_radius,
                               front_bias=True)
            rgb, _, vp = self.render_gs(pose, resolution)
            tex, opt_state, loss = step(tex, opt_state, jnp.asarray(vp),
                                        jnp.asarray(rgb))
            if (it + 1) % log_every == 0:
                print(f"[fit_texture] iter {it + 1}/{iters} loss "
                      f"{float(loss):.5f}")
        self.texture = np.clip(np.asarray(tex), 0, 1)
        return self

    # ------------------------------------------------------------------
    # Export
    # ------------------------------------------------------------------

    def export(self, path: str):
        from lgm_tpu.io.mesh import export_glb, export_obj

        assert self.verts is not None and self.faces is not None
        if path.endswith(".glb"):
            export_glb(path, self.verts, self.faces, self.uv, self.texture)
        else:
            export_obj(path, self.verts, self.faces, self.uv, self.texture)
        print(f"[export] wrote {path}")
        return self

    def run(self, out_path: str, nerf_iters: int = 512,
            mesh_iters: int = 256, tex_iters: int = 128,
            grid_resolution: int = 192, target_faces: int = 50_000):
        """Full pipeline (ref: convert.py:458-462)."""
        self.fit_nerf(iters=nerf_iters)
        self.extract_mesh(grid_resolution=grid_resolution,
                          target_faces=target_faces)
        self.fit_mesh(iters=mesh_iters)
        self.unwrap_uv()
        self.fit_texture(iters=tex_iters)
        self.export(out_path)
        return self


def main(argv=None):
    import argparse

    from lgm_tpu.io.ply import load_ply

    parser = argparse.ArgumentParser(description="gaussians -> glb mesh")
    parser.add_argument("config", nargs="?", default="big",
                        choices=sorted(CONFIGS))
    parser.add_argument("--test-path", required=True,
                        help="input .ply of packed gaussians")
    parser.add_argument("--out", default=None)
    parser.add_argument("--nerf-iters", type=int, default=512)
    parser.add_argument("--mesh-iters", type=int, default=256)
    parser.add_argument("--tex-iters", type=int, default=128)
    parser.add_argument("--grid-resolution", type=int, default=192)
    ns = parser.parse_args(argv)
    opt = CONFIGS[ns.config]
    g = load_ply(ns.test_path)
    out = ns.out or os.path.splitext(ns.test_path)[0] + ".glb"
    Converter(opt, g).run(
        out, nerf_iters=ns.nerf_iters, mesh_iters=ns.mesh_iters,
        tex_iters=ns.tex_iters, grid_resolution=ns.grid_resolution,
    )


if __name__ == "__main__":
    main()
