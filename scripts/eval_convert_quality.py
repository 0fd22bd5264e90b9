"""Quantified mesh-converter quality on a known shape (VERDICT r2 #6).

Builds a torus of Gaussians with an ANALYTIC surface, runs the full
convert pipeline (hash-grid NeRF distillation -> marching tetrahedra ->
clean/decimate -> vertex optimization -> chart UV unwrap -> texture
bake/optimize), and reports:

  - chamfer distance (mesh surface <-> analytic torus surface), in
    scene units (the object spans ~[-0.55, 0.55])
  - PSNR of the textured-mesh re-render vs the GS render at held-out
    poses (the texture/geometry end metric)

Run twice to A/B the Laplacian regularizer (the reference periodically
remeshes instead, ref: convert.py:333-349):

  PYTHONPATH=.:/root/.axon_site python scripts/eval_convert_quality.py \
      [--lap 0.1] [--quick]
"""

import argparse
import json
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

R_MAJ, R_MIN = 0.4, 0.16
# Concave test shape: union of 3 orthogonal capsules (creases where
# they meet are genuinely concave, unlike the smooth torus).
CAP_L, CAP_R = 0.35, 0.13


def torus_gaussians(n=6000, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.uniform(0, 2 * np.pi, n)
    v = rng.uniform(0, 2 * np.pi, n)
    r = R_MIN * np.sqrt(rng.uniform(0, 1, n))  # volume fill
    cx = (R_MAJ + r * np.cos(v)) * np.cos(u)
    cy = r * np.sin(v)
    cz = (R_MAJ + r * np.cos(v)) * np.sin(u)
    g = np.zeros((n, 14), np.float32)
    g[:, 0] = cx
    g[:, 1] = cy
    g[:, 2] = cz
    g[:, 3] = 0.95
    g[:, 4:7] = 0.035
    g[:, 7] = 1.0
    # Angular color stripes: texture signal for the bake stage.
    g[:, 11] = 0.5 + 0.45 * np.sin(3 * u)
    g[:, 12] = 0.5 + 0.45 * np.cos(2 * u + v)
    g[:, 13] = 0.5 + 0.45 * np.sin(2 * v)
    return g


def torus_sdf(p):
    q = np.stack([np.sqrt(p[:, 0] ** 2 + p[:, 2] ** 2) - R_MAJ, p[:, 1]], 1)
    return np.linalg.norm(q, axis=1) - R_MIN


def _capsule_sdf(p, axis):
    ax = np.clip(p[:, axis], -CAP_L, CAP_L)
    q = p.copy()
    q[:, axis] -= ax
    return np.linalg.norm(q, axis=1) - CAP_R


def cross_sdf(p):
    return np.minimum(
        np.minimum(_capsule_sdf(p, 0), _capsule_sdf(p, 1)),
        _capsule_sdf(p, 2))


def cross_gaussians(n=6000, seed=0):
    rng = np.random.default_rng(seed)
    g = np.zeros((n, 14), np.float32)
    axis = rng.integers(0, 3, n)
    t = rng.uniform(-CAP_L, CAP_L, n)
    r = CAP_R * np.sqrt(rng.uniform(0, 1, n))
    th = rng.uniform(0, 2 * np.pi, n)
    for a in range(3):
        m = axis == a
        o1, o2 = (a + 1) % 3, (a + 2) % 3
        g[m, a] = t[m]
        g[m, o1] = r[m] * np.cos(th[m])
        g[m, o2] = r[m] * np.sin(th[m])
    g[:, 3] = 0.95
    g[:, 4:7] = 0.035
    g[:, 7] = 1.0
    g[:, 11] = 0.5 + 0.45 * np.sin(6 * g[:, 0])
    g[:, 12] = 0.5 + 0.45 * np.cos(6 * g[:, 1])
    g[:, 13] = 0.5 + 0.45 * np.sin(6 * g[:, 2])
    return g


def cross_surface_points(n=20000, seed=1):
    """Rejection-sample the UNION surface: points on one capsule's
    surface that lie inside another capsule are interior, not surface."""
    rng = np.random.default_rng(seed)
    pts = []
    while sum(len(x) for x in pts) < n:
        m = 4 * n
        axis = rng.integers(0, 3, m)
        t = rng.uniform(-CAP_L, CAP_L, m)
        th = rng.uniform(0, 2 * np.pi, m)
        p = np.zeros((m, 3), np.float32)
        for a in range(3):
            k = axis == a
            o1, o2 = (a + 1) % 3, (a + 2) % 3
            p[k, a] = t[k]
            p[k, o1] = CAP_R * np.cos(th[k])
            p[k, o2] = CAP_R * np.sin(th[k])
        keep = np.abs(cross_sdf(p)) < 1e-4
        pts.append(p[keep])
    return np.concatenate(pts)[:n]




def torus_surface_points(n=20000, seed=1):
    rng = np.random.default_rng(seed)
    u = rng.uniform(0, 2 * np.pi, n)
    v = rng.uniform(0, 2 * np.pi, n)
    return np.stack(
        [(R_MAJ + R_MIN * np.cos(v)) * np.cos(u), R_MIN * np.sin(v),
         (R_MAJ + R_MIN * np.cos(v)) * np.sin(u)], 1,
    ).astype(np.float32)


def sample_mesh_surface(verts, faces, n=20000, seed=2):
    rng = np.random.default_rng(seed)
    tri = verts[faces]
    areas = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1)
    fi = rng.choice(len(faces), n, p=areas / areas.sum())
    a, b = rng.uniform(0, 1, (2, n))
    flip = a + b > 1
    a[flip], b[flip] = 1 - a[flip], 1 - b[flip]
    t = tri[fi]
    return (t[:, 0] * (1 - a - b)[:, None] + t[:, 1] * a[:, None]
            + t[:, 2] * b[:, None]).astype(np.float32)


SHAPES = {
    # extent = max spatial span, for the %%-of-extent normalization.
    "torus": (torus_gaussians, torus_sdf, torus_surface_points,
              2 * (R_MAJ + R_MIN)),
    "cross": (cross_gaussians, cross_sdf, cross_surface_points,
              2 * (CAP_L + CAP_R)),
}

# (nerf_iters, mesh_iters, tex_iters, grid_resolution). "reference"
# matches the reference pipeline budgets: 512-iter NeRF distill,
# 2048-iter vertex fit, 512-iter texture fit, 256-grid extraction
# (ref: convert.py:186-224, 263-361, 364-442).
BUDGETS = {
    "quick": (128, 96, 64, 128),
    "default": (384, 256, 128, 192),
    "reference": (512, 2048, 512, 256),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lap", type=float, default=0.1)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--shape", choices=sorted(SHAPES), default="torus")
    ap.add_argument("--budget", choices=sorted(BUDGETS), default=None,
                    help="iteration budget; default 'default' "
                         "('quick' if --quick)")
    args = ap.parse_args()
    budget = args.budget or ("quick" if args.quick else "default")
    args.quick = budget == "quick"

    import jax.numpy as jnp
    from scipy.spatial import cKDTree

    from lgm_tpu.config import get_config
    from lgm_tpu.convert import Converter
    from lgm_tpu.ops.gsplat import render_views
    from lgm_tpu.utils import camera

    opt = get_config("small")
    make_g, sdf_fn, surface_fn, extent = SHAPES[args.shape]
    g = make_g()
    t0 = time.time()
    conv = Converter(opt, g)
    nerf_iters, mesh_iters, tex_iters, grid_res = BUDGETS[budget]
    conv.fit_nerf(iters=nerf_iters, log_every=64)
    conv.extract_mesh(grid_resolution=grid_res,
                      density_thresh=10.0)
    conv.fit_mesh(iters=mesh_iters, lap_weight=args.lap, log_every=64)
    conv.fit_texture(iters=tex_iters, log_every=64)
    fit_s = time.time() - t0

    # --- chamfer ---------------------------------------------------------
    mesh_pts = sample_mesh_surface(conv.verts, conv.faces)
    d_mesh_to_true = np.abs(sdf_fn(mesh_pts))
    true_pts = surface_fn()
    d_true_to_mesh = cKDTree(mesh_pts).query(true_pts)[0]
    chamfer = 0.5 * (d_mesh_to_true.mean() + d_true_to_mesh.mean())

    # --- textured re-render PSNR vs GS at held-out poses -----------------
    from lgm_tpu.ops.trirast import render_mesh, texture as tex_sample
    import jax

    verts = jnp.asarray(conv.verts)
    faces = jnp.asarray(conv.faces)
    uv = jnp.asarray(conv.uv)
    tex = jnp.asarray(conv.texture)

    @jax.jit
    def mesh_render(vp):
        uv_img, mask = render_mesh(verts, faces, uv, vp, 256)
        rgb = tex_sample(tex, uv_img)
        return jnp.where(mask[..., None], rgb, 1.0)

    psnrs = []
    rng = np.random.default_rng(9)
    for _ in range(8 if not args.quick else 4):
        el = rng.uniform(-50, 50)
        az = rng.uniform(0, 360)
        pose = camera.orbit_camera(el, az, opt.cam_radius)
        gt, _, vp = conv.render_gs(pose, 256)
        img = np.asarray(mesh_render(jnp.asarray(vp)))
        mse = float(np.mean((img - gt) ** 2))
        psnrs.append(-10.0 * np.log10(max(mse, 1e-10)))
    print(json.dumps({
        "shape": args.shape,
        "budget": budget,
        "lap_weight": args.lap,
        "chamfer": round(float(chamfer), 5),
        "chamfer_pct_of_extent": round(float(chamfer) / extent * 100, 3),
        "psnr_mesh_vs_gs": round(float(np.mean(psnrs)), 3),
        "n_faces": int(len(conv.faces)),
        "fit_seconds": round(fit_s, 1),
    }))


if __name__ == "__main__":
    main()
