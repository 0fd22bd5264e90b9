"""End-to-end Gaussians -> NeRF -> mesh -> textured GLB smoke test at tiny
scale, plus GLB round-trip."""

import os

import numpy as np
import pytest

from lgm_tpu.config import get_config


@pytest.mark.slow
def test_converter_end_to_end(tmp_path):
    from lgm_tpu.convert import Converter
    from lgm_tpu.io.mesh import load_glb

    # A solid-ish ball of Gaussians: easy distillation target.
    rng = np.random.default_rng(0)
    n = 300
    g = np.zeros((n, 14), np.float32)
    v = rng.normal(0, 1, (n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    g[:, 0:3] = v * rng.uniform(0, 0.4, (n, 1)) ** (1 / 3)
    g[:, 3] = 0.95
    g[:, 4:7] = 0.08
    g[:, 7] = 1.0
    g[:, 11:14] = np.abs(v) * 0.7 + 0.2  # position-correlated color

    opt = get_config("nano")
    conv = Converter(opt, g, seed=0)
    conv.fit_nerf(iters=24, resolution=48, log_every=24)
    conv.extract_mesh(grid_resolution=48, density_thresh=5.0,
                      target_faces=2000)
    assert len(conv.faces) > 50
    # Mesh roughly spans the gaussian ball.
    ext = conv.verts.max(0) - conv.verts.min(0)
    assert (ext > 0.3).all() and (ext < 1.8).all()

    conv.fit_mesh(iters=6, resolution=64, log_every=6)
    conv.unwrap_uv()
    assert conv.uv.min() >= 0 and conv.uv.max() <= 1
    conv.fit_texture(iters=6, tex_size=128, resolution=64, log_every=6)

    out = str(tmp_path / "mesh.glb")
    conv.export(out)
    verts, faces, uv, tex_png = load_glb(out)
    assert len(verts) == len(conv.verts)
    assert len(faces) == len(conv.faces)
    assert uv is not None and tex_png is not None
    assert tex_png[:8] == b"\x89PNG\r\n\x1a\n"

    # OBJ export too.
    conv.export(str(tmp_path / "mesh.obj"))
    assert os.path.getsize(tmp_path / "mesh.obj") > 0


def test_glb_writer_roundtrip(tmp_path):
    from lgm_tpu.io.mesh import export_glb, load_glb

    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    uv = np.array([[0, 0], [1, 0], [0, 1]], np.float32)
    tex = np.full((8, 8, 3), 0.5, np.float32)
    path = str(tmp_path / "tri.glb")
    export_glb(path, verts, faces, uv, tex)
    v, f, u, png = load_glb(path)
    np.testing.assert_allclose(v, verts)
    np.testing.assert_array_equal(f, faces)
    np.testing.assert_allclose(u[:, 0], uv[:, 0])
    np.testing.assert_allclose(u[:, 1], 1 - uv[:, 1])  # v-flip stored
