"""U-Net shape ladders, activation semantics, and end-to-end loss graph
(the seams SURVEY.md §4 calls out; the reference has no tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lgm_tpu.config import get_config
from lgm_tpu.data.synthetic import make_batch
from lgm_tpu.models.lgm import LGM, LGMWithLoss, activate_gaussians, psnr
from lgm_tpu.models.unet import UNet


def test_unet_shape_ladder_nano():
    opt = get_config("nano")
    net = UNet(
        out_channels=14,
        num_views=opt.num_input_views,
        down_channels=opt.down_channels,
        down_attention=opt.down_attention,
        mid_attention=opt.mid_attention,
        up_channels=opt.up_channels,
        up_attention=opt.up_attention,
    )
    x = jnp.zeros((2 * opt.num_input_views, opt.input_size, opt.input_size, 9))
    params = net.init(jax.random.PRNGKey(0), x)
    y = net.apply(params, x)
    # nano: 2 down levels (1 downsample), 2 up levels (1 upsample):
    # output spatial == input spatial; splat_size = input/2 comes from
    # configs with more downs than ups.
    assert y.shape[0] == x.shape[0] and y.shape[-1] == 14


@pytest.mark.parametrize("name,expected_ratio", [("small", 4), ("big", 2)])
def test_unet_splat_ratio_structure(name, expected_ratio):
    """Preset structure: input_size / splat_size == 2^(len(down)-len(up))
    (ref: core/options.py:85-106 — small: 256->64, big: 256->128)."""
    opt = get_config(name)
    depth = len(opt.down_channels) - len(opt.up_channels)
    assert opt.input_size // opt.splat_size == 2 ** depth
    assert opt.input_size // opt.splat_size == expected_ratio


def test_activations():
    x = jnp.asarray(np.random.default_rng(0).normal(0, 3, (5, 14)), jnp.float32)
    g = activate_gaussians(x)
    g = np.asarray(g)
    assert (np.abs(g[:, 0:3]) <= 1).all()          # pos clamp
    assert ((g[:, 3] > 0) & (g[:, 3] < 1)).all()   # opacity sigmoid
    assert (g[:, 4:7] > 0).all()                   # scale softplus
    # Reference rot_act is F.normalize with torch's DEFAULT dim=1: each
    # quat COMPONENT is normalized across the Gaussian axis (axis -2),
    # not each quaternion (ref: core/models.py:43,112) — required for
    # checkpoint parity, see models/lgm.py::activate_gaussians.
    np.testing.assert_allclose(
        np.linalg.norm(g[:, 7:11], axis=0), 1.0, atol=1e-5
    )
    assert ((g[:, 11:14] >= 0) & (g[:, 11:14] <= 1)).all()  # rgb


def test_activations_grad_finite_at_zero():
    """Regression: the quaternion normalization must have a finite
    gradient at rot == 0 exactly (zero input + zero-init output bias hits
    it; jnp.linalg.norm's grad there is NaN)."""
    x = jnp.zeros((3, 14), jnp.float32)
    g = jax.grad(lambda y: jnp.sum(activate_gaussians(y) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_lgm_forward_gaussians_shape():
    opt = get_config("nano")
    model = LGM(opt)
    imgs = jnp.zeros(
        (2, opt.num_input_views, opt.input_size, opt.input_size, 9)
    )
    params = model.init(jax.random.PRNGKey(0), imgs)
    g = model.apply(params, imgs)
    assert g.shape == (2, opt.num_gaussians, 14)
    assert np.isfinite(np.asarray(g)).all()


def test_lgm_with_loss_end_to_end():
    opt = get_config("nano")
    rng = np.random.default_rng(0)
    batch = make_batch(rng, opt, batch_size=2, n_gaussians=64)
    data = {k: jnp.asarray(v) for k, v in batch.items() if k != "scenes"}
    model = LGMWithLoss(opt, rasterizer_backend="xla")
    bg = jnp.ones(3)
    variables = model.init(jax.random.PRNGKey(1), data, bg)
    out = model.apply(variables, data, bg)
    assert np.isfinite(float(out["loss"]))
    assert out["images_pred"].shape == data["images_output"].shape
    assert float(out["loss_mse"]) > 0

    def loss_fn(params):
        o = model.apply({"params": params}, data, bg)
        return o["loss"]

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # The U-Net must receive gradient through the renderer.
    gnorm = sum(float(jnp.sum(jnp.abs(l))) for l in
                jax.tree.leaves(grads["lgm"]["unet"]))
    assert gnorm > 0


def test_psnr():
    a = jnp.zeros((4, 4))
    assert float(psnr(a, a)) >= 100.0 - 1e-3
    b = jnp.ones((4, 4)) * 0.1
    np.testing.assert_allclose(float(psnr(a, b)), 20.0, atol=1e-3)


def test_synthetic_batch_contract():
    opt = get_config("nano")
    batch = make_batch(np.random.default_rng(1), opt, batch_size=2,
                       n_gaussians=64)
    V_in, V, H, S = (opt.num_input_views, opt.num_views, opt.input_size,
                     opt.output_size)
    assert batch["input"].shape == (2, V_in, H, H, 9)
    assert batch["images_output"].shape == (2, V, S, S, 3)
    assert batch["masks_output"].shape == (2, V, S, S, 1)
    assert batch["cam_view"].shape == (2, V, 4, 4)
    assert 0.0 <= batch["masks_output"].min()
    assert batch["masks_output"].max() <= 1.0
    # Mask should cover some but not all of the image.
    cover = batch["masks_output"].mean()
    assert 0.01 < cover < 0.99


@pytest.mark.parametrize("size", [320, 512, 768, 1024])
def test_lpips_resize_matches_torch_interpolate(size):
    """The LPIPS input downscale must match the reference's
    F.interpolate(bilinear, align_corners=False, antialias=False)
    (ref: core/models.py:156-163) at EVERY size: 512 exercises the 2x2
    avg-pool fast path (exact only at k=2), 768/1024 the k>=3 integer
    factors where pooling would diverge (torch samples pixel 3i+1 at
    k=3), and 320 a non-integer factor (the LVIS finetune output size).
    All guard against the live torch op."""
    torch = pytest.importorskip("torch")
    from lgm_tpu.models.lgm import _resize_nchw_256

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, size, size)).astype(np.float32)
    ours = np.asarray(_resize_nchw_256(jnp.asarray(x)))
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x), (256, 256), mode="bilinear",
        align_corners=False,
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_no_dead_config_knobs():
    """Every Options field must have a reader in lgm_tpu/ (VERDICT r2
    flagged silently-ignored knobs; round 3 wired or deleted them —
    this pins the invariant so new fields can't regress it)."""
    import ast
    import dataclasses
    import glob as _glob

    from lgm_tpu.config import Options

    import os

    root = os.path.join(os.path.dirname(__file__), "..", "lgm_tpu")
    # AST-based (ADVICE r4: a regex `name\s*=` counted unrelated local
    # assignments as readers). A reader is a real ATTRIBUTE access
    # (opt.name / self.opt.name) or a KEYWORD argument in a call
    # (fn(name=...)); a bare local assignment with the same name is not.
    reads = set()
    for p in _glob.glob(os.path.join(root, "**", "*.py"), recursive=True):
        # config.py itself doesn't count: preset definitions (tile_h=8)
        # would self-satisfy the keyword pattern.
        if os.path.basename(p) == "config.py":
            continue
        with open(p) as f:
            tree = ast.parse(f.read())
        for node in ast.walk(tree):
            if isinstance(node, ast.Attribute):
                reads.add(node.attr)
            elif isinstance(node, ast.keyword) and node.arg:
                reads.add(node.arg)
    dead = [f.name for f in dataclasses.fields(Options)
            if f.name not in reads]
    assert not dead, f"Options fields with no reader in lgm_tpu/: {dead}"


def test_rasterizer_dup_knob_reaches_renderer(monkeypatch):
    """config.rasterizer_dup must propagate to the render call (the
    measured round-4 default of 32 is meaningless if the plumb breaks)."""
    import lgm_tpu.models.lgm as lgm_mod

    seen = {}
    real = lgm_mod.render_views

    def spy(*args, **kwargs):
        seen.update(kwargs)
        return real(*args, **kwargs)

    monkeypatch.setattr(lgm_mod, "render_views", spy)
    opt = get_config("nano").replace(rasterizer_dup=24)
    batch = make_batch(np.random.default_rng(0), opt, batch_size=1,
                       n_gaussians=32)
    data = {k: jnp.asarray(v) for k, v in batch.items() if k != "scenes"}
    model = LGMWithLoss(opt, rasterizer_backend="xla")
    model.init(jax.random.PRNGKey(0), data, jnp.ones(3))
    assert seen.get("dup") == 24
