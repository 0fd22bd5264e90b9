"""LPIPS metric + torch-weight conversion round-trip (SURVEY.md §2b N7)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lgm_tpu.models.lpips import LPIPS, load_lpips_params
from lgm_tpu.tools.convert_lpips import _VGG16_CONV_IDX, convert_lpips_state

# stage -> channels, matching VGG-16.
_CH = (64, 128, 256, 512, 512)


def _fake_torch_state():
    """torchvision-vgg16-shaped features + LPIPS lin heads, random."""
    rng = np.random.default_rng(0)
    sd = {}
    in_ch = 3
    for si, idxs in enumerate(_VGG16_CONV_IDX):
        for idx in idxs:
            sd[f"features.{idx}.weight"] = rng.normal(
                0, 0.05, (_CH[si], in_ch, 3, 3)
            ).astype(np.float32)
            sd[f"features.{idx}.bias"] = rng.normal(
                0, 0.01, (_CH[si],)
            ).astype(np.float32)
            in_ch = _CH[si]
    for k in range(5):
        sd[f"lin{k}.model.1.weight"] = np.abs(
            rng.normal(0, 0.1, (1, _CH[k], 1, 1))
        ).astype(np.float32)
    return sd


def test_lpips_identical_inputs_zero():
    m = LPIPS()
    x = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (1, 32, 32, 3)),
                    jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x, x)
    d = m.apply(params, x, x)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)


def test_convert_lpips_roundtrip(tmp_path):
    sd = _fake_torch_state()
    flat = convert_lpips_state(sd)
    # Conv kernels transposed OIHW->HWIO; lin heads flattened.
    assert flat["vgg/conv0_0/kernel"].shape == (3, 3, 3, 64)
    assert flat["lin3"].shape == (512,)

    npz = tmp_path / "lpips.npz"
    np.savez(npz, **flat)

    m = LPIPS()
    x = jnp.asarray(np.random.default_rng(2).uniform(-1, 1, (1, 32, 32, 3)),
                    jnp.float32)
    y = jnp.asarray(np.random.default_rng(3).uniform(-1, 1, (1, 32, 32, 3)),
                    jnp.float32)
    params0 = m.init(jax.random.PRNGKey(0), x, y)["params"]
    params1 = load_lpips_params(str(npz), params0)

    k0 = np.asarray(params0["vgg"]["conv0_0"]["kernel"])
    k1 = np.asarray(params1["vgg"]["conv0_0"]["kernel"])
    assert not np.allclose(k0, k1)
    np.testing.assert_allclose(
        k1, np.transpose(sd["features.0.weight"], (2, 3, 1, 0)), atol=0
    )

    d0 = float(m.apply({"params": params0}, x, y)[0])
    d1 = float(m.apply({"params": params1}, x, y)[0])
    assert np.isfinite(d1) and d1 > 0 and d1 != d0
    # identical inputs still zero under converted weights
    np.testing.assert_allclose(
        np.asarray(m.apply({"params": params1}, x, x)), 0.0, atol=1e-6
    )


def test_load_lpips_params_shape_mismatch(tmp_path):
    m = LPIPS()
    x = jnp.zeros((1, 16, 16, 3))
    params = m.init(jax.random.PRNGKey(0), x, x)["params"]
    np.savez(tmp_path / "bad.npz", **{"lin0": np.zeros(7, np.float32)})
    with pytest.raises(ValueError):
        load_lpips_params(str(tmp_path / "bad.npz"), params)


STAGE_PLAN = ((2, 8), (2, 16), (3, 32), (3, 32), (3, 32))
GOLD = os.path.join(os.path.dirname(__file__), "golden", "lpips_tiny.npz")


@pytest.mark.quick
def test_lpips_canonical_converter_golden(tmp_path):
    """The VAE treatment for LPIPS (VERDICT r3 #2): an independent torch
    oracle with the CANONICAL released-checkpoint key names —
    torchvision ``features.{0,2,5,...,28}.weight`` for the VGG backbone
    and ``lin{k}.model.1.weight`` [1,C,1,1] for the heads — runs through
    the FULL production path (.pth files -> tools/convert_lpips.convert
    -> .npz -> load_lpips_params -> LPIPS.apply) and the distances must
    match to 1e-5. A drop-in of real released weights exercises exactly
    these mappings (ref: core/models.py:46-49,156-163). Fixture from
    scripts/gen_golden_lpips.py (reduced widths, identical structure/
    naming)."""
    torch = pytest.importorskip("torch")
    from lgm_tpu.tools.convert_lpips import convert

    data = np.load(GOLD)
    vgg_sd = {k[len("vgg_sd/"):]: torch.from_numpy(data[k])
              for k in data.files if k.startswith("vgg_sd/")}
    lin_sd = {k[len("lin_sd/"):]: torch.from_numpy(data[k])
              for k in data.files if k.startswith("lin_sd/")}
    # 13 convs (w+b) + 5 heads, canonical names.
    assert len(vgg_sd) == 26 and len(lin_sd) == 5
    assert "features.28.weight" in vgg_sd
    assert "lin4.model.1.weight" in lin_sd

    vgg_pth = tmp_path / "vgg16.pth"
    lin_pth = tmp_path / "lpips_vgg.pth"
    out_npz = tmp_path / "lpips.npz"
    torch.save(vgg_sd, vgg_pth)
    torch.save(lin_sd, lin_pth)
    n = convert(str(vgg_pth), str(lin_pth), str(out_npz))
    assert n == 31, f"converter mapped {n} of 31 tensors"

    model = LPIPS(stages=STAGE_PLAN)
    a = jnp.asarray(data["a"].transpose(0, 2, 3, 1))  # NCHW -> NHWC
    b = jnp.asarray(data["b"].transpose(0, 2, 3, 1))
    params = model.init(jax.random.PRNGKey(0), a, b)["params"]
    params = load_lpips_params(str(out_npz), params)
    d = np.asarray(model.apply({"params": params}, a, b))
    np.testing.assert_allclose(d, data["dist"], atol=1e-5)
    d0 = np.asarray(model.apply({"params": params}, a, a))
    np.testing.assert_allclose(d0, data["dist_same"], atol=1e-7)
