"""LPIPS metric + torch-weight conversion round-trip (SURVEY.md §2b N7)."""

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
