"""Training-loop tests: loss decreases on the nano preset; data-parallel
sharded steps run on the virtual 8-device mesh; checkpoint round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def nano_setup():
    from lgm_tpu.config import get_config
    from lgm_tpu.data.synthetic import make_batch
    from lgm_tpu.train import create_state

    opt = get_config("nano")
    rng = np.random.default_rng(0)
    batch = make_batch(rng, opt, batch_size=2, n_gaussians=64)
    data = {k: jnp.asarray(v) for k, v in batch.items() if k != "scenes"}
    state, model = create_state(opt, jax.random.PRNGKey(0), data,
                                backend="xla")
    return opt, data, state, model


def test_loss_decreases(nano_setup):
    from lgm_tpu.train import train_step

    opt, data, state, _ = nano_setup
    jit_train = jax.jit(train_step)
    losses = []
    rng = jax.random.PRNGKey(1)
    for i in range(12):
        rng, sub = jax.random.split(rng)
        state, metrics = jit_train(state, data, sub)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # Overfitting a fixed tiny batch: clear downward trend.
    assert np.mean(losses[-3:]) < np.mean(losses[:3]) * 0.9, losses


def test_lpips_params_frozen():
    from lgm_tpu.config import get_config
    from lgm_tpu.data.synthetic import make_batch
    from lgm_tpu.train import create_state, train_step

    opt = get_config("nano").replace(lambda_lpips=1.0, output_size=32)
    rng = np.random.default_rng(0)
    batch = make_batch(rng, opt, batch_size=1, n_gaussians=32)
    data = {k: jnp.asarray(v) for k, v in batch.items() if k != "scenes"}
    state, _ = create_state(opt, jax.random.PRNGKey(0), data, backend="xla")
    before = jax.tree.map(np.asarray, state.params["lpips_loss"])
    state, _ = jax.jit(train_step)(state, data, jax.random.PRNGKey(2))
    after = jax.tree.map(np.asarray, state.params["lpips_loss"])
    for b, a in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(b, a)


def test_data_parallel_step(nano_setup):
    from lgm_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from lgm_tpu.train import train_step

    opt, _, state, _ = nano_setup
    assert jax.device_count() == 8, "conftest must provide 8 cpu devices"
    mesh = make_mesh((8, 1))
    from lgm_tpu.data.synthetic import make_batch

    batch = make_batch(np.random.default_rng(1), opt, batch_size=8,
                       n_gaussians=64)
    state = replicate(mesh, state)
    data = shard_batch(mesh, {k: v for k, v in batch.items()
                              if k != "scenes"})
    with mesh:
        state2, metrics = jax.jit(train_step)(state, data,
                                              jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    # Same data on a single device must give the same loss (dp mean).
    state_1d, _ = jax.jit(train_step)(
        jax.device_put(state, jax.devices("cpu")[0]),
        {k: jnp.asarray(v) for k, v in batch.items() if k != "scenes"},
        jax.random.PRNGKey(0),
    )
    # Compare a couple of updated parameter leaves.
    l2 = jax.tree.leaves(state2.params)[0]
    l1 = jax.tree.leaves(state_1d.params)[0]
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1), atol=2e-5)


def test_checkpoint_roundtrip(tmp_path, nano_setup):
    from lgm_tpu.train import (create_state, load_checkpoint,
                               save_checkpoint, train_step)

    opt, data, state, _ = nano_setup
    state, _ = jax.jit(train_step)(state, data, jax.random.PRNGKey(3))
    path = save_checkpoint(str(tmp_path), state, step=1)
    state2, _ = create_state(opt, jax.random.PRNGKey(0), data, backend="xla")
    state2 = load_checkpoint(path, state2)
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(state2.step) == 1
