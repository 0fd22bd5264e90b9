"""Training-loop tests: loss decreases on the nano preset; data-parallel
sharded steps run on the virtual 8-device mesh; checkpoint round-trip."""

import os

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


def test_scale_reg_guard(nano_setup):
    """The fog-collapse guard (config.lambda_scale_reg) adds exactly
    lambda * mean(relu(scale - 0.1)) to the loss and nothing else, and
    its metric is surfaced by train_step."""
    from lgm_tpu.models.lgm import LGMWithLoss
    from lgm_tpu.train import train_step, TrainState, make_optimizer

    opt, data, state, _ = nano_setup
    bg = jnp.ones(3)
    base = LGMWithLoss(opt, rasterizer_backend="xla")
    guarded = LGMWithLoss(opt.replace(lambda_scale_reg=2.0),
                          rasterizer_backend="xla")
    out0 = jax.jit(base.apply)({"params": state.params}, data, bg)
    out1 = jax.jit(guarded.apply)({"params": state.params}, data, bg)
    reg = float(jnp.mean(jax.nn.relu(
        out0["gaussians"][..., 4:7].astype(jnp.float32) - 0.1)))
    assert reg >= 0.0
    np.testing.assert_allclose(float(out1["loss_reg"]), reg, rtol=1e-5)
    np.testing.assert_allclose(
        float(out1["loss"]), float(out0["loss"]) + 2.0 * reg, rtol=1e-5)
    # train_step surfaces the metric.
    gopt = opt.replace(lambda_scale_reg=2.0)
    gstate = TrainState.create(apply_fn=guarded.apply, params=state.params,
                               tx=make_optimizer(gopt))
    _, metrics = jax.jit(train_step)(gstate, data, jax.random.PRNGKey(3))
    assert "loss_reg" in metrics and np.isfinite(float(metrics["loss_reg"]))


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


def test_view_sharded_zero1_step(nano_setup):
    """Pod-config step on a (dp=2, vp=2) mesh: view-sharded U-Net with
    the sharded-Gaussian all-gather along vp, plus ZeRO-1 optimizer-state
    sharding over dp — must match the single-device step numerically and
    keep the optimizer leaves on their shards after the update."""
    from lgm_tpu.data.synthetic import make_batch
    from lgm_tpu.parallel.mesh import (make_mesh, replicate, shard_batch,
                                       shard_opt_state, state_shardings)
    from lgm_tpu.train import create_state, train_step

    opt, _, _, _ = nano_setup
    batch = make_batch(np.random.default_rng(5), opt, batch_size=4,
                       n_gaussians=64)
    data_host = {k: v for k, v in batch.items() if k != "scenes"}
    data1 = {k: jnp.asarray(v) for k, v in data_host.items()}

    mesh = make_mesh((2, 2), devices=jax.devices()[:4])
    state_m, _ = create_state(opt, jax.random.PRNGKey(0), data1,
                              backend="xla", mesh=mesh)
    state_m = replicate(mesh, state_m)
    state_m = state_m.replace(
        opt_state=shard_opt_state(mesh, state_m.opt_state, min_size=128)
    )
    shards = state_shardings(state_m.opt_state)
    data = shard_batch(mesh, data_host)

    def _step(s, d, r):
        s, m = train_step(s, d, r)
        s = s.replace(opt_state=jax.tree.map(
            jax.lax.with_sharding_constraint, s.opt_state, shards))
        return s, m

    with mesh:
        state2, metrics = jax.jit(_step)(state_m, data,
                                         jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))

    state_1, _ = create_state(opt, jax.random.PRNGKey(0), data1,
                              backend="xla")
    state_1d, m1 = jax.jit(train_step)(state_1, data1,
                                       jax.random.PRNGKey(0))
    # bf16 U-Net compute under a different GSPMD partitioning rounds
    # differently; ~1e-3 relative is layout noise, not semantics.
    np.testing.assert_allclose(float(metrics["loss"]), float(m1["loss"]),
                               rtol=5e-3)
    l2 = jax.tree.leaves(state2.params)[0]
    l1 = jax.tree.leaves(state_1d.params)[0]
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1), atol=5e-4)

    big = [l for l in jax.tree.leaves(state2.opt_state)
           if hasattr(l, "sharding") and l.size >= 128]
    assert big and any(not l.sharding.is_fully_replicated for l in big)


def test_eval_every_cadence(tmp_path):
    """config.eval_every drives the eval/checkpoint cadence (plus the
    final step), through the real CLI."""
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    ws = str(tmp_path / "ws")
    proc = subprocess.run(
        [sys.executable, "-u", "-m", "lgm_tpu.train", "nano",
         "--workspace", ws, "--total-steps", "12", "--eval-every", "5",
         "--lambda-lpips", "0.0"],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=os.path.dirname(os.path.dirname(__file__)),
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    evals = [int(l.split()[2].rstrip(":")) for l in proc.stdout.splitlines()
             if l.startswith("eval @ ")]
    assert evals == [5, 10, 12], proc.stdout


def test_preemption_save_and_auto_resume(tmp_path):
    """SIGTERM mid-training saves a full-state checkpoint and exits
    cleanly; `--resume auto` finds it (preemptible-pod safety — the
    reference loses up to an epoch on any crash, main.py:147-148)."""
    import signal
    import subprocess
    import sys
    import time as _time

    from lgm_tpu.train import latest_checkpoint

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    ws = str(tmp_path / "ws")
    proc = subprocess.Popen(
        [sys.executable, "-u", "-m", "lgm_tpu.train", "nano",
         "--workspace", ws, "--total-steps", "100000",
         "--lambda-lpips", "0.0"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
    )
    try:
        # Wait for the first logged step, then request preemption.
        deadline = _time.time() + 240
        saw_step = False
        for line in proc.stdout:
            if line.startswith("step 1:"):
                saw_step = True
                break
            if _time.time() > deadline:
                break
        assert saw_step, "training never reached step 1"
        proc.send_signal(signal.SIGTERM)
        out = proc.stdout.read()
        rc = proc.wait(timeout=180)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert rc == 0, out
    assert "preemption save" in out, out
    ckpt = latest_checkpoint(ws)
    assert ckpt is not None and os.path.basename(ckpt).startswith("ckpt_")
