"""Two-process multi-host execution test (VERDICT r2 #5).

Launches 2 separate Python processes, each with 4 virtual CPU devices,
connected through jax.distributed (localhost coordinator) — the real
LGM_TPU_MULTIHOST code path of lgm_tpu.train: process-count-aware batch
placement (make_array_from_callback; device_put cannot target another
process's devices), process_index-gated logging, and the COLLECTIVE
orbax full-state checkpoint at the final step. The reference's
equivalent is `accelerate launch` + NCCL rendezvous (ref: main.py:18-22,
SURVEY.md §5.8), which it also never tests.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_train_and_collective_checkpoint(tmp_path):
    port = _free_port()
    ws = str(tmp_path / "ws")
    procs = []
    logs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            LGM_TPU_MULTIHOST="1",
            LGM_TPU_COORDINATOR=f"127.0.0.1:{port}",
            LGM_TPU_NUM_PROCESSES="2",
            LGM_TPU_PROCESS_ID=str(pid),
            JAX_COMPILATION_CACHE_DIR=os.path.join(REPO, ".jax_cache"),
            PYTHONPATH=REPO,
        )
        log = open(str(tmp_path / f"proc{pid}.log"), "w")
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "lgm_tpu.train", "nano",
             "--workspace", ws, "--total-steps", "2",
             "--batch-size", "8", "--num-workers", "0",
             "--warmup-steps", "1"],
            env=env, stdout=log, stderr=subprocess.STDOUT, cwd=REPO,
        ))
    rcs = [p.wait(timeout=560) for p in procs]
    for log in logs:
        log.close()
    out0 = open(str(tmp_path / "proc0.log")).read()
    out1 = open(str(tmp_path / "proc1.log")).read()
    assert rcs == [0, 0], f"proc0:\n{out0[-3000:]}\nproc1:\n{out1[-3000:]}"
    # Lead logs; follower is quiet about progress.
    assert "devices: 8" in out0, out0[-2000:]
    assert "step 1: loss" in out0, out0[-2000:]
    assert "step 1: loss" not in out1
    # The collective orbax save produced a restorable full-state ckpt.
    assert os.path.isdir(os.path.join(ws, "ckpt_2")), os.listdir(ws)

    # Single-process restore of the multi-host checkpoint.
    import jax  # noqa: E402 (conftest pins CPU + 8 virtual devices)
    import jax.numpy as jnp

    from lgm_tpu.config import get_config
    from lgm_tpu.data.synthetic import SyntheticDataset
    from lgm_tpu.train import create_state, load_checkpoint

    opt = get_config("nano", batch_size=8, workspace=ws)
    ds = SyntheticDataset(opt, training=True)
    sample = {k: jnp.asarray(v) for k, v in ds.batch(0).items()
              if k != "scenes"}
    state, _ = create_state(opt, jax.random.PRNGKey(0), sample)
    restored = load_checkpoint(os.path.join(ws, "ckpt_2"), state)
    assert int(restored.step) == 2
