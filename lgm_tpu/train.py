"""Training entry point: data-parallel LGM training on a TPU mesh.

Re-design of the reference trainer (ref: main.py:13-185): tyro+Accelerate
+DDP becomes argparse + jit-over-Mesh; the optimizer is AdamW with the same
hyperparameters (lr 4e-4, wd 0.05, betas .9/.95 — main.py:73-74) under a
cosine one-cycle schedule with warmup (main.py:75-79), global-norm gradient
clipping at 1.0 (main.py:105-106), and bf16 compute. Unlike the reference
(weights-only saves, main.py:147-148), checkpoints carry the full training
state (params + optimizer + step) via orbax; SIGTERM/SIGINT trigger a
full-state save after the in-flight step (preemptible-pod safety) and
``--resume auto`` continues from the newest workspace checkpoint.

Run:  python -m lgm_tpu.train small --workspace ws [--max-steps N]
"""

from __future__ import annotations

import functools
import os
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from lgm_tpu.config import Options, parse_cli
from lgm_tpu.models.lgm import LGMWithLoss
from lgm_tpu.parallel.mesh import make_mesh, replicate, shard_batch


class TrainState(train_state.TrainState):
    pass


def _is_lpips(path: Tuple, _) -> bool:
    return any(getattr(p, "key", None) == "lpips_loss" for p in path)


def make_optimizer(opt: Options) -> optax.GradientTransformation:
    """AdamW + one-cycle cosine + global-norm clip; LPIPS params frozen
    (the reference excludes them from training, core/models.py:46-49)."""
    schedule = optax.cosine_onecycle_schedule(
        transition_steps=max(opt.total_steps, opt.warmup_steps + 1),
        peak_value=opt.lr,
        pct_start=opt.warmup_steps / max(opt.total_steps, opt.warmup_steps + 1),
        div_factor=25.0,
        final_div_factor=1e4,
    )
    tx = optax.chain(
        optax.clip_by_global_norm(opt.gradient_clip),
        # First moment in bf16: halves its HBM (0.8 GB at ~415M params)
        # with no measurable quality effect; the variance stays f32 (its
        # dynamic range actually needs it).
        optax.adamw(schedule, b1=0.9, b2=0.95, weight_decay=0.05,
                    mu_dtype=jnp.bfloat16),
    )
    frozen = optax.set_to_zero()
    label_fn = lambda params: jax.tree_util.tree_map_with_path(
        lambda path, x: "frozen" if _is_lpips(path, x) else "train", params
    )
    tx = optax.multi_transform({"train": tx, "frozen": frozen}, label_fn)
    if opt.gradient_accumulation_steps > 1:
        # Reference grad accumulation (main.py:93, core/options.py:47-48):
        # here as an optimizer wrapper, so train_step stays one jit graph.
        tx = optax.MultiSteps(tx, opt.gradient_accumulation_steps)
    return tx


def create_state(opt: Options, rng: jax.Array, sample_data: Dict,
                 backend: Optional[str] = None,
                 mesh=None) -> Tuple[TrainState, LGMWithLoss]:
    dtype = jnp.bfloat16 if opt.mixed_precision == "bf16" else jnp.float32
    model = LGMWithLoss(opt, dtype=dtype,
                        rasterizer_backend=backend or opt.rasterizer,
                        mesh=mesh)
    bg = jnp.ones(3)
    # jit the init: eager flax init dispatches op-by-op (minutes through
    # the remote-TPU tunnel); compiled it runs in seconds.
    variables = jax.jit(model.init)(rng, sample_data, bg)
    if opt.lpips_weights and "lpips_loss" in variables["params"]:
        from lgm_tpu.models.lpips import load_lpips_params

        params = dict(variables["params"])
        # LPIPS params live under the scan wrapper: lpips_loss/m/...
        sub = dict(params["lpips_loss"])
        sub["m"] = load_lpips_params(opt.lpips_weights, sub["m"])
        params["lpips_loss"] = sub
        variables = {"params": params}
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=make_optimizer(opt),
    )
    return state, model


def train_step(state: TrainState, data: Dict, rng: jax.Array):
    """One optimization step. Random background color per step during
    training (ref: core/models.py:135-138)."""
    bg = jax.random.uniform(rng, (3,))

    def loss_fn(params):
        # stop_gradient on the frozen LPIPS subtree: without it, the VGG
        # weight-gradient matmuls (dW = x^T @ dy through the whole conv
        # tower, ~= the data-gradient pass in FLOPs) are computed every
        # step only for the optimizer's set_to_zero branch to discard
        # them — and the gnorm metric would count them. With it, XLA
        # DCEs the dW chains and those grads are exact zeros.
        params = jax.tree_util.tree_map_with_path(
            lambda path, x: jax.lax.stop_gradient(x)
            if _is_lpips(path, x) else x, params)
        out = state.apply_fn({"params": params}, data, bg)
        return out["loss"], out

    # named_scope boundaries land in the XLA op metadata, letting
    # scripts/profile_trace.py attribute optimizer/metric fusions
    # separately from the model's own glue (round-5 ledger ask).
    with jax.named_scope("loss_grad"):
        grads, out = jax.grad(loss_fn, has_aux=True)(state.params)
    with jax.named_scope("optimizer"):
        state = state.apply_gradients(grads=grads)
    with jax.named_scope("step_metrics"):
        metrics = {
            "loss": out["loss"],
            "loss_mse": out["loss_mse"],
            "psnr": out["psnr"],
            "gnorm": optax.global_norm(grads),
        }
    if "loss_lpips" in out:
        metrics["loss_lpips"] = out["loss_lpips"]
    if "loss_reg" in out:
        metrics["loss_reg"] = out["loss_reg"]
    return state, metrics


def eval_step(state: TrainState, data: Dict):
    """White background at eval (ref: core/models.py:137-138)."""
    out = state.apply_fn({"params": state.params}, data, jnp.ones(3))
    return {"loss": out["loss"], "psnr": out["psnr"],
            "images_pred": out["images_pred"]}


def current_lr(opt: Options, step: int) -> float:
    """The scheduled learning rate at `step` (for observability parity
    with the reference's train/lr TB scalar, main1_lvis.py:211-213)."""
    schedule = optax.cosine_onecycle_schedule(
        transition_steps=max(opt.total_steps, opt.warmup_steps + 1),
        peak_value=opt.lr,
        pct_start=opt.warmup_steps / max(opt.total_steps,
                                         opt.warmup_steps + 1),
        div_factor=25.0,
        final_div_factor=1e4,
    )
    return float(schedule(step))


def save_checkpoint(workspace: str, state: TrainState, step: int):
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(workspace, f"ckpt_{step}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params": state.params, "opt_state": state.opt_state,
                      "step": step}, force=True)
    ckptr.wait_until_finished()
    return path


def latest_checkpoint(workspace: str) -> Optional[str]:
    """Highest-step ckpt_N dir in the workspace (for --resume auto)."""
    import re

    best, best_step = None, -1
    for name in os.listdir(workspace) if os.path.isdir(workspace) else []:
        m = re.fullmatch(r"ckpt_(\d+)", name)
        if m and int(m.group(1)) > best_step:
            best, best_step = os.path.join(workspace, name), int(m.group(1))
    return best


def load_checkpoint(path: str, state: TrainState) -> TrainState:
    """Full-state resume; tolerant of shape mismatches like the reference's
    loader (ref: main.py:28-44): mismatched leaves keep their init value."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    target = {"params": state.params, "opt_state": state.opt_state,
              "step": 0}
    try:
        restored = ckptr.restore(os.path.abspath(path), target)
        return state.replace(
            params=restored["params"], opt_state=restored["opt_state"],
            step=restored["step"],
        )
    except Exception:
        # Tolerant partial restore: params only, shape-matched leaves.
        restored = ckptr.restore(os.path.abspath(path))
        new_params = jax.tree.map(
            lambda cur, new: new
            if hasattr(new, "shape") and new.shape == cur.shape
            else cur,
            state.params, restored.get("params", state.params),
        )
        print("[warn] partial checkpoint restore (shape-matched params only)")
        return state.replace(params=new_params)


def make_datasets(opt: Options):
    """Dataset selection by data_mode: synthetic (self-contained) or the
    objaverse/lvis disk formats (ref providers #7/#8)."""
    if opt.data_mode == "synthetic":
        from lgm_tpu.data.synthetic import SyntheticDataset

        return (SyntheticDataset(opt, training=True),
                SyntheticDataset(opt, training=False, length=4))
    from lgm_tpu.data.provider import Loader, LVISDataset, ObjaverseDataset

    cls = {"objaverse": ObjaverseDataset, "lvis": LVISDataset}[opt.data_mode]
    train_ds = cls(opt, training=True)
    test_ds = cls(opt, training=False)

    class _Adapter:
        """Expose the disk loaders through the synthetic batch(step) API."""

        def __init__(self, ds, training):
            self.loader = Loader(ds, opt.batch_size, shuffle=training,
                                 workers=opt.num_workers)
            self._iter = None
            self._epoch = 0

        def __len__(self):
            return max(len(self.loader), 1)

        def batch(self, step):
            if self._iter is None:
                self._iter = self.loader.epoch(self._epoch)
            try:
                return next(self._iter)
            except StopIteration:
                self._epoch += 1
                self._iter = self.loader.epoch(self._epoch)
                return next(self._iter)

    return _Adapter(train_ds, True), _Adapter(test_ds, False)


def main(argv=None):
    # Multi-host pod launch: every host runs this same script; coordinator
    # discovery via the standard TPU env (the reference's `accelerate
    # launch` equivalent, ref: main.py:18-22; SURVEY.md §5.8).
    if os.environ.get("LGM_TPU_MULTIHOST", "") == "1":
        # On a TPU pod, initialize() auto-discovers the coordinator from
        # the TPU metadata. Off-pod (CPU multi-process runs, the 2-process
        # localhost test), pass it explicitly via env.
        kw = {}
        if "LGM_TPU_COORDINATOR" in os.environ:
            kw = dict(
                coordinator_address=os.environ["LGM_TPU_COORDINATOR"],
                num_processes=int(os.environ["LGM_TPU_NUM_PROCESSES"]),
                process_id=int(os.environ["LGM_TPU_PROCESS_ID"]),
            )
        jax.distributed.initialize(**kw)
    opt = parse_cli(argv)
    if opt.debug_nans:
        jax.config.update("jax_debug_nans", True)
    is_lead = jax.process_index() == 0
    os.makedirs(opt.workspace, exist_ok=True)
    n = jax.device_count()
    assert n % opt.vp == 0, (n, opt.vp)
    mesh = make_mesh((n // opt.vp, opt.vp))
    if is_lead:
        print(f"devices: {n}, mesh: {mesh.shape}")

    from lgm_tpu.utils.logging import MetricLogger, save_image_grid

    logger = MetricLogger(opt.workspace, tensorboard=is_lead)

    train_ds, test_ds = make_datasets(opt)

    rng = jax.random.PRNGKey(42)
    sample = {
        k: jnp.asarray(v) for k, v in train_ds.batch(0).items()
        if k != "scenes"
    }
    state, _ = create_state(opt, rng, sample, mesh=mesh)
    if opt.resume:
        # `--resume auto` picks the newest ckpt_N in the workspace, so a
        # preempted/restarted pod job resumes itself with no operator
        # input (the reference can only warm-start weights by explicit
        # path, main.py:28-44).
        resume = opt.resume
        if resume == "auto":
            resume = latest_checkpoint(opt.workspace)
            if is_lead and resume:
                print(f"auto-resuming from {resume}")
        if resume:
            state = load_checkpoint(resume, state)
    state = replicate(mesh, state)
    opt_shardings = None
    if opt.zero1:
        from lgm_tpu.parallel.mesh import shard_opt_state, state_shardings

        state = state.replace(
            opt_state=shard_opt_state(mesh, state.opt_state)
        )
        opt_shardings = state_shardings(state.opt_state)

    def _step(state, data, rng_):
        state, metrics = train_step(state, data, rng_)
        if opt_shardings is not None:
            # Keep the ZeRO-sharded optimizer leaves on their shards:
            # without the constraint GSPMD may choose to replicate the
            # updated mu/nu and the memory saving evaporates.
            state = state.replace(opt_state=jax.tree.map(
                jax.lax.with_sharding_constraint,
                state.opt_state, opt_shardings,
            ))
        return state, metrics

    jit_train = jax.jit(_step, donate_argnums=(0,))
    jit_eval = jax.jit(eval_step)

    def run_eval():
        evals = []
        for i in range(len(test_ds)):
            eb = shard_batch(
                mesh,
                {k: v for k, v in test_ds.batch(i).items()
                 if k != "scenes"},
            )
            evals.append(
                {k: float(v) for k, v in jit_eval(state, eb).items()
                 if k != "images_pred"}
            )
        return {k: float(np.mean([e[k] for e in evals]))
                for k in evals[0]}

    if opt.eval_only:
        with mesh:
            emeans = run_eval()
        if is_lead:
            logger.log(int(state.step), emeans, prefix="eval")
            print("eval-only: "
                  + " ".join(f"{k} {v:.4f}" for k, v in emeans.items()))
        logger.close()
        return emeans

    step = int(state.step)
    max_steps = opt.total_steps
    t_last = time.time()
    # Preemption-safe shutdown: TPU pod VMs get SIGTERM ahead of
    # eviction. Finish the in-flight step, save a full-state checkpoint,
    # exit cleanly; `--resume auto` then continues from it. (The
    # reference loses up to an epoch on any crash, main.py:147-148.)
    import signal

    stop_requested = {"flag": False}

    def _on_term(signum, frame):
        stop_requested["flag"] = True

    try:
        prev_handlers = {
            s: signal.signal(s, _on_term)
            for s in (signal.SIGTERM, signal.SIGINT)
        }
    except ValueError:  # not the main thread (e.g. driven from a test)
        prev_handlers = {}
    # Optional XLA profiler capture (the reference's only profiling is a
    # GUI frame timer, gui.py:59-104; this gives full device traces).
    prof_start = 10 if opt.profile_steps > 0 else -1
    prof_stop = prof_start + opt.profile_steps
    with mesh:
        while step < max_steps:
            if step == prof_start and is_lead:
                jax.profiler.start_trace(
                    os.path.join(opt.workspace, "trace"))
            if step == prof_stop and is_lead and opt.profile_steps > 0:
                jax.profiler.stop_trace()
                print(f"wrote trace to {opt.workspace}/trace")
            batch = train_ds.batch(step)
            data = shard_batch(
                mesh, {k: v for k, v in batch.items() if k != "scenes"}
            )
            rng, sub = jax.random.split(rng)
            state, metrics = jit_train(state, data, sub)
            step += 1
            if stop_requested["flag"]:
                path = save_checkpoint(opt.workspace, state, step)
                if is_lead:
                    print(f"preemption save at step {step}: {path}")
                break
            if step % 100 == 0 or step == 1:
                m = {k: float(v) for k, v in metrics.items()}
                dt = time.time() - t_last
                t_last = time.time()
                m["lr"] = current_lr(opt, step)
                if is_lead:
                    logger.log(step, m, prefix="train")
                    print(
                        f"step {step}: loss {m['loss']:.4f} "
                        f"psnr {m['psnr']:.2f} ({dt:.1f}s/100it)"
                    )
            if (step % 500 == 0 and is_lead and "images_output" in batch
                    and jax.process_count() == 1):
                # (multi-host: images_pred shards are not all addressable
                # from the lead host; grids are a single-host feature)
                # GT-vs-pred grid, like the reference's per-500-iter dumps
                # (main.py:120-136) — one extra eval fwd on the last batch.
                ev = jit_eval(state, data)
                save_image_grid(
                    os.path.join(opt.workspace,
                                 f"train_images_{step}.jpg"),
                    np.asarray(batch["images_output"]),
                    np.asarray(ev["images_pred"]),
                )
            if step % opt.eval_every == 0 or step == max_steps:
                emeans = run_eval()
                if is_lead:
                    logger.log(step, emeans, prefix="eval")
                    print(
                        f"eval @ {step}: "
                        + " ".join(f"{k} {v:.4f}" for k, v in emeans.items())
                    )
                # orbax save is collective: every process participates.
                path = save_checkpoint(opt.workspace, state, step)
                if is_lead:
                    print(f"saved {path}")
    for s, h in prev_handlers.items():
        signal.signal(s, h)
    logger.close()


if __name__ == "__main__":
    main()
