"""XLA device-trace attribution for the LGM-big bs2 train step.

Captures a jax.profiler trace of the exact step bench.py measures
(LGM-big, batch 2, 16 supervision views @512², full loss + AdamW), then
parses the Chrome-trace JSON the profiler writes and aggregates
device-side op durations into named buckets (rasterizer kernels/sort/
scatter, U-Net convs, attention, LPIPS, optimizer, ...). This closes the
step-time ledger that ablation timing (BENCHMARKS.md round-3) could only
bound: every device op lands in exactly one bucket, so the buckets sum
to measured device-busy time.

Run:  python scripts/profile_trace.py [--steps 3] [--keep-dir DIR]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_tpu"),
)


def build_step():
    import jax
    import jax.numpy as jnp

    from lgm_tpu.config import get_config
    from lgm_tpu.data.synthetic import SyntheticDataset
    from lgm_tpu.models.lgm import LGMWithLoss
    from lgm_tpu.train import TrainState, make_optimizer, train_step

    opt = get_config("big", batch_size=2)
    ds = SyntheticDataset(opt, training=True)
    batch = {k: jnp.asarray(v) for k, v in ds.batch(0).items()
             if k != "scenes"}
    rng = jax.random.PRNGKey(0)
    model = LGMWithLoss(opt, dtype=jnp.bfloat16)
    state = TrainState.create(
        apply_fn=model.apply,
        params=jax.jit(model.init)(rng, batch, jnp.ones(3))["params"],
        tx=make_optimizer(opt),
    )
    jit_step = jax.jit(train_step, donate_argnums=(0,))
    return jit_step, state, batch


# Buckets are matched in order; first hit wins. Patterns match the OP
# NAME ONLY (lowercased, trailing .digits stripped) — matching against
# long_name text is wrong because HLO operand references (%copy.123)
# would misattribute consumers to their producers' buckets.
# Scope buckets are matched against the op's long_name (the full
# jax.named_scope path recorded in op metadata) BEFORE the name buckets:
# train_step wraps the optimizer update and the metric reductions in
# named scopes, so their fusions separate from model glue (r5 ask #5).
SCOPE_BUCKETS = [
    ("optimizer", ("/optimizer/", "optimizer/")),
    ("step-metrics", ("/step_metrics/", "step_metrics/")),
]

BUCKETS = [
    ("attention", ("flash", "attention", "softmax")),
    ("pallas.custom_call", ("closed_call", "checkpoint",
                            "rematted_computation")),
    ("sort", ("sort",)),
    ("scatter", ("scatter", "select-and-scatter")),
    ("conv", ("convolution",)),
    ("matmul", ("dot", "einsum")),
    ("copy/transpose", ("copy", "transpose", "bitcast.")),
    ("dus/slice", ("dynamic-update-slice", "dynamic_update_slice",
                   "dynamic-slice", "dynamic_slice", "slice")),
    ("reduce", ("reduce",)),
    ("collective", ("all-reduce", "allreduce", "all-gather",
                    "collective")),
    ("fusion", ("fusion",)),
]


def classify(name, long_name):
    ln = long_name.lower()
    for bucket, pats in SCOPE_BUCKETS:
        for p in pats:
            if p in ln:
                return bucket
    s = name.lower()
    for bucket, pats in BUCKETS:
        for p in pats:
            if p in s:
                return bucket
    return "other"


def parse_trace(trace_dir, out_json=None):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace json under {trace_dir}"
    with gzip.open(sorted(paths)[-1]) as f:
        t = json.load(f)
    ev = t.get("traceEvents", [])
    pids, tids = {}, {}
    for e in ev:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pids[e["pid"]] = e["args"]["name"]
            elif e.get("name") == "thread_name":
                tids[(e["pid"], e["tid"])] = e["args"]["name"]
    # Only the per-op lane; "Steps"/"XLA Modules" lanes span whole steps
    # and would double-count, and ops nest (a `while` event contains its
    # body's events), so we attribute SELF time via an interval stack.
    op_lanes = {
        k for k, n in tids.items()
        if n == "XLA Ops" and "TPU" in pids.get(k[0], "")
    }
    per_lane = collections.defaultdict(list)
    for e in ev:
        if e.get("ph") != "X":
            continue
        if (e.get("pid"), e.get("tid")) not in op_lanes:
            continue
        per_lane[(e["pid"], e["tid"])].append(e)

    by_op = collections.Counter()
    by_bucket = collections.Counter()
    n_ev = collections.Counter()
    t0, t1 = float("inf"), 0.0
    for lane, events in per_lane.items():
        events.sort(key=lambda e: (float(e["ts"]), -float(e.get("dur", 0))))
        # Interval stack: an event whose span encloses the next event's
        # start is its parent; each event's DIRECT children's total
        # duration is subtracted to get self time.
        stack2, selfs = [], {}
        for e in events:
            ts, dur = float(e["ts"]), float(e.get("dur", 0.0))
            t0, t1 = min(t0, ts), max(t1, ts + dur)
            while stack2 and ts >= selfs[stack2[-1]][1] - 1e-9:
                stack2.pop()
            if stack2:
                selfs[stack2[-1]][2] += dur
            key = id(e)
            selfs[key] = [e, ts + dur, 0.0]
            stack2.append(key)
        for key, (e, _end, child) in selfs.items():
            name = e.get("name", "")
            args = e.get("args") or {}
            full_long = str(args.get("long_name", ""))
            long_name = full_long[:160]
            self_dur = max(float(e.get("dur", 0.0)) - child, 0.0)
            if self_dur <= 0:
                continue
            by_op[(name, long_name)] += self_dur
            b = classify(name, full_long)
            by_bucket[b] += self_dur
            n_ev[b] += 1
    return by_op, by_bucket, n_ev, (t1 - t0 if t1 > t0 else 0.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--keep-dir", default=None)
    ap.add_argument("--parse-only", default=None,
                    help="skip capture; parse this trace dir")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    if args.parse_only:
        trace_dir = args.parse_only
        steps = args.steps
    else:
        import jax

        jit_step, state, batch = build_step()
        key = jax.random.PRNGKey(1)
        # Warm (compile) outside the trace.
        state, m = jit_step(state, batch, key)
        float(m["loss"])
        trace_dir = args.keep_dir or tempfile.mkdtemp(prefix="lgm_trace_")
        steps = args.steps
        with jax.profiler.trace(trace_dir):
            for i in range(steps):
                state, m = jit_step(state, batch,
                                    jax.random.fold_in(key, i))
                float(m["loss"])  # drain: one step at a time on device
        print(f"trace dir: {trace_dir}")

    by_op, by_bucket, n_ev, span = parse_trace(trace_dir)
    total = sum(by_bucket.values())
    print(f"\ndevice busy total: {total/1e3:.1f} ms over {steps} steps "
          f"=> {total/1e3/steps:.1f} ms/step; span {span/1e3:.1f} ms")
    print(f"\n== buckets (ms/step) ==")
    for b, us in by_bucket.most_common():
        print(f"{b:28s} {us/1e3/steps:9.2f} ms  {100*us/total:5.1f}%  "
              f"({n_ev[b]/steps:.0f} events)")
    print(f"\n== top {args.top} ops (ms/step) ==")
    for (name, ln), us in by_op.most_common(args.top):
        print(f"{us/1e3/steps:9.3f} ms  {name}  | {ln[:90]}")


if __name__ == "__main__":
    main()
