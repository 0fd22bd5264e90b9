"""Device mesh and sharding helpers (the reference's NCCL/Accelerate DDP
equivalent — ref: main.py:18-22,82-84; SURVEY.md §2b N9, §5.8).

Parallelism axes:
  dp — data parallel over scenes (batch axis). Gradients are reduced by
       the psum XLA inserts under jit when params are replicated.
  vp — view parallel: supervision views of one scene sharded across chips;
       the per-scene Gaussians are small ([N,14] ~ 5 MB) and replicated
       along vp, so the rasterizer runs fully locally and only the loss
       reduction crosses chips. This is the "Gaussian/view-sharded
       rasterization" axis of the pod-scale config (BASELINE.json cfg 5).

Multi-host: call `jax.distributed.initialize()` before `make_mesh` (the
mesh spans all processes' devices; DCN crosses hosts only on dp).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Tuple[int, int]] = None,
              devices=None) -> Mesh:
    """Create a (dp, vp) mesh. Default: all devices on dp, vp=1."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    assert shape[0] * shape[1] == n, (shape, n)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, ("dp", "vp"))


def batch_spec() -> P:
    """Batch dict arrays: leading batch axis on dp; supervision-view axis
    (axis 1 of the 5/4-dim arrays) on vp."""
    return P("dp", "vp")


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place a host batch onto the mesh: batch axis over dp and, for
    per-view arrays (images/masks/cameras), the view axis over vp.
    `input` (the V_in input views) is replicated along vp — every chip
    needs all input views to run the cross-view U-Net.

    Multi-host: every process must pass the same GLOBAL batch (the data
    pipelines are deterministic in the step index, so each host
    materializes the full batch and jax slices out the shards its local
    devices own via make_array_from_callback — device_put cannot target
    non-addressable devices). Per-host sharded *loading* is an
    optimization on top, not a correctness requirement."""
    out = {}
    multiproc = jax.process_count() > 1
    for k, v in batch.items():
        if k == "input" or v.ndim < 2:
            spec = P("dp")
        else:
            spec = P("dp", "vp")
        sharding = NamedSharding(mesh, spec)
        if multiproc:
            arr = np.asarray(v)
            out[k] = jax.make_array_from_callback(
                arr.shape, sharding, lambda idx, arr=arr: arr[idx]
            )
        else:
            out[k] = jax.device_put(v, sharding)
    return out


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params/opt state) across the mesh."""
    s = NamedSharding(mesh, P())
    return jax.device_put(tree, s)


def constrain_views(x, mesh: Optional[Mesh]):
    """Constrain a [B*V, ...] flattened (scene, view) leading axis to be
    sharded over (dp, vp) — each vp chip computes its own slice of the
    input views through the U-Net instead of replicating the whole
    forward along vp. No-op when no mesh is given, when vp == 1, or when
    the axis does not divide evenly."""
    if mesh is None or mesh.shape.get("vp", 1) == 1:
        return x
    total = mesh.shape["dp"] * mesh.shape["vp"]
    if x.shape[0] % total != 0:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(("dp", "vp")))
    )


def gather_gaussians(x, mesh: Optional[Mesh]):
    """Constrain per-scene Gaussians [B, N, 14] to P("dp") — replicated
    along vp. Under a view-sharded U-Net this is the sharded-Gaussian
    all-gather over ICI (BASELINE.json north star): each vp chip holds
    the Gaussians of its own input-view slice and contributes them to
    every vp peer before rasterizing its supervision-view shard."""
    if mesh is None or mesh.shape.get("vp", 1) == 1:
        return x
    if x.shape[0] % mesh.shape["dp"] != 0:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P("dp"))
    )


def shard_opt_state(mesh: Mesh, opt_state, min_size: int = 2 ** 16):
    """ZeRO-1-style optimizer-state sharding: place each large optimizer
    leaf (Adam mu/nu and the like) sharded over dp on its largest
    dp-divisible axis; small leaves stay replicated. Params and grads
    remain replicated (plain DP); only the optimizer's per-parameter
    state pays the memory — sharding it 8-way saves ~2.2 GB/chip for the
    big preset's ~415M params (nu f32 + mu bf16). The reference has no
    equivalent (DDP replicates optimizer state per GPU)."""
    dp = mesh.shape["dp"]

    def spec_for(leaf):
        if not hasattr(leaf, "shape") or leaf.size < min_size:
            return P()
        divisible = [i for i, s in enumerate(leaf.shape) if s % dp == 0]
        if not divisible:
            return P()
        axis = max(divisible, key=lambda i: leaf.shape[i])
        spec = [None] * leaf.ndim
        spec[axis] = "dp"
        return P(*spec)

    return jax.tree.map(
        lambda leaf: jax.device_put(
            leaf, NamedSharding(mesh, spec_for(leaf))
        ),
        opt_state,
    )


def state_shardings(tree):
    """The sharding of every leaf of a placed pytree (for jit
    out_shardings, so donated ZeRO-sharded optimizer leaves keep their
    placement across steps)."""
    return jax.tree.map(lambda leaf: leaf.sharding, tree)
