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
    needs all input views to run the cross-view U-Net."""
    out = {}
    for k, v in batch.items():
        if k == "input" or v.ndim < 2:
            spec = P("dp")
        else:
            spec = P("dp", "vp")
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params/opt state) across the mesh."""
    s = NamedSharding(mesh, P())
    return jax.device_put(tree, s)
