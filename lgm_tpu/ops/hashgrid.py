"""Instant-NGP multiresolution hash-grid encoder in Flax.

TPU-native replacement for the CUDA kiui GridEncoder used by the mesh
converter's NeRF distillation (ref: convert.py:92-93; SURVEY.md §2b N6).
Gather + trilinear interpolation is XLA-friendly: each query does 8
table gathers per level, all levels vectorized. The total-variation
regularizer (ref: convert.py:217 grad_total_variation) is exposed as an
explicit loss term on the table entries of dense levels.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = np.array([1, 2654435761, 805459861], np.uint32)


class HashGridEncoder(nn.Module):
    """x in [0, 1]^3 -> [num_levels * features] encoding.

    Levels are geometric: resolution_l = floor(base * growth^l). Levels
    whose dense size fits the table are indexed densely (no collisions);
    finer levels use the standard xor-prime spatial hash.
    """

    num_levels: int = 12
    features: int = 2
    log2_table_size: int = 19
    base_resolution: int = 16
    max_resolution: int = 2048
    dtype: Any = jnp.float32

    def resolutions(self) -> np.ndarray:
        growth = np.exp(
            (np.log(self.max_resolution) - np.log(self.base_resolution))
            / max(self.num_levels - 1, 1)
        )
        return np.floor(
            self.base_resolution * growth ** np.arange(self.num_levels)
        ).astype(np.int64)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: [N, 3] in [0, 1]
        T = 1 << self.log2_table_size
        res = self.resolutions()
        table = self.param(
            "table",
            lambda key, shape: jax.random.uniform(
                key, shape, minval=-1e-4, maxval=1e-4
            ),
            (self.num_levels, T, self.features),
        )

        # Lane-major gathers: table rows are F=2 floats, which (8,128)
        # tiling pads 64x — the original per-corner row-gather moved
        # ~8 GB of padded traffic per 2M-point batch (~9 s/iter of the
        # NeRF distillation, measured through the TPU tunnel). Gathering
        # along the LANE axis of the transposed [F, T] table is
        # lane-dense (~2.5 ns/index, scripts/microbench_gs.py), and all
        # 8 corners batch into one gather per level.
        table_t = jnp.transpose(table, (0, 2, 1))  # [L, F, T]
        outs = []
        corners = np.array(
            [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)],
            np.int32,
        )  # [8, 3]
        # uint32 wrap-around multiply is the intended hash arithmetic.
        primes = jnp.asarray(_PRIMES, dtype=jnp.uint32)
        N = x.shape[0]
        for l, r in enumerate(res):
            r = int(r)
            pos = jnp.clip(x, 0.0, 1.0) * (r - 1)
            p0 = jnp.floor(pos)
            w = pos - p0  # [N, 3]
            p0 = p0.astype(jnp.int32)
            dense = (r + 1) ** 3 <= T
            pc = jnp.minimum(
                p0[None] + jnp.asarray(corners)[:, None, :], r - 1
            )  # [8, N, 3]
            if dense:
                idx = (
                    (pc[..., 0] * r + pc[..., 1]) * r + pc[..., 2]
                ).astype(jnp.int32)  # [8, N]
            else:
                h = (
                    pc[..., 0].astype(jnp.uint32) * primes[0]
                    ^ pc[..., 1].astype(jnp.uint32) * primes[1]
                    ^ pc[..., 2].astype(jnp.uint32) * primes[2]
                )
                idx = (h & jnp.uint32(T - 1)).astype(jnp.int32)
            g = jnp.take(table_t[l], idx.reshape(-1), axis=1)
            g = g.reshape(self.features, 8, N)
            wc = jnp.prod(
                jnp.where(jnp.asarray(corners)[:, None, :] == 1,
                          w[None], 1.0 - w[None]),
                axis=-1,
            )  # [8, N]
            outs.append(jnp.einsum("fcn,cn->nf", g, wc))
        return jnp.concatenate(outs, axis=-1).astype(self.dtype)

    @staticmethod
    def tv_loss(params) -> jnp.ndarray:
        """Cheap total-variation surrogate on table entries (the CUDA
        grad_total_variation operates on spatial neighbors; collisions
        make exact spatial TV meaningless on hashed levels)."""
        t = params["table"]
        return jnp.mean(jnp.square(t[:, 1:] - t[:, :-1]))
