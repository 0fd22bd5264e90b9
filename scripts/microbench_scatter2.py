"""Round-3 follow-up microbench: can a rank-sorted segment reduction beat
the backward's flat [S, C] scatter-add?

The scatter's cost is per-index serial (~14.5 ns x 262k slots, measured
in microbench_gs.py, independent of update width/orientation), so the
only way to win is to replace indexed updates with sort/cumsum/matmul
structures. Candidates measured here, all assuming the forward
precomputes (under stop_gradient, as binning residuals):

  slot_order : argsort(flat_rank)            [S]   (one extra 262k sort)
  ends       : #entries with rank < r        [N+2] (merge-searchsorted)

  B. permute rows by slot_order -> cumsum axis0 -> gather ends, diff
  C. same, transposed [C, S] (lane-major cumsum)
  D. permuted scatter with indices_are_sorted=True
  E. two-level: 128-row block-local segment reduce by masked MXU matmul
     + cross-block combine of run-straddling boundaries
  F. forward-side added cost of computing slot_order + ends

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_scatter2.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_tpu"),
)

import jax
import jax.numpy as jnp

from microbench_gs import _roundtrip, chained  # noqa: E402


def main():
    N = 65536
    T = 256
    MPT = 1024
    C = 9
    S = T * MPT
    rng = np.random.default_rng(0)

    fr_np = np.full((T, MPT), N, np.int32)
    for t in range(T):
        cnt = int(rng.integers(MPT // 2, MPT))
        fr_np[t, :cnt] = np.sort(
            rng.choice(N, size=cnt, replace=False).astype(np.int32)
        )
    fr = jnp.asarray(fr_np.reshape(-1))

    # Forward-precomputable residuals (host-side here; variant F times
    # the on-device computation).
    slot_order_np = np.argsort(fr_np.reshape(-1), kind="stable")
    sorted_fr_np = fr_np.reshape(-1)[slot_order_np]
    ends_np = np.searchsorted(sorted_fr_np, np.arange(N + 2))
    slot_order = jnp.asarray(slot_order_np.astype(np.int32))
    sorted_fr = jnp.asarray(sorted_fr_np.astype(np.int32))
    ends = jnp.asarray(ends_np.astype(np.int32))  # [N+2]

    dslot = jnp.asarray(rng.normal(size=(S, C)).astype(np.float32))
    dslot_T = dslot.T.copy()

    overhead = _roundtrip()
    it = 20
    res = {}

    res["A scatter rows (status quo)"] = chained(
        lambda d: jnp.sum(
            jnp.zeros((N + 1, C), jnp.float32).at[fr].add(d, mode="drop")),
        dslot, it, overhead)

    def seg_rows(d):
        ds = d[slot_order]                       # [S, C]
        cs = jnp.cumsum(ds, axis=0)
        cs0 = jnp.concatenate([jnp.zeros((1, C), jnp.float32), cs], 0)
        out = cs0[ends[1:]] - cs0[ends[:-1]]     # [N+1, C]
        return jnp.sum(out)

    res["B permute+cumsum rows"] = chained(seg_rows, dslot, it, overhead)

    def seg_lanes(d):
        ds = jnp.take(d, slot_order, axis=1)     # [C, S]
        cs = jnp.cumsum(ds, axis=1)
        cs0 = jnp.concatenate([jnp.zeros((C, 1), jnp.float32), cs], 1)
        out = jnp.take(cs0, ends[1:], axis=1) - jnp.take(
            cs0, ends[:-1], axis=1)
        return jnp.sum(out)

    res["C permute+cumsum lanes"] = chained(seg_lanes, dslot_T, it, overhead)

    def sorted_scatter(d):
        ds = d[slot_order]
        return jnp.sum(
            jax.lax.scatter_add(
                jnp.zeros((N + 1, C), jnp.float32),
                sorted_fr[:, None], ds,
                jax.lax.ScatterDimensionNumbers(
                    update_window_dims=(1,),
                    inserted_window_dims=(0,),
                    scatter_dims_to_operand_dims=(0,),
                ),
                indices_are_sorted=True, unique_indices=False,
                mode=jax.lax.GatherScatterMode.FILL_OR_DROP,
            ))

    res["D permuted sorted-hint scatter"] = chained(
        sorted_scatter, dslot, it, overhead)

    # E. two-level blocked segment reduce:
    #    block-local run-id matmul + boundary cumsum-combine.
    BS = 128
    NB = S // BS
    # Precomputable: local run id per row, run-start rank per (block, rid),
    # and whether run 0 of block b continues block b-1's last run.
    rid_np = np.zeros(S, np.int32)
    start_rank_np = np.full((NB, BS), N, np.int32)
    for b in range(NB):
        seg = sorted_fr_np[b * BS:(b + 1) * BS]
        bnd = np.concatenate([[True], seg[1:] != seg[:-1]])
        rid_np[b * BS:(b + 1) * BS] = np.cumsum(bnd) - 1
        rr = np.unique(seg)
        start_rank_np[b, :len(rr)] = rr
    rid = jnp.asarray(rid_np.reshape(NB, BS))
    start_rank = jnp.asarray(start_rank_np)      # [NB, BS]

    def two_level(d):
        ds = d[slot_order].reshape(NB, BS, C)
        M = (rid[:, :, None] ==
             jnp.arange(BS, dtype=jnp.int32)[None, None, :]
             ).astype(jnp.float32)               # [NB, BS(row), BS(run)]
        part = jnp.einsum("bri,brc->bic", M, ds)  # [NB, BS, C]
        # cross-block combine: scatter partials at their run-start ranks;
        # runs straddling blocks hit the same rank row and sum correctly.
        return jnp.sum(
            jnp.zeros((N + 1, C), jnp.float32).at[
                start_rank.reshape(-1)].add(
                part.reshape(-1, C), mode="drop"))

    res["E blocked matmul + 262k scatter"] = chained(
        two_level, dslot, it, overhead)

    # F. forward-side cost of the residuals B-D need.
    def fwd_extra(frf):
        fri = frf.astype(jnp.int32)
        order = jnp.argsort(fri).astype(jnp.int32)
        sfr = fri[order]
        e = jnp.searchsorted(
            sfr, jnp.arange(N + 2, dtype=jnp.int32), method="sort")
        return jnp.sum(order) * 1e-20 + jnp.sum(e) * 1e-20

    res["F fwd argsort+ends (added cost)"] = chained(
        fwd_extra, fr.astype(jnp.float32), it, overhead)

    for k, v in res.items():
        print(f"{k:34s} {v*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
