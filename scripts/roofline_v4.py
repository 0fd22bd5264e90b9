"""v4 rasterizer roofline: per-stage measured time vs speed-of-light
bound on the bench scene (@512², 65k splats, tile 32², dup 16,
MPT 1024 — the BENCH_r{N} configuration).

The composite kernels' light bound depends on the LIVE chunk count —
the per-tile (count, transmittance-saturation) loop gates
(flatsort._fwd_kernel) skip chunks once every pixel saturates, so the
count-derived bound overstates work. This script replays the binning
on CPU and simulates the kernel's exact per-chunk alpha/transmittance
math in numpy to count the chunks each gate actually passes, then
prints the bound table. On TPU it also measures each stage with the
chained-dependence protocol (bench.py) so the %%-of-light column is
fully reproducible from one command:

    python scripts/roofline_v4.py            # bounds only (CPU)
    python scripts/roofline_v4.py --measure  # + measured (TPU)

v5e peaks used: 197 bf16 / ~49 f32 MXU TFLOP/s, 819 GB/s HBM,
VPU f32 ~= 8 lanes x 128 sublane-groups x 8 ALUs x 0.94 GHz ~= 7.7e12
elementwise op/s (the VPU number is the least certain; bounds quote it
explicitly so the assumption is auditable).
"""

import argparse
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

HBM = 819e9          # B/s
VPU = 7.7e12         # f32 elementwise op/s (see module docstring)
S, N, TILE, DUP, MPT = 512, 65536, 32, 16, 1024
T_EPS = 1e-4


def build_scene(n=N, seed=7):
    rng = np.random.default_rng(seed)
    g = np.zeros((n, 14), np.float32)
    g[:, 0:3] = rng.normal(0, 0.35, (n, 3))
    g[:, 3] = rng.uniform(0.2, 1.0, n)
    g[:, 4:7] = rng.uniform(0.005, 0.03, (n, 3))
    q = rng.normal(0, 1, (n, 4))
    g[:, 7:11] = q / np.linalg.norm(q, axis=1, keepdims=True)
    g[:, 11:14] = rng.uniform(0, 1, (n, 3))
    return g


def simulate_live_chunks(params, counts):
    """Replay the fwd kernel's chunk-gate in numpy: returns
    (count_gated_chunks, live_chunks) summed over tiles."""
    from lgm_tpu.ops.gsplat.projection import ALPHA_MAX, ALPHA_MIN

    T, NC, R, G = params.shape
    tiles_x = S // TILE
    ys, xs = np.mgrid[0:TILE, 0:TILE].astype(np.float32)
    px = xs.reshape(-1)
    py = ys.reshape(-1)
    total_cnt, total_live = 0, 0
    for t in range(T):
        cnt = int(counts[t])
        n_chunks = (cnt + G - 1) // G
        total_cnt += n_chunks
        tox = (t % tiles_x) * TILE
        toy = (t // tiles_x) * TILE
        Tvec = np.ones(TILE * TILE, np.float32)
        for k in range(NC):
            if k * G >= cnt or Tvec.max() <= T_EPS:
                break
            total_live += 1
            blk = params[t, k]          # [R, G]
            mx = blk[0] - tox
            my = blk[1] - toy
            A, B, C, op = blk[2], blk[3], blk[4], blk[5]
            dx = px[:, None] - mx[None, :]
            dy = py[:, None] - my[None, :]
            power = -0.5 * (A * dx * dx + C * dy * dy) - B * dx * dy
            araw = op * np.exp(np.minimum(power, 0.0))
            use = (power <= 0.0) & (araw >= ALPHA_MIN)
            alpha = np.where(use, np.minimum(araw, ALPHA_MAX), 0.0)
            Tvec = Tvec * np.prod(1.0 - alpha, axis=1)
    return total_cnt, total_live


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measure", action="store_true",
                    help="measure stage times (TPU)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lgm_tpu.ops.gsplat import flatsort, projection
    from lgm_tpu.utils import camera

    g = jnp.asarray(build_scene())
    pose = camera.orbit_camera(10.0, 30.0, 1.5)
    cams = camera.build_camera_inputs(pose[None], 49.1, 0.5, 2.5)
    view = jnp.asarray(cams["cam_view"][0])
    tan = float(np.tan(0.5 * np.deg2rad(49.1)))

    params, counts = jax.jit(
        lambda gg: flatsort._prepare_view(
            gg, view, S, tan, 1.0, TILE, TILE, DUP, MPT, False)
    )(g)
    params = np.asarray(params)
    counts = np.asarray(counts)
    print(f"tiles={len(counts)} slots={len(counts) * MPT} "
          f"binned={counts.sum()} mean={counts.mean():.0f} "
          f"max={counts.max()}")

    t0 = time.time()
    cnt_chunks, live_chunks = simulate_live_chunks(params, counts)
    print(f"chunk-steps: count-gated={cnt_chunks} "
          f"live(after T-saturation exit)={live_chunks} "
          f"({100 * live_chunks / max(cnt_chunks, 1):.0f}%)  "
          f"[simulated in {time.time() - t0:.0f}s]")

    G, P = 128, TILE * TILE
    # Forward kernel per live chunk: ~20 [G, P] VPU passes (alpha chain
    # incl. exp ~8, prefix-product network 14 incl. rolls, w/acc/T ~4 —
    # the two MXU contractions overlap and are not the bound).
    fwd_ops = 22 * G * P * live_chunks
    # Backward kernel: two prefix networks + alpha replay + dalpha
    # chain: ~55 [G, P] passes per live chunk.
    bwd_ops = 55 * G * P * live_chunks
    # Slot gather: 262k random 36 B rows; floor ~= 1 row/cycle.
    gather_s = len(counts) * MPT / 0.94e9
    # Scatter-add backward: measured per-index floor on this chip
    # (scripts/microbench_gs.py: ~14.5 ns/row across all layouts).
    scatter_s = len(counts) * MPT * 14.5e-9
    # Flat [N*dup] i32 bitonic sort: ~log2(n)*(log2(n)+1)/2 = 210
    # compare-exchange passes over the 4 MB key array, each reading and
    # writing it once.
    n_keys = N * DUP
    passes = 210
    sort_s = passes * 2 * 4 * n_keys / HBM
    bounds = {
        "composite fwd kernel": fwd_ops / VPU,
        "composite bwd kernel": bwd_ops / VPU,
        "slot gather": gather_s,
        "scatter-add (bwd)": scatter_s,
        "flat sort [1M]": sort_s,
        "projection fwd": (14 + 9) * 4 * N / HBM,
    }
    print("\nstage bounds (bench scene, per view):")
    for k, v in bounds.items():
        print(f"  {k:24s} {v * 1e3:7.3f} ms")

    if not args.measure:
        print("\n(run with --measure on TPU for the %-of-light table)")
        return

    # --- measured stage times, chained protocol ----------------------
    def roundtrip():
        f = jax.jit(lambda a: a * 2.0)
        x = jnp.ones((8, 8))
        float(jnp.sum(f(x)))
        ts = []
        for _ in range(8):
            t0 = time.time()
            float(jnp.sum(f(x)))
            ts.append(time.time() - t0)
        return min(ts)

    def chained(fn, a0, iters, reduce_fn):
        @jax.jit
        def rep(a):
            def body(i, carry):
                a, acc = carry
                s = reduce_fn(fn(a))
                return (a + 1e-20 * s, acc + s)
            return jax.lax.fori_loop(0, iters, body, (a, 0.0))[1]

        float(rep(a0))
        ts = []
        for _ in range(3):
            t0 = time.time()
            float(rep(a0))
            ts.append(time.time() - t0)
        return max((min(ts) - overhead) / iters, 1e-9)

    overhead = roundtrip()
    bg = jnp.ones(3)
    pf = flatsort._pf_split_t(TILE, TILE)
    tiles_x = S // TILE
    paramsj = jnp.asarray(params)
    countsj = jnp.asarray(counts)

    meas = {}
    meas["projection fwd"] = chained(
        lambda gg: projection.project_gaussians(gg, view, S, tan),
        g, 40, lambda o: jnp.sum(o.mean2d) + jnp.sum(o.conic))
    meas["prepare (proj+bin+gather)"] = chained(
        lambda gg: flatsort._prepare_view(
            gg, view, S, tan, 1.0, TILE, TILE, DUP, MPT, False)[0],
        g, 10, lambda p: jnp.sum(p))
    meas["composite fwd kernel"] = chained(
        lambda pp: flatsort._composite_flat(
            pp, countsj, pf, False, tiles_x, TILE, TILE, False),
        paramsj, 10, lambda o: jnp.sum(o[:, 0:5]))

    def comp_fwdbwd(pp):
        def loss(x):
            o = flatsort._composite_flat(x, countsj, pf, False, tiles_x,
                                         TILE, TILE, False)
            return jnp.sum(o[:, 0:5])
        l, gr = jax.value_and_grad(loss)(pp)
        return l + jnp.sum(gr)

    meas["composite fwd+bwd kernels"] = chained(
        comp_fwdbwd, paramsj, 10, lambda s: s)

    def full_fwd(gg):
        return flatsort.render_flatsort(gg, view, S, tan, bg,
                                        tile_h=TILE, tile_w=TILE, dup=DUP)

    meas["render fwd (total)"] = chained(
        full_fwd, g, 10,
        lambda o: jnp.sum(o["image"]) + jnp.sum(o["alpha"]))

    def full_fwdbwd(gg):
        def loss(x):
            o = full_fwd(x)
            return jnp.sum(o["image"]) + jnp.sum(o["alpha"])
        l, gr = jax.value_and_grad(loss)(gg)
        return l + jnp.sum(gr)

    meas["render fwd+bwd (total)"] = chained(full_fwdbwd, g, 10,
                                             lambda s: s)

    print("\nmeasured (chained protocol, ms/view):")
    for k, v in meas.items():
        print(f"  {k:28s} {v * 1e3:8.3f} ms")

    cf = meas["composite fwd kernel"]
    cb = meas["composite fwd+bwd kernels"] - cf
    print("\n%-of-light (measured bound / measured):")
    rows = [
        ("composite fwd kernel", bounds["composite fwd kernel"], cf),
        ("composite bwd kernel", bounds["composite bwd kernel"], cb),
    ]
    for name, b, m in rows:
        print(f"  {name:24s} {100 * b / m:5.1f}%")


if __name__ == "__main__":
    main()
