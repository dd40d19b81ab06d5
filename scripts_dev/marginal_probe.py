"""Marginal-rate probes: separate per-dispatch transport from true chip rate.

VERDICT r2 weak #1: the single-dispatch engine probes (roofline.py) cannot
distinguish relay/transport deflation from on-chip engine rates — a probe
that reads "4% of peak" may be a throttled engine OR a fixed per-dispatch
tax amortised over one op instance.  This suite chains K in {1, 2, 4, 8}
instances of each hot op INSIDE ONE program and fits

    t(K) = intercept + K * marginal_cost

by least squares.  The intercept is the per-dispatch overhead (transport +
launch + allocation); the slope is the true marginal on-chip cost of one op
instance, which is what an unthrottled deployment pays.  The same fit over
the WHOLE train step (device_train_loop with n_steps = K) yields the
transport-free rays/s this chip sustains — the honest extrapolation the
"matching-or-beating perf" claim rests on.

Usage: python scripts_dev/marginal_probe.py           (real chip)
       COMPACT=0 python scripts_dev/marginal_probe.py (padded-grid step fit)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N_RAYS, BUDGET, LEVELS = 4096, 128, 16
M = N_RAYS * BUDGET
KS = (1, 2, 4, 8)
REPS = 6


def _time_program(fn, *args):
    """Median wall time of REPS chained calls (scalar-carried so executions
    serialize; value materialisation is the only relay-safe barrier)."""
    s = jnp.float32(0.0)
    s = fn(s, *args)
    float(s)  # compile + warm
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        s = fn(s, *args)
        float(s)
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) * 1e3  # ms


def _fit(ks, ts):
    """Least-squares t = a + b*K; returns (intercept_ms, slope_ms)."""
    A = np.stack([np.ones(len(ks)), np.asarray(ks, np.float64)], axis=1)
    coef, *_ = np.linalg.lstsq(A, np.asarray(ts, np.float64), rcond=None)
    return float(coef[0]), float(coef[1])


def probe_op(name, make_prog, args, pop, unit, single_rate_note=""):
    ts = []
    for K in KS:
        prog = make_prog(K)
        t = _time_program(prog, *args)
        ts.append(t)
        print(f"  {name} K={K}: {t:8.2f} ms", flush=True)
    a, b = _fit(KS, ts)
    rate = pop / (b * 1e-3)
    print(f"  -> intercept {a:7.2f} ms  slope {b:7.2f} ms/op  "
          f"marginal rate {rate / 1e6:10.1f} M {unit}/s {single_rate_note}",
          flush=True)
    return a, b, rate


def main():
    from nerf_signature_tpu.models.ngp import NGPConfig, init_ngp_params

    rng = np.random.default_rng(0)
    cfg = NGPConfig(bound=1.0, compute_dtype=jnp.bfloat16,
                    stochastic_hash_grad=True)
    params = init_ngp_params(jax.random.PRNGKey(0), cfg)
    T = params["hash_table"].shape[0]
    print(f"chip = {jax.devices()[0]}  table rows = {T}", flush=True)

    results = {}

    # ---- 1. bf16 hash-row gather (fwd hot path): 67.1M gathers/instance
    tbl = params["hash_table"].astype(jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, T, (LEVELS, M)), jnp.int32)

    def make_gather(K):
        @jax.jit
        def prog(s, t, i):
            acc = s
            for k in range(K):
                for c in range(8):  # 8 corners
                    acc = acc + jnp.sum(
                        t[(i + (k * 8 + c + 1)) % T].astype(jnp.float32)
                    ) * 1e-12
            return acc
        return prog

    print("\n== bf16 row gather (67.1M idx / instance) ==")
    results["gather"] = probe_op("gather", make_gather, (tbl, idx),
                                 8 * LEVELS * M, "idx")

    # ---- 2. fp32 scalar scatter-add (bwd hot path): 8.4M updates/instance
    n_upd = LEVELS * M // 2  # rows of 2 feats = 8.4M x 2... keep r2 shape
    sidx = jnp.asarray(rng.integers(0, T, (n_upd,)), jnp.int32)
    upd = jnp.asarray(rng.normal(0, 1, (n_upd, 2)), jnp.float32)

    def make_scatter(K):
        @jax.jit
        def prog(s, i, u):
            acc = s
            for k in range(K):
                z = jnp.zeros((T, 2), jnp.float32).at[(i + k + 1) % T].add(u)
                acc = acc + jnp.sum(z) * 1e-12
            return acc
        return prog

    print("\n== fp32 scatter-add (8.4M upd / instance) ==")
    results["scatter"] = probe_op("scatter", make_scatter, (sidx, upd),
                                  2 * n_upd, "upd")

    # ---- 3. bf16 tall matmul (MXU): 524k x 64 x 64, x8 per instance
    a0 = jnp.asarray(rng.normal(0, 1, (M, 64)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 1, (64, 64)), jnp.bfloat16)

    def make_matmul(K):
        @jax.jit
        def prog(s, aa, ww):
            y = aa + s.astype(jnp.bfloat16)
            for k in range(8 * K):  # chained: true dependency
                y = y @ ww
            return jnp.sum(y.astype(jnp.float32)) * 1e-12
        return prog

    print("\n== bf16 64x64 matmul (8x 524k-tall / instance) ==")
    ts = []
    flops = 8 * 2 * M * 64 * 64
    for K in KS:
        t = _time_program(make_matmul(K), a0, w)
        ts.append(t)
        print(f"  matmul K={K}: {t:8.2f} ms", flush=True)
    a, b = _fit(KS, ts)
    tflops = flops / (b * 1e-3) / 1e12
    print(f"  -> intercept {a:7.2f} ms  slope {b:7.2f} ms/op  "
          f"marginal rate {tflops:8.2f} TFLOP/s "
          f"(v5e bf16 peak ~197)", flush=True)
    results["matmul"] = (a, b, tflops)

    # ---- 4. occupancy bool gather (march): 4.19M gathers/instance
    occ = jnp.asarray(rng.random(128 ** 3) < 0.065)
    gidx = jnp.asarray(rng.integers(0, 128 ** 3, (N_RAYS, 1024)), jnp.int32)

    def make_occg(K):
        @jax.jit
        def prog(s, o, i):
            acc = s
            for k in range(K):
                acc = acc + jnp.sum(
                    o[(i + k + 1) % o.shape[0]].astype(jnp.float32)
                ) * 1e-9
            return acc
        return prog

    print("\n== occupancy bool gather (4.19M idx / instance) ==")
    results["occ_gather"] = probe_op("occ-gather", make_occg, (occ, gidx),
                                     N_RAYS * 1024, "idx")

    # ---- 5. WHOLE TRAIN STEP: fit over n_steps inside one scan program
    print("\n== full train step (device_train_loop, n_steps = K) ==")
    from nerf_signature_tpu.data.rays import get_rays, rand_poses
    from nerf_signature_tpu.ops.grid import init_occupancy_grid
    from nerf_signature_tpu.render.renderer import RenderConfig
    from nerf_signature_tpu.train.device_loop import device_train_loop
    from nerf_signature_tpu.train.trainer import make_optimizer

    compact = float(os.environ.get("COMPACT", "0.25"))
    rc = RenderConfig(bound=1.0, grid_size=128, max_steps=1024,
                      compact_frac=compact)
    H = W = 256
    poses = rand_poses(rng, 16, radius=1.8)
    intrinsics = np.array([W / 1.2, W / 1.2, W / 2, H / 2], np.float32)
    images = []
    for p in poses:
        rays = get_rays(p[None], intrinsics, H, W, -1)
        o, d = rays["rays_o"][0], rays["rays_d"][0]
        bq = np.sum(o * d, -1)
        c = np.sum(o * o, -1) - 0.4 ** 2
        disc = bq * bq - c
        hit = disc > 0
        t = -bq - np.sqrt(np.maximum(disc, 0))
        pt = o + t[..., None] * d
        rgba = np.zeros((o.shape[0], 4), np.float32)
        rgba[:, 0] = np.where(hit, 0.6 + 0.4 * np.sin(8 * pt[:, 0]), 0)
        rgba[:, 1] = np.where(hit, 0.5 + 0.5 * np.cos(7 * pt[:, 1]), 0)
        rgba[:, 2] = np.where(hit, 0.3, 0)
        rgba[:, 3] = hit
        images.append(np.clip(rgba, 0, 1))
    images = jnp.asarray(np.stack(images))
    poses_d = jnp.asarray(poses)
    intr_d = jnp.asarray(intrinsics)
    optimizer = make_optimizer(1e-2, 30000)

    def fresh_state():
        p = init_ngp_params(jax.random.PRNGKey(0), cfg)
        return (p, jax.tree_util.tree_map(jnp.copy, p), optimizer.init(p),
                init_occupancy_grid(1.0, rc.grid_size))

    # converge the grid once so every K sees the same occupancy regime
    p0, e0, o0, g0 = fresh_state()
    out = device_train_loop(p0, e0, o0, g0, poses_d, images, intr_d,
                            jax.random.PRNGKey(1), 0, cfg, rc, BUDGET,
                            optimizer.update, True, 0.95, 8, N_RAYS, H, W)
    warm = jax.tree_util.tree_map(np.asarray, out[:4])
    float(jnp.sum(out[4]))

    ts = []
    for K in KS:
        run = functools.partial(
            device_train_loop, cfg=cfg, rc=rc, budget=BUDGET,
            opt_update=optimizer.update, has_alpha=True, ema_decay=0.95,
            n_steps=K, num_rays=N_RAYS, H=H, W=W,
        )
        st = jax.tree_util.tree_map(jnp.asarray, warm)
        out = run(*st, poses_d, images, intr_d, jax.random.PRNGKey(2), 100)
        float(jnp.sum(out[4]))  # compile
        times = []
        for r in range(REPS):
            st = jax.tree_util.tree_map(jnp.asarray, warm)
            t0 = time.perf_counter()
            out = run(*st, poses_d, images, intr_d,
                      jax.random.fold_in(jax.random.PRNGKey(3), r), 100)
            float(jnp.sum(out[4]))
            times.append(time.perf_counter() - t0)
        t = float(np.median(times)) * 1e3
        ts.append(t)
        print(f"  step-scan K={K}: {t:8.2f} ms", flush=True)
    a, b = _fit(KS, ts)
    rps = N_RAYS / (b * 1e-3)
    print(f"  -> intercept {a:7.2f} ms  slope {b:7.2f} ms/step", flush=True)
    print(f"\n== summary (compact_frac={compact}) ==")
    print(f"  transport-free train rate: {rps:,.0f} rays/s "
          f"(vs dispatch-measured bench: slope excludes the "
          f"{a:.0f} ms/dispatch relay tax)")
    g_int, g_slope, g_rate = results["gather"]
    s_int, s_slope, s_rate = results["scatter"]
    o_int, o_slope, o_rate = results["occ_gather"]
    print(f"  gather   marginal {g_rate/1e6:8.1f} M idx/s   "
          f"(dispatch-inclusive r2 probe: 172.8)")
    print(f"  scatter  marginal {s_rate/1e6:8.1f} M upd/s   "
          f"(dispatch-inclusive r2 probe: 48.2)")
    print(f"  occ-gthr marginal {o_rate/1e6:8.1f} M idx/s")
    print(f"  matmul   marginal {results['matmul'][2]:8.2f} TFLOP/s "
          f"(dispatch-inclusive r2 probe: 7.74)")


if __name__ == "__main__":
    main()
