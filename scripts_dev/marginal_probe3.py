"""Full-step marginal cost: fit device_train_loop wall time vs n_steps.

The slope (ms/step) is the true on-chip cost of one fused training step with
the per-dispatch relay tax (the intercept, ~27 ms measured by
marginal_probe.py) removed — i.e. what a non-relay host would see.  The
extrapolated transport-free training rate is n_rays / slope.

The earlier in-probe attempt (marginal_probe.py, "full train step") produced
a garbage fit because each K recompiled a different program right after a
worker crash; this one warms every K, interleaves the K visits round-robin
(so drift/crashes hit all Ks equally), and uses medians.

Usage: python scripts_dev/marginal_probe3.py   (real chip; ~3 min)
       BENCH_EXACT=1 ... for the exact-gradient path
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

KS = (1, 2, 4, 8)
ROUNDS = 5


def main():
    from nerf_signature_tpu.data.rays import get_rays, rand_poses
    from nerf_signature_tpu.models.ngp import NGPConfig, init_ngp_params
    from nerf_signature_tpu.ops.grid import init_occupancy_grid
    from nerf_signature_tpu.render.renderer import RenderConfig
    from nerf_signature_tpu.train.device_loop import device_train_loop
    from nerf_signature_tpu.train.trainer import make_optimizer

    cfg = NGPConfig(
        bound=1.0, compute_dtype=jnp.bfloat16,
        stochastic_hash_grad=os.environ.get("BENCH_EXACT") != "1",
    )
    rc = RenderConfig(
        bound=1.0, grid_size=128, max_steps=1024,
        compact_frac=float(os.environ.get("BENCH_COMPACT", "0.25")),
    )
    n_rays, budget = 4096, 128
    H = W = 256
    print(f"chip = {jax.devices()[0]}  stochastic="
          f"{cfg.stochastic_hash_grad} compact={rc.compact_frac}", flush=True)

    params = init_ngp_params(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(1e-2, 30000)
    opt_state = optimizer.init(params)
    ema = jax.tree_util.tree_map(jnp.copy, params)
    occ = init_occupancy_grid(1.0, rc.grid_size)

    rng = np.random.default_rng(0)
    poses = rand_poses(rng, 16, radius=1.8)
    intrinsics = np.array([W / 1.2, W / 1.2, W / 2, H / 2], np.float32)
    images = []
    for p in poses:
        rays = get_rays(p[None], intrinsics, H, W, -1)
        o, d = rays["rays_o"][0], rays["rays_d"][0]
        b = np.sum(o * d, -1)
        c = np.sum(o * o, -1) - 0.4 ** 2
        disc = b * b - c
        hit = disc > 0
        t = -b - np.sqrt(np.maximum(disc, 0))
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

    def run(state, key, step0, k):
        # donation invalidates inputs: thread one live state through
        params, ema, opt_state, occ = state
        out = device_train_loop(
            params, ema, opt_state, occ, poses_d, images, intr_d, key,
            step0, cfg, rc, budget, optimizer.update, True, 0.95, k,
            n_rays, H, W,
        )
        np.asarray(out[4])  # materialise = barrier
        return out[:4]

    # converge the grid once at K=8, then warm-compile every K on the final
    # state (grid occupancy affects compaction population -> keep it fixed)
    state = (params, ema, opt_state, occ)
    state = run(state, jax.random.PRNGKey(1), 0, 8)
    step0 = 8
    for k in KS:
        state = run(state, jax.random.PRNGKey(10 + k), step0, k)
        step0 += k

    times = {k: [] for k in KS}
    for r in range(ROUNDS):
        for k in KS:
            t0 = time.perf_counter()
            state = run(state, jax.random.PRNGKey(100 + 10 * r + k), step0, k)
            times[k].append((time.perf_counter() - t0) * 1e3)
            step0 += k
    meds = [float(np.median(times[k])) for k in KS]
    for k, m in zip(KS, meds):
        print(f"  step-scan K={k}: {m:8.2f} ms  (all: "
              + " ".join(f"{t:.0f}" for t in times[k]) + ")", flush=True)
    A = np.stack([np.ones(len(KS)), np.asarray(KS, np.float64)], axis=1)
    coef, *_ = np.linalg.lstsq(A, np.asarray(meds, np.float64), rcond=None)
    a, b = float(coef[0]), float(coef[1])
    rate = n_rays / (b * 1e-3)
    print(f"  -> intercept {a:7.2f} ms  slope {b:7.2f} ms/step")
    print(f"  transport-free train rate: {rate:,.0f} rays/s "
          f"(dispatch-inclusive bench at K=8 folds the intercept /8)",
          flush=True)


if __name__ == "__main__":
    main()
