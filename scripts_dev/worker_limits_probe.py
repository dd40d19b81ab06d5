"""Root-cause probe for the 32-step-scan worker crash (VERDICT r1 weak #3).

Hypotheses for why a 32-step training scan (or a 16-chunk budget-256
lax.map) reproducibly kills the tunneled TPU worker while 8-step scans are
stable:
  A. EXECUTE-DURATION limit: one execute call running >~T seconds trips a
     relay/worker timeout.  8 steps ~ 4s, 32 steps ~ 17s.
  B. PROGRAM/BUFFER SIZE: the longer scan's program or its live-buffer peak
     crosses a memory limit.

Phase A isolates duration with a CONSTANT-size program (fori_loop of
matmuls, iterations scaled to hit a target wall time).  If long-running
small programs also kill the worker, it's duration, not size.
Phase B runs the real device_train_loop at K in {8, 16, 24, 32}.

After each probe the worker is health-checked with a trivial op; a crashed
worker shows up as an exception or a multi-second health-check.  Run this
LAST — a crashed worker leaves the next run ~6x slow (PERF.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def health():
    t0 = time.perf_counter()
    try:
        v = float(jnp.sum(jnp.ones((8, 8))))
        dt = time.perf_counter() - t0
        return f"alive ({dt*1e3:.0f} ms, {v:.0f})"
    except Exception as e:
        return f"DEAD: {type(e).__name__}: {e}"


def phase_a():
    print("== phase A: execute-duration scaling (constant program size) ==")
    a = jnp.ones((4096, 4096), jnp.bfloat16)

    def make(n):
        @jax.jit
        def f(x):
            def body(i, acc):
                return acc @ a * (1.0 / 64.0)
            return jnp.sum(jax.lax.fori_loop(0, n, body, x).astype(jnp.float32))
        return f

    # calibrate: one matmul at 4096^3 is ~0.02s at 6.5 TFLOP/s
    f = make(8)
    t0 = time.perf_counter()
    float(f(a))
    print(f"  calibrate n=8 (incl compile): {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    float(f(a))
    per = (time.perf_counter() - t0) / 8
    print(f"  per-matmul: {per*1e3:.0f} ms")

    for target in (2, 5, 10, 20, 40, 80):
        n = max(1, int(target / per))
        f = make(n)
        t0 = time.perf_counter()
        try:
            float(f(a))
            print(f"  target {target:3d}s (n={n}): OK "
                  f"{time.perf_counter()-t0:.1f}s | {health()}", flush=True)
        except Exception as e:
            print(f"  target {target:3d}s (n={n}): FAILED after "
                  f"{time.perf_counter()-t0:.1f}s: {type(e).__name__} | "
                  f"{health()}", flush=True)
            return


def phase_b():
    print("== phase B: real train scan at K steps/dispatch ==")
    from nerf_signature_tpu.data.rays import get_rays, rand_poses
    from nerf_signature_tpu.models.ngp import NGPConfig, init_ngp_params
    from nerf_signature_tpu.ops.grid import init_occupancy_grid
    from nerf_signature_tpu.render.renderer import RenderConfig
    from nerf_signature_tpu.train.device_loop import device_train_loop
    from nerf_signature_tpu.train.trainer import make_optimizer

    cfg = NGPConfig(bound=1.0, compute_dtype=jnp.bfloat16,
                    stochastic_hash_grad=True)
    rc = RenderConfig(bound=1.0, grid_size=128, max_steps=1024)
    params = init_ngp_params(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(1e-2, 30000)
    opt_state = optimizer.init(params)
    ema = jax.tree_util.tree_map(jnp.copy, params)
    occ = init_occupancy_grid(1.0, 128)
    rng = np.random.default_rng(0)
    H = W = 256
    poses = jnp.asarray(rand_poses(rng, 4, radius=1.8))
    intr = jnp.asarray([W / 1.2, W / 1.2, W / 2, H / 2], jnp.float32)
    images = jnp.asarray(rng.uniform(0, 1, (4, H * W, 4)), jnp.float32)

    for k in (8, 16, 24, 32):
        t0 = time.perf_counter()
        try:
            out = device_train_loop(
                params, ema, opt_state, occ, poses, images, intr,
                jax.random.PRNGKey(k), 0, cfg, rc, 128, optimizer.update,
                True, 0.95, k, 4096, H, W,
            )
            np.asarray(out[4])
            dt = time.perf_counter() - t0
            print(f"  K={k:2d}: OK {dt:.1f}s ({4096*k/dt:.0f} rays/s incl "
                  f"compile) | {health()}", flush=True)
            params, ema, opt_state, occ = out[:4]
        except Exception as e:
            print(f"  K={k:2d}: FAILED after {time.perf_counter()-t0:.1f}s: "
                  f"{type(e).__name__}: {str(e)[:200]} | {health()}",
                  flush=True)
            return


if __name__ == "__main__":
    print(f"platform: {jax.devices()[0].platform}")
    if os.environ.get("PHASE", "a") in ("a", "both"):
        phase_a()
    if os.environ.get("PHASE", "a") in ("b", "both"):
        phase_b()
