"""Benchmark: clean-NGP training throughput (rays/sec) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference (torch-ngp + tcnn + CUDA marching) has no published
numbers in-repo (BASELINE.md); community-measured torch-ngp training
throughput on an A100 at the headline config (4096 rays/step, Blender-scale
scene, fused kernels) is ~2e5 rays/sec.  The north-star target is >2x that
per TPU chip (BASELINE.json), so vs_baseline = value / 4e5: >1.0 beats the
target, >0.5 beats the A100 estimate at parity.

The scene is synthetic (a solid ball; no datasets are vendored): the timed
program is the real jitted train step — march over a trained-like occupancy
grid (ball-shaped, ~6% occupancy like a converged Blender scene), full hash
encoding + MLPs, composite, loss, backward, Adam — at the headline shapes
(4096 rays, budget 128, grid 128^3, 16-level 2^19 hash table).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_RAYS_PER_SEC = 4.0e5  # 2x A100 torch-ngp estimate (see docstring)


def main():
    from nerf_signature_tpu.models.ngp import NGPConfig, init_ngp_params
    from nerf_signature_tpu.ops.grid import init_occupancy_grid
    from nerf_signature_tpu.render.renderer import RenderConfig
    from nerf_signature_tpu.train.trainer import _train_step, make_optimizer

    cfg = NGPConfig(bound=1.0, compute_dtype=jnp.bfloat16)
    rc = RenderConfig(bound=1.0, grid_size=128, max_steps=1024)
    n_rays, budget = 4096, 128

    params = init_ngp_params(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(1e-2, 30000)
    opt_state = optimizer.init(params)
    ema = jax.tree_util.tree_map(jnp.copy, params)

    # trained-like occupancy: solid ball radius 0.5 -> ~6.5% cells occupied
    occ = init_occupancy_grid(1.0, 128)
    H = 128
    r = (np.arange(H) + 0.5) / H * 2 - 1
    x, y, z = np.meshgrid(r, r, r, indexing="ij")
    ball = (x**2 + y**2 + z**2) < 0.5**2
    occupancy = jnp.asarray(ball[None])

    rng = np.random.default_rng(0)
    # orbit-camera rays through the ball
    origins = rng.normal(0, 1, (n_rays, 3))
    origins = origins / np.linalg.norm(origins, axis=-1, keepdims=True) * 2.0
    targets = rng.normal(0, 0.3, (n_rays, 3))
    dirs = targets - origins
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    rays_o = jnp.asarray(origins, jnp.float32)
    rays_d = jnp.asarray(dirs, jnp.float32)
    images = jnp.asarray(rng.uniform(0, 1, (n_rays, 3)), jnp.float32)

    def step(params, ema, opt_state, key):
        return _train_step(
            params, ema, opt_state, occupancy, rays_o, rays_d, images, key,
            cfg, rc, budget, optimizer.update, False, 0.95,
        )

    # pre-split keys on device: a per-iteration fold_in is its own dispatch
    # (a full relay roundtrip under axon) and was dominating the measurement
    n_warm, n_meas = 50, 150
    keys = jax.random.split(jax.random.PRNGKey(1), n_warm + n_meas + 1)
    params, ema, opt_state, loss, _, n_occ = step(params, ema, opt_state, keys[0])
    jax.block_until_ready(loss)

    # slope-based timing: time(n_warm + n_meas) - time(n_warm) removes
    # constant dispatch/queue overheads
    t0 = time.perf_counter()
    for i in range(n_warm):
        params, ema, opt_state, loss, _, _ = step(params, ema, opt_state,
                                                  keys[1 + i])
    jax.block_until_ready(loss)
    t1 = time.perf_counter()
    for i in range(n_meas):
        params, ema, opt_state, loss, _, _ = step(params, ema, opt_state,
                                                  keys[1 + n_warm + i])
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t1

    rays_per_sec = n_rays * n_meas / dt
    print(json.dumps({
        "metric": "train_rays_per_sec",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
