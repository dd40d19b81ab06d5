"""A/B the full training step under different static configs to localise
cost (budget, candidate-grid length, dtype)."""

import sys, os, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nerf_signature_tpu.models.ngp import NGPConfig
from nerf_signature_tpu.ops.grid import init_occupancy_grid
from nerf_signature_tpu.render.renderer import RenderConfig
from nerf_signature_tpu.train.trainer import _train_step, make_optimizer
from nerf_signature_tpu.models.ngp import init_ngp_params


def run(tag, cfg, rc, budget, n_rays=4096, iters=30):
    params = init_ngp_params(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(1e-2, 30000)
    opt_state = optimizer.init(params)
    ema = jax.tree_util.tree_map(jnp.copy, params)

    H = rc.grid_size
    r = (np.arange(H) + 0.5) / H * 2 - 1
    x, y, z = np.meshgrid(r, r, r, indexing="ij")
    ball = (x**2 + y**2 + z**2) < 0.5**2
    occupancy = jnp.asarray(ball[None])

    rng = np.random.default_rng(0)
    origins = rng.normal(0, 1, (n_rays, 3))
    origins = origins / np.linalg.norm(origins, axis=-1, keepdims=True) * 2.0
    dirs = rng.normal(0, 0.3, (n_rays, 3)) - origins
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    rays_o = jnp.asarray(origins, jnp.float32)
    rays_d = jnp.asarray(dirs, jnp.float32)
    images = jnp.asarray(rng.uniform(0, 1, (n_rays, 3)), jnp.float32)

    def step(p, e, o, key):
        return _train_step(p, e, o, occupancy, rays_o, rays_d, images, key,
                           cfg, rc, budget, optimizer.update, False, 0.95)

    key = jax.random.PRNGKey(1)
    p, e, o, loss, _, _ = step(params, ema, opt_state, key)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for i in range(iters):
        p, e, o, loss, _, _ = step(p, e, o, jax.random.fold_in(key, i))
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{tag:42s} {dt:8.2f} ms  ({n_rays*1000/dt/1e3:.0f}k rays/s)",
          flush=True)


def main():
    base = dict(bound=1.0)
    bf16 = NGPConfig(**base, compute_dtype=jnp.bfloat16)
    f32 = NGPConfig(**base, compute_dtype=jnp.float32)
    rc1024 = RenderConfig(bound=1.0, grid_size=128, max_steps=1024)
    rc512 = RenderConfig(bound=1.0, grid_size=128, max_steps=512)
    rc256 = RenderConfig(bound=1.0, grid_size=128, max_steps=256)

    run("baseline bf16 budget=128 cand=1024", bf16, rc1024, 128)
    run("budget=64", bf16, rc1024, 64)
    run("budget=256", bf16, rc1024, 256)
    run("cand=512 (max_steps 512)", bf16, rc512, 128)
    run("cand=256 (max_steps 256)", bf16, rc256, 128)
    run("f32 compute", f32, rc1024, 128)
    run("rays=8192", bf16, rc1024, 128, n_rays=8192)
    run("rays=16384", bf16, rc1024, 128, n_rays=16384)


if __name__ == "__main__":
    main()
