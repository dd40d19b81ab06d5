"""Break down the training-step time on the real chip: march / field fwd /
full fwd / full step, plus key sub-ops."""

import sys, os, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nerf_signature_tpu.models.ngp import NGPConfig, init_ngp_params, ngp_field
from nerf_signature_tpu.ops.grid import init_occupancy_grid
from nerf_signature_tpu.ops.intersect import near_far_from_aabb
from nerf_signature_tpu.ops.marching import march_rays
from nerf_signature_tpu.ops.hashenc import hash_encode
from nerf_signature_tpu.render.renderer import RenderConfig, render_rays_occ
from nerf_signature_tpu.train.trainer import _train_step, make_optimizer


def timeit(name, fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:28s} {dt:8.3f} ms")
    return dt


def main():
    cfg = NGPConfig(bound=1.0, compute_dtype=jnp.bfloat16)
    rc = RenderConfig(bound=1.0, grid_size=128, max_steps=1024)
    n_rays, budget = 4096, 128

    params = init_ngp_params(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(1e-2, 30000)
    opt_state = optimizer.init(params)
    ema = jax.tree_util.tree_map(jnp.copy, params)

    occ = init_occupancy_grid(1.0, 128)
    H = 128
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
    aabb = jnp.array([-1.0, -1, -1, 1, 1, 1])

    near, far = near_far_from_aabb(rays_o, rays_d, aabb, 0.2)

    march = jax.jit(lambda: march_rays(
        rays_o, rays_d, occupancy, near, far, bound=1.0, dt_gamma=0.0,
        max_steps=1024, budget=budget, grid_size=128))
    timeit("march only", march)

    m = march()
    M = n_rays * budget
    xs = m["xyzs"].reshape(-1, 3)
    ds = m["dirs"].reshape(-1, 3)
    field = jax.jit(lambda: ngp_field(params, cfg, xs, ds))
    timeit("field fwd (M=524k)", field)

    x01 = (xs + 1.0) / 2.0
    henc = jax.jit(lambda: hash_encode(x01, params["hash_table"],
                                       cfg.resolutions, cfg.log2_hashmap_size))
    timeit("hash encode only", henc)

    render = jax.jit(lambda: render_rays_occ(
        lambda a, b: ngp_field(params, cfg, a, b), occupancy, rays_o, rays_d,
        rc, budget=budget, bg_color=1.0))
    timeit("full render fwd", render)

    def step(p, e, o, key):
        return _train_step(p, e, o, occupancy, rays_o, rays_d, images, key,
                           cfg, rc, budget, optimizer.update, False, 0.95)

    key = jax.random.PRNGKey(1)
    p, e, o, loss, _, _ = step(params, ema, opt_state, key)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    iters = 30
    for i in range(iters):
        p, e, o, loss, _, _ = step(p, e, o, jax.random.fold_in(key, i))
    jax.block_until_ready(loss)
    print(f"{'full train step':28s} {(time.perf_counter()-t0)/iters*1e3:8.3f} ms")

    # Adam-only cost on the hash table
    opt2 = make_optimizer(1e-2, 30000)
    os2 = opt2.init(params)
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    adam = jax.jit(lambda s: opt2.update(g, s, params))
    timeit("adam update only", adam, os2)


if __name__ == "__main__":
    main()
