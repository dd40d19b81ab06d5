"""Break down the training-step time on the real chip.

All timed programs take their arrays as ARGUMENTS (a closure-captured array
becomes an embedded constant, which the axon tunnel re-ships every call —
measured 1.8 s/call artifacts)."""

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
    """Times fn(seed_scalar, *args) with a chained scalar so every call is a
    distinct, data-dependent execution (the axon relay appears to collapse
    identical execute requests)."""
    s = jnp.float32(0.0)
    s = fn(s, *args)
    float(s)  # materialise: the only reliable barrier under the axon relay
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(s, *args)
    float(s)  # materialise: the only reliable barrier under the axon relay
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:28s} {dt:8.3f} ms", flush=True)
    return dt


def chained(f):
    """Wrap a tensor program into a scalar-chained, jitted step."""
    @jax.jit
    def g(s, *args):
        out = f(s, *args)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32) if l.dtype != bool
                           else l.astype(jnp.float32)) for l in leaves) * 1e-12
    return g


def main():
    cfg = NGPConfig(bound=1.0, compute_dtype=jnp.bfloat16,
                    stochastic_hash_grad=os.environ.get("STOCH") == "1",
                    # FWD_CORNERS=1 / LEVEL_STRIDE=2: profile the round-4
                    # subsampled step (see PERF.md)
                    hash_fwd_corners=int(os.environ.get("FWD_CORNERS", "8")),
                    hash_level_stride=int(os.environ.get("LEVEL_STRIDE",
                                                         "1")))
    if cfg.hash_fwd_corners != 8 and not cfg.stochastic_hash_grad:
        raise SystemExit("FWD_CORNERS=1 requires STOCH=1")
    # COMPACT=<frac>: profile the globally-sample-compacted step (the bench
    # default is 0.25; per-component rows then show where the post-compaction
    # wall sits)
    rc = RenderConfig(bound=1.0, grid_size=128, max_steps=1024,
                      compact_frac=float(os.environ.get("COMPACT", "0")))
    n_rays, budget = 4096, 128

    params = init_ngp_params(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(1e-2, 30000)
    opt_state = optimizer.init(params)
    ema = jax.tree_util.tree_map(jnp.copy, params)

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

    timeit("march only", chained(lambda s, occ, ro, rd, nr, fr: march_rays(
        ro + s, rd, occ, nr, fr, bound=1.0, dt_gamma=0.0,
        max_steps=1024, budget=budget, grid_size=128)),
        occupancy, rays_o, rays_d, near, far)

    m = march_rays(rays_o, rays_d, occupancy, near, far, bound=1.0,
                   dt_gamma=0.0, max_steps=1024, budget=budget, grid_size=128)
    xs = m["xyzs"].reshape(-1, 3)
    ds = m["dirs"].reshape(-1, 3)
    timeit("field fwd (M=524k)",
           chained(lambda s, p, a, b: ngp_field(p, cfg, a + s, b)),
           params, xs, ds)

    x01 = (xs + 1.0) / 2.0
    timeit("hash encode fwd",
           chained(lambda s, t, a: hash_encode(a + s, t, cfg.resolutions,
                                               cfg.log2_hashmap_size)),
           params["hash_table"], x01)

    timeit("full render fwd",
           chained(lambda s, p, occ, ro, rd: render_rays_occ(
               lambda a, b: ngp_field(p, cfg, a, b), occ, ro + s, rd,
               rc, budget=budget, bg_color=1.0)),
           params, occupancy, rays_o, rays_d)

    # gradient of hash encode (gather backward = scatter-add)
    timeit("hash encode grad",
           chained(lambda s, t, a: jax.grad(
               lambda tt: jnp.sum(hash_encode(a + s, tt, cfg.resolutions,
                                              cfg.log2_hashmap_size) ** 2))(t)),
           params["hash_table"], x01)

    # isolated optimizer cost: Adam moments + param update + EMA over the
    # FULL param pytree (17M params; fake grads = params, same shapes)
    @jax.jit
    def opt_only(s, p, e, o):
        g = jax.tree_util.tree_map(lambda t: t * 1e-9 + s, p)
        updates, o2 = optimizer.update(g, o, p)
        import optax

        p2 = optax.apply_updates(p, updates)
        e2 = jax.tree_util.tree_map(lambda a, b: 0.95 * a + 0.05 * b, e, p2)
        leaves = jax.tree_util.tree_leaves((p2, e2))
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves) * 1e-12

    timeit("adam+ema (17M params)", opt_only, params, ema, opt_state)

    def step(p, e, o, key):
        return _train_step(p, e, o, occupancy, rays_o, rays_d, images, key,
                           cfg, rc, budget, optimizer.update, False, 0.95)

    key = jax.random.PRNGKey(1)
    p, e, o, loss, _, _ = step(params, ema, opt_state, key)
    float(jnp.sum(loss))  # materialise: reliable barrier under the relay
    t0 = time.perf_counter()
    iters = 30
    for i in range(iters):
        p, e, o, loss, _, _ = step(p, e, o, jax.random.fold_in(key, i))
    float(jnp.sum(loss))  # materialise: reliable barrier under the relay
    print(f"{'full train step':28s} {(time.perf_counter()-t0)/iters*1e3:8.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
