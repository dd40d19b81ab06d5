"""Roofline accounting for the training step (VERDICT r1 weak #1).

Measures (a) the hardware engine rates this workload is bound by — hash-row
gather, scatter-add update, bf16 matmul, occupancy (bool) gather — and
(b) each pipeline component in isolation, then compares the FULL train step
against the compound floor sum(components).  If full/floor ~ 1 and each
component runs at its engine rate, the step is at the proxy's
speed-of-light; the gap, if any, is the harvestable remainder.

Per-step op counts at the headline shape (4096 rays x budget 128 = 524k
samples, 16 levels, 2^19-row tables, stochastic hash grads):
  march:    4096 x 1024 = 4.19M bool gathers + cumsum + 1 scatter
  hash fwd: 524k x 16 x 8 = 67.1M bf16 [.,2]-row gathers
  hash bwd: 524k x 16 x 1 =  8.4M fp32 scalar scatter-adds (stochastic)
            (exact mode: x8 = 67.1M)
  MLPs:     sigma 32->64->16 + color 47->64->64->3
            = 524k x (2*(32*64+64*16) + 2*(47*64+64*64+64*3)) x ~3 (fwd+bwd)
  Adam:     ~5 elementwise passes over 16.8M fp32 params (+ net grads)

Usage: python scripts_dev/roofline.py            (real chip)
       STOCH=0 python scripts_dev/roofline.py    (exact-gradient step)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nerf_signature_tpu.models.ngp import NGPConfig, init_ngp_params, ngp_field
from nerf_signature_tpu.ops.composite import composite_rays
from nerf_signature_tpu.ops.hashenc import hash_encode
from nerf_signature_tpu.ops.intersect import near_far_from_aabb
from nerf_signature_tpu.ops.marching import march_rays
from nerf_signature_tpu.render.renderer import RenderConfig
from nerf_signature_tpu.train.trainer import _train_step, make_optimizer

N_RAYS, BUDGET, LEVELS = 4096, 128, 16
M = N_RAYS * BUDGET


def timeit(name, fn, *args, iters=20):
    s = jnp.float32(0.0)
    s = fn(s, *args)
    float(s)  # materialise = the only reliable barrier under the relay
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(s, *args)
    float(s)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:34s} {dt:9.3f} ms", flush=True)
    return dt


def chained(f):
    @jax.jit
    def g(s, *args):
        out = f(s, *args)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves) * 1e-12
    return g


def main():
    stoch = os.environ.get("STOCH", "1") == "1"
    cfg = NGPConfig(bound=1.0, compute_dtype=jnp.bfloat16,
                    stochastic_hash_grad=stoch)
    rc = RenderConfig(bound=1.0, grid_size=128, max_steps=1024)
    params = init_ngp_params(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(1e-2, 30000)
    opt_state = optimizer.init(params)
    ema = jax.tree_util.tree_map(jnp.copy, params)

    H = 128
    r = (np.arange(H) + 0.5) / H * 2 - 1
    x, y, z = np.meshgrid(r, r, r, indexing="ij")
    occupancy = jnp.asarray(((x**2 + y**2 + z**2) < 0.5**2)[None])

    rng = np.random.default_rng(0)
    origins = rng.normal(0, 1, (N_RAYS, 3))
    origins = origins / np.linalg.norm(origins, -1, keepdims=True) * 2.0
    dirs = rng.normal(0, 0.3, (N_RAYS, 3)) - origins
    dirs /= np.linalg.norm(dirs, -1, keepdims=True)
    rays_o = jnp.asarray(origins, jnp.float32)
    rays_d = jnp.asarray(dirs, jnp.float32)
    images = jnp.asarray(rng.uniform(0, 1, (N_RAYS, 3)), jnp.float32)
    aabb = jnp.array([-1.0, -1, -1, 1, 1, 1])
    near, far = near_far_from_aabb(rays_o, rays_d, aabb, 0.2)

    print(f"== engine-rate probes (chip={jax.devices()[0].platform}) ==")
    # 1. hash-row gather rate at the hot-path shape/dtype
    tbl = params["hash_table"].astype(jnp.bfloat16)
    idx = jnp.asarray(
        rng.integers(0, tbl.shape[0], (LEVELS, M)), jnp.int32
    )
    t_g = timeit("67.1M bf16 row gathers x8", chained(
        lambda s, t, i: sum(t[(i + k) % t.shape[0]] for k in range(8))
    ), tbl, idx)
    gather_rate = 8 * LEVELS * M / (t_g * 1e-3) / 1e6

    # 2. scatter-add update rate (fp32, the VJP backward layout)
    n_upd = LEVELS * M if not stoch else LEVELS * M  # probe at 8.4M
    sidx = jnp.asarray(rng.integers(0, params["hash_table"].shape[0],
                                    (n_upd // 2,)), jnp.int32)
    upd = jnp.asarray(rng.normal(0, 1, (n_upd // 2, 2)), jnp.float32)
    t_s = timeit("8.4M fp32 scatter-adds (rows)", chained(
        lambda s, i, u: jnp.zeros_like(params["hash_table"]).at[i].add(u + s)
    ), sidx, upd)
    scatter_rate = n_upd / (t_s * 1e-3) / 1e6

    # 3. MXU rate at the MLP shapes (tall-skinny matmuls)
    a = jnp.asarray(rng.normal(0, 1, (M, 64)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 1, (64, 64)), jnp.bfloat16)
    t_m = timeit("524k x 64 x 64 bf16 matmul x8", chained(
        lambda s, aa, ww: sum((aa + k * s) @ ww for k in range(8))
    ), a, w)
    matmul_rate = 8 * 2 * M * 64 * 64 / (t_m * 1e-3) / 1e12

    # 4. occupancy bool gather at the march shape
    gidx = jnp.asarray(rng.integers(0, 128**3, (N_RAYS, 1024)), jnp.int32)
    occ_flat = occupancy.reshape(-1)
    t_o = timeit("4.19M bool gathers", chained(
        lambda s, o, i: o[(i + jnp.int32(s)) % o.shape[0]]
    ), occ_flat, gidx)

    print(f"\n  row-gather rate   {gather_rate:8.1f} M idx/s")
    print(f"  scatter rate      {scatter_rate:8.1f} M upd/s")
    print(f"  matmul rate       {matmul_rate:8.2f} TFLOP/s")

    print("\n== pipeline components in isolation ==")
    t_march = timeit("march (occ gather+rank+compact)", chained(
        lambda s, occ, ro, rd, nr, fr: march_rays(
            ro + s, rd, occ, nr, fr, bound=1.0, dt_gamma=0.0,
            max_steps=1024, budget=BUDGET, grid_size=128)),
        occupancy, rays_o, rays_d, near, far)

    m = march_rays(rays_o, rays_d, occupancy, near, far, bound=1.0,
                   dt_gamma=0.0, max_steps=1024, budget=BUDGET, grid_size=128)
    xs = m["xyzs"].reshape(-1, 3)
    ds = m["dirs"].reshape(-1, 3)
    x01 = (xs + 1.0) / 2.0

    t_hf = timeit("hash fwd", chained(
        lambda s, t, a: hash_encode(a + s, t, cfg.resolutions,
                                    cfg.log2_hashmap_size,
                                    gather_dtype="bfloat16")),
        params["hash_table"], x01)

    t_hg = timeit("hash fwd+bwd", chained(
        lambda s, t, a: jax.grad(
            lambda tt: jnp.sum(hash_encode(
                a + s, tt, cfg.resolutions, cfg.log2_hashmap_size,
                gather_dtype="bfloat16",
                stochastic_grad=stoch) ** 2))(t)),
        params["hash_table"], x01)

    t_field = timeit("field fwd (hash+MLP+SH)", chained(
        lambda s, p, a, b: ngp_field(p, cfg, a + s, b)),
        params, xs, ds)

    sig = jnp.asarray(rng.uniform(0, 1, (N_RAYS, BUDGET)), jnp.float32)
    rgbs = jnp.asarray(rng.uniform(0, 1, (N_RAYS, BUDGET, 3)), jnp.float32)
    t_comp = timeit("composite fwd", chained(
        lambda s, sg, rb: composite_rays(
            sg + s, rb, m["deltas"], m["ts"], m["mask"])),
        sig, rgbs)

    # Adam + EMA over the full param tree
    optu = optimizer.update

    @jax.jit
    def adam_only(s, p, e, o):
        g = jax.tree_util.tree_map(lambda t: t * 0 + s, p)
        up, o2 = optu(g, o, p)
        import optax
        p2 = optax.apply_updates(p, up)
        e2 = jax.tree_util.tree_map(lambda a, b: a * 0.95 + b * 0.05, e, p2)
        return (sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(p2))
                + sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(e2))
                ) * 1e-12
    t_adam = timeit("adam+ema (16.8M params)", adam_only, params, ema,
                    opt_state)

    print("\n== full step vs compound floor ==")
    key = jax.random.PRNGKey(1)

    def step(p, e, o, k):
        return _train_step(p, e, o, occupancy, rays_o, rays_d, images, k,
                           cfg, rc, BUDGET, optimizer.update, False, 0.95)

    p, e, o, loss, _, _ = step(params, ema, opt_state, key)
    float(jnp.sum(loss))
    t0 = time.perf_counter()
    iters = 20
    for i in range(iters):
        p, e, o, loss, _, _ = step(p, e, o, jax.random.fold_in(key, i))
    float(jnp.sum(loss))
    t_full = (time.perf_counter() - t0) / iters * 1e3
    print(f"{'full train step':34s} {t_full:9.3f} ms")

    # floor: march + (hash fwd+bwd) + 2x(field minus hash: MLP/SH fwd~bwd)
    # + composite fwd (bwd is the same closed form) + adam
    t_mlp = max(t_field - t_hf, 0.0)
    floor = t_march + t_hg + 2 * t_mlp + 2 * t_comp + t_adam
    print(f"{'compound floor (sum of parts)':34s} {floor:9.3f} ms")
    print(f"{'step / floor':34s} {t_full / floor:9.2f}x")
    print(f"\nrays/s full step: {N_RAYS / (t_full * 1e-3):,.0f}")


if __name__ == "__main__":
    main()
