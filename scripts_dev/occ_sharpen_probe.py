"""Occupancy-sharpening probe (VERDICT r4 next #5): samples/ray vs grid
decay / threshold / extra update rounds on a trained scene.

The march population (samples/ray) is set by how sharp the occupancy grid
is; the reference maintains it with EMA-max decay 0.95 and threshold
min(mean_density, density_thresh) (``nerf/renderer.py:444-538``).  Sharper
grids (faster decay, higher threshold, more update rounds) cut samples/ray
— the one population lever that shrinks march + gather + scatter + field
+ composite together — but over-pruning erodes surfaces.  This probe
measures the samples/ray curve WITH its quality guard (staged-render PSNR
vs the scene GT through the sharpened grid) so the keep/reject decision is
grounded.

Protocol: train the bench ball scene (bench.py shapes) for
``PROBE_DISPATCHES`` x 8 steps, then for each (decay, extra update rounds,
thresh multiplier): apply the extra partial updates to a COPY of the
trained grid with the trained (frozen) field, march a held-out view, and
staged-render it.  Output: one JSON line per setting.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import make_ball_images


def main():
    from nerf_signature_tpu.api import _render_occ_clean_staged
    from nerf_signature_tpu.data.rays import get_rays, rand_poses
    from nerf_signature_tpu.models.ngp import (
        NGPConfig, exact_field_cfg, init_ngp_params, ngp_density,
    )
    from nerf_signature_tpu.ops.grid import (
        init_occupancy_grid, update_occupancy_grid,
    )
    from nerf_signature_tpu.ops.intersect import near_far_from_aabb
    from nerf_signature_tpu.ops.marching import march_rays
    from nerf_signature_tpu.render.renderer import RenderConfig
    from nerf_signature_tpu.train.device_loop import device_train_loop
    from nerf_signature_tpu.train.trainer import make_optimizer
    from nerf_signature_tpu.utils.dispatch import max_scan_steps

    cfg = NGPConfig(bound=1.0, compute_dtype=jnp.bfloat16,
                    stochastic_hash_grad=True)
    rc = RenderConfig(bound=1.0, grid_size=128, max_steps=1024,
                      compact_frac=0.25)
    n_rays, budget, H, W = 4096, 128, 256, 256
    n_steps = max_scan_steps(8)
    rng = np.random.default_rng(0)
    poses = rand_poses(rng, 16, radius=1.8)
    intrinsics = np.array([W / 1.2, W / 1.2, W / 2, H / 2], np.float32)
    images_np = make_ball_images(poses, intrinsics, H, W)
    images = jnp.asarray(images_np)
    poses_d, intr_d = jnp.asarray(poses), jnp.asarray(intrinsics)
    optimizer = make_optimizer(1e-2, 30000)
    copy = functools.partial(jax.tree_util.tree_map, jnp.copy)

    params = init_ngp_params(jax.random.PRNGKey(0), cfg)
    opt_state = optimizer.init(params)
    ema = copy(params)
    occ = init_occupancy_grid(1.0, rc.grid_size)
    n_disp = int(os.environ.get("PROBE_DISPATCHES", "40"))
    # density_thresh 10 = the real-scene recipe value (the device-loop
    # default 0.01 never prunes -> fog deadlock; see CLAUDE.md)
    dthresh = float(os.environ.get("PROBE_DENSITY_THRESH", "10"))
    for i in range(n_disp):
        out = device_train_loop(
            params, ema, opt_state, occ, poses_d, images, intr_d,
            jax.random.PRNGKey(1 + i), i * n_steps, cfg, rc, budget,
            optimizer.update, True, 0.95, n_steps, n_rays, H, W,
            density_thresh=dthresh,
        )
        params, ema, opt_state, occ = out[:4]
    print(f"trained {n_disp * n_steps} steps, final loss "
          f"{float(np.asarray(out[4])[-1]):.5f}, grid occ "
          f"{float(jnp.mean(occ.occupancy.astype(jnp.float32))):.4f}",
          flush=True)

    cfg_e = exact_field_cfg(cfg)
    density_fn = lambda x: ngp_density(params, cfg_e, x)["sigma"]

    # held-out view: rays + GT
    test_pose = rand_poses(np.random.default_rng(99), 1, radius=1.8)
    rays = get_rays(test_pose, intrinsics, H, W, -1)
    ro = jnp.asarray(rays["rays_o"][0])
    rd = jnp.asarray(rays["rays_d"][0])
    gt = make_ball_images(test_pose, intrinsics, H, W)[0]
    gt_rgb = gt[:, :3] * gt[:, 3:] + 1.0 * (1 - gt[:, 3:])  # white bg
    ro_c = ro.reshape(-1, 4096, 3)[:4]
    rd_c = rd.reshape(-1, 4096, 3)[:4]

    aabb = jnp.asarray([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
    nears, fars = near_far_from_aabb(ro, rd, aabb, 0.2)

    def measure(grid):
        frac = float(jnp.mean(grid.occupancy.astype(jnp.float32)))
        m = march_rays(ro[:4096], rd[:4096], grid.occupancy, nears[:4096],
                       fars[:4096], bound=1.0, budget=budget,
                       grid_size=rc.grid_size)
        spr = float(jnp.mean(m["n_occupied"].astype(jnp.float32)))
        img = _render_occ_clean_staged(params, grid.occupancy, ro_c, rd_c,
                                       1.0, cfg_e, rc, budget)[0]
        img = np.asarray(img, np.float32).reshape(-1, 3)
        mse = float(np.mean((img - gt_rgb[: img.shape[0]]) ** 2))
        return frac, spr, -10.0 * np.log10(max(mse, 1e-10))

    frac0, spr0, psnr0 = measure(occ)
    print(json.dumps({"setting": "baseline(decay=.95,as-trained)",
                      "occ_frac": round(frac0, 4),
                      "samples_per_ray": round(spr0, 1),
                      "psnr": round(psnr0, 2)}), flush=True)

    for decay in (0.95, 0.9, 0.8, 0.6):
        for rounds in (16, 64):
            for tmul in (1.0, 4.0):
                g = copy(occ)
                for r in range(rounds):
                    g = update_occupancy_grid(
                        g, jax.random.PRNGKey(1000 + r), density_fn,
                        bound=rc.bound, grid_size=rc.grid_size,
                        density_scale=rc.density_scale,
                        density_thresh=dthresh * tmul, decay=decay,
                        full=False,
                    )
                frac, spr, psnr = measure(g)
                print(json.dumps({
                    "setting": f"decay={decay},rounds={rounds},tmul={tmul}",
                    "occ_frac": round(frac, 4),
                    "samples_per_ray": round(spr, 1),
                    "psnr": round(psnr, 2),
                    "d_psnr": round(psnr - psnr0, 2),
                    "spr_ratio": round(spr / max(spr0, 1e-6), 3),
                }), flush=True)


if __name__ == "__main__":
    main()
