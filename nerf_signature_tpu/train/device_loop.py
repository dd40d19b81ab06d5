"""Fully on-device training loop: K optimisation steps per dispatch.

The reference dispatches one CUDA-graphless step per Python iteration with
several host syncs per step (SURVEY.md §3.1: ``step_counter.item()``,
``loss.item()``); the TPU-native design compiles the WHOLE loop — pose
choice, pixel sampling, ray generation, march, field, composite, loss, Adam,
EMA, and the periodic occupancy-grid maintenance — into ONE ``lax.scan``
program.  Zero host round-trips per step; the dataset (poses + images) lives
in HBM (the ``--preload`` flag's true TPU meaning).

This also defines the honest benchmark protocol under remote-dispatch
environments: per-call Execute latency measures the transport, not the
framework.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.ngp import (exact_field_cfg, ngp_background, ngp_density,
                          ngp_field)
from ..ops.grid import OccupancyGrid, render_grid, update_occupancy_grid
from ..render.renderer import render_rays_occ


def sample_error_map(key, em_row, num_rays, H, W, coarse=128):
    """Device-side importance sampling over one pose's coarse error map.

    Mirrors the host path (``data/rays.py``, ref ``nerf/utils.py:104-114``):
    draw coarse cells proportional to error (inverse-CDF, WITH replacement —
    the host's no-replacement multinomial would need a full sort; duplicates
    are harmless extra samples of hard cells), then jitter-refine into full
    resolution.  Returns (pix [N], inds_coarse [N])."""
    k1, k2, k3 = jax.random.split(key, 3)
    cdf = jnp.cumsum(em_row)
    u = jax.random.uniform(k1, (num_rays,)) * cdf[-1]
    inds_coarse = jnp.clip(jnp.searchsorted(cdf, u), 0, coarse * coarse - 1)
    ix = (inds_coarse // coarse).astype(jnp.float32)
    iy = (inds_coarse % coarse).astype(jnp.float32)
    sx, sy = H / coarse, W / coarse
    ix = jnp.minimum(
        (ix * sx + jax.random.uniform(k2, (num_rays,)) * sx).astype(jnp.int32),
        H - 1,
    )
    iy = jnp.minimum(
        (iy * sy + jax.random.uniform(k3, (num_rays,)) * sy).astype(jnp.int32),
        W - 1,
    )
    return ix * W + iy, inds_coarse


def rays_from_pixels(pose, intrinsics, pix, H, W):
    """Device-side ``get_rays`` for sampled flat pixel indices.

    pose: [4, 4]; intrinsics: (fx, fy, cx, cy); pix: [N] int in [0, H*W).
    Mirrors the host version in ``data/rays.py`` (ref ``nerf/utils.py:54-139``).
    """
    fx, fy, cx, cy = intrinsics
    i = (pix % W).astype(jnp.float32) + 0.5
    j = (pix // W).astype(jnp.float32) + 0.5
    xs = (i - cx) / fx
    ys = (j - cy) / fy
    dirs = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    rays_d = dirs @ pose[:3, :3].T
    rays_o = jnp.broadcast_to(pose[:3, 3], rays_d.shape)
    return rays_o, rays_d


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "rc", "budget", "opt_update", "has_alpha",
                     "ema_decay", "n_steps", "num_rays", "H", "W",
                     "update_interval", "density_thresh", "grid_full_until",
                     "mesh", "patch_size"),
    donate_argnums=(0, 1, 2, 3),
)
def device_train_loop(params, ema, opt_state, occ: OccupancyGrid, poses,
                      images, intrinsics, key, step0, cfg, rc, budget,
                      opt_update, has_alpha, ema_decay, n_steps, num_rays,
                      H, W, update_interval=16, density_thresh=0.01,
                      grid_full_until=16, mesh=None, error_map=None,
                      patch_size=1, lambda_ssim=None):
    """Run ``n_steps`` training steps on device.

    poses: [P, 4, 4]; images: [P, H*W, C] (preloaded); intrinsics: [4].
    mesh: optional 1-D "rays" Mesh — the per-step ray batch is sharded over
    it INSIDE the scan (params replicated; GSPMD inserts the gradient psum
    over ICI), combining multi-chip DP with the K-steps-per-dispatch loop.
    error_map: optional [P, 128*128] coarse error map — pixels are then
    importance-sampled from it and it is EMA-updated per step inside the
    scan (``sample_error_map``; ref ``nerf/utils.py:104-114,549-556``),
    carried through the loop and returned.
    Returns (params, ema, opt_state, occ, losses [n_steps], mean_occupied,
    error_map, occ_p95, mean_groups_occ, mean_occupied_raw).  mean_occupied
    counts post-cull SURVIVORS (the compaction-fill statistic); occ_p95 and
    mean_occupied_raw are PRE-cull (the budget-provisioning statistics —
    provisioning follows geometry, never the culled survivors);
    mean_groups_occ is the mean occupied-coarse-group count (uncapped), the
    group-budget-adaptation statistic.
    """
    P = poses.shape[0]
    intr = (intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3])
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        _shard_rays = NamedSharding(mesh, PartitionSpec("rays"))
        shard = lambda x: jax.lax.with_sharding_constraint(x, _shard_rays)
    else:
        shard = lambda x: x

    def maybe_update_grid(occ, params, k, step):
        def do_update(occ):
            # occupancy maintenance always queries the EXACT 8-corner field,
            # even when the optimisation step runs forward corner subsampling
            # (a stochastic density estimate would speckle the grid)
            density_fn = lambda x: ngp_density(params, exact_field_cfg(cfg),
                                               x)["sigma"]
            full = occ.iter_density < grid_full_until

            def upd(full_flag):
                return update_occupancy_grid(
                    occ, k, density_fn, bound=rc.bound, grid_size=rc.grid_size,
                    density_scale=rc.density_scale,
                    density_thresh=density_thresh, full=full_flag,
                )

            return jax.lax.cond(full, lambda: upd(True), lambda: upd(False))

        return jax.lax.cond(
            step % update_interval == 0, do_update, lambda o: o, occ
        )

    use_error_map = error_map is not None
    if not use_error_map:
        error_map = jnp.zeros((1, 1), jnp.float32)  # carry placeholder

    def body(carry, inp):
        params, ema, opt_state, occ, em = carry
        k, step = inp
        kg, kp, ki, kbg, kpert = jax.random.split(k, 5)

        occ = maybe_update_grid(occ, params, kg, step)

        pidx = jax.random.randint(kp, (), 0, P)
        if use_error_map:
            pix, inds_coarse = sample_error_map(ki, em[pidx], num_rays, H, W)
        elif patch_size > 1:
            # patch-structured sampling (mirrors data/rays.get_rays patch
            # mode / the wm scan loop) so the SSIM patch term sees real
            # local structure; tail rays stay uniform
            pp = patch_size
            npatch = num_rays // (pp * pp)
            kx, ky, kt = jax.random.split(ki, 3)
            tx = jax.random.randint(kx, (npatch,), 0, H - pp)
            ty = jax.random.randint(ky, (npatch,), 0, W - pp)
            pi, pj = np.meshgrid(np.arange(pp), np.arange(pp), indexing="ij")
            off = jnp.asarray(pi.ravel() * W + pj.ravel())
            pix = ((tx * W + ty)[:, None] + off[None]).reshape(-1)
            if npatch * pp * pp < num_rays:
                rest = jax.random.randint(
                    kt, (num_rays - npatch * pp * pp,), 0, H * W
                )
                pix = jnp.concatenate([pix, rest])
            inds_coarse = None
        else:
            pix = jax.random.randint(ki, (num_rays,), 0, H * W)
            inds_coarse = None
        rays_o, rays_d = rays_from_pixels(poses[pidx], intr, pix, H, W)
        rays_o, rays_d = shard(rays_o), shard(rays_d)
        img = shard(images[pidx, pix])  # [N, C]

        if has_alpha and not cfg.bg_radius > 0:
            bg = jax.random.uniform(kbg, (num_rays, 3))
            gt = img[..., :3] * img[..., 3:] + bg * (1.0 - img[..., 3:])
        else:
            # bg-model path: white GT composite, trainable bg-sphere net
            # provides the render bg (ref ``nerf/utils.py:498-507``)
            bg = jnp.ones((1, 3))
            gt = (
                img[..., :3] * img[..., 3:] + bg * (1.0 - img[..., 3:])
                if has_alpha else img
            )

        def loss_fn(p):
            field = lambda a, b: ngp_field(p, cfg, a, b)
            bg_fn = (
                (lambda o, d: ngp_background(p, cfg, o, d))
                if cfg.bg_radius > 0 else None
            )
            out = render_rays_occ(
                field, render_grid(occ, rc.t_cull), rays_o, rays_d, rc,
                budget=budget, bg_color=bg, perturb_key=kpert, bg_fn=bg_fn,
            )
            err = jnp.mean((out["image"] - gt) ** 2, axis=-1)  # [N]
            loss = jnp.mean(err)
            if patch_size > 1 and lambda_ssim is not None:
                from .metrics import ssim_jnp

                pp = patch_size
                npatch = num_rays // (pp * pp)
                pred = out["image"][: npatch * pp * pp].reshape(
                    npatch, pp, pp, 3)
                gtp = gt[: npatch * pp * pp].reshape(npatch, pp, pp, 3)
                loss = loss + lambda_ssim * (1.0 - ssim_jnp(pred, gtp))
            return loss, (out["n_occupied"], out["n_occupied_raw"],
                          out["n_groups_occ"], err)

        (loss, (n_occ, n_occ_raw, n_groups, err)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = opt_update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if ema_decay is not None:
            ema = jax.tree_util.tree_map(
                lambda e, p: e * ema_decay + p * (1.0 - ema_decay), ema, params
            )
        else:
            ema = params
        if use_error_map:
            # EMA update at the sampled coarse cells (ref utils.py:549-556);
            # duplicate cells resolve last-wins like torch index assignment
            row = em[pidx]
            row = row.at[inds_coarse].set(
                0.1 * row[inds_coarse] + 0.9 * jax.lax.stop_gradient(err)
            )
            em = em.at[pidx].set(row)
        # p95 of per-ray occupied counts feeds the host-side march-budget
        # adaptation (_adapt_budget) between dispatches — the scan path used
        # to starve forward-facing scenes at a saturated budget because only
        # the mean was reported (LLFF 17.58 dB finding, PERF.md r2)
        occ_p95 = jnp.percentile(n_occ_raw.astype(jnp.float32), 95.0)
        return (params, ema, opt_state, occ, em), (
            loss, jnp.mean(n_occ), occ_p95,
            jnp.mean(n_groups.astype(jnp.float32)),
            jnp.mean(n_occ_raw.astype(jnp.float32)))

    keys = jax.random.split(key, n_steps)
    steps = step0 + jnp.arange(n_steps)
    (params, ema, opt_state, occ, error_map), \
        (losses, occ_means, occ_p95s, group_means, raw_means) = jax.lax.scan(
            body, (params, ema, opt_state, occ, error_map), (keys, steps)
        )
    return (params, ema, opt_state, occ, losses, jnp.mean(occ_means),
            error_map, jnp.max(occ_p95s), jnp.mean(group_means),
            jnp.mean(raw_means))
