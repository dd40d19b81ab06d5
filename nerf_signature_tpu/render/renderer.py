"""Volume renderer: occupancy-grid path and fixed-step path.

TPU-native equivalent of ``nerf/renderer.py`` / ``nerf/renderer_wtmk.py``:
  * ``render_rays_occ``  ~ ``run_cuda`` (``nerf/renderer.py:256-377``) — but
    ONE fused program for both training and inference: march (static budget)
    -> field MLPs -> closed-form composite.  The reference's host-driven
    alive-ray loop (``renderer.py:341-367``, a host sync per iteration) is
    unnecessary here: empty space is already compacted away by the marcher,
    and post-opaque samples are masked by the composite's T-threshold.
  * ``render_rays_fixed`` ~ ``run`` (``nerf/renderer.py:125-253``) — linspace
    z-vals in [near, far], optional perturb, optional inverse-CDF upsampling,
    composite; the CPU-runnable reference path, kept for parity and testing.

Both are pure functions of (field params via closures, rays); callers jit
them, shard the ray axis, and chunk staged renders.
"""

import dataclasses
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..ops.composite import composite_rays
from ..ops.intersect import near_far_from_aabb
from ..ops.marching import march_rays
from ..ops.pdf import sample_pdf

_MISS = 3.0e38  # rays that miss the AABB carry the float32-max sentinel


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static render options (the reference threads these through **vars(opt));
    see ``main_nerf.py:20-47`` for the flag surface)."""

    bound: float = 1.0
    grid_size: int = 128
    density_scale: float = 1.0
    min_near: float = 0.2
    dt_gamma: float = 0.0
    max_steps: int = 1024
    T_thresh: float = 1e-4
    num_steps: int = 128        # fixed-step path
    upsample_steps: int = 0     # fixed-step path
    bg_radius: float = -1.0
    # Global sample compaction: run the field on only ~compact_frac * N * S
    # sample slots (occupied samples packed across the whole ray batch) and
    # expand the results back before compositing.  The static per-ray budget
    # S pads unoccupied slots, and on converged scenes most slots are padding
    # (measured 13% fill on the bench scene -> the field computes 7.6x more
    # samples than exist).  0 disables.  Overflow (total occupied > slots)
    # drops the tail samples of that batch — the analogue of the reference's
    # mean_count buffer randomly dropping rays on overflow
    # (``raymarching/raymarching.py:198-216``).
    compact_frac: float = 0.0
    # March coarse pre-filter: None = marcher's auto heuristic; False forces
    # it off.  Exactness-contract paths (ownership decodes, attack sweeps)
    # must set False — the pre-filter's group-budget truncation can silently
    # drop in-budget samples on speckled occupancy, the same silent-drop
    # class compact_frac=0 exists to rule out.
    prefilter: Optional[bool] = None
    # March coarse-group budget (prefilter path): max coarse-occupied groups
    # kept per ray.  0 = the marcher's default formula max(64, budget // 2);
    # the clean trainer's --group_budget -1 auto-adaptation sets this to the
    # power-of-two bucket >= 1.5x the measured mean occupied-group count
    # (the n_groups_occ statistic, counted UNCAPPED over all groups).
    group_budget: int = 0
    # Transmittance cull threshold (0 = off): drop samples whose proxy
    # entering transmittance (accumulated from the maintained cell
    # densities) is below this, BEFORE the field runs — samples entering at
    # true T < T_thresh have exactly zero weight and zero gradient, so at
    # t_cull << T_thresh this removes near-pure waste (measured 46% of
    # samples on the trained headline scene).  Requires passing
    # ``ops.grid.render_grid(occ, t_cull)`` as the march grid.  Keep 0 on
    # exactness-contract decode paths.
    t_cull: float = 0.0


def render_rays_occ(
    field_fn: Callable,
    occupancy,
    rays_o,
    rays_d,
    rc: RenderConfig,
    *,
    budget: int,
    bg_color=1.0,
    perturb_key=None,
    n_cand: Optional[int] = None,
    bg_fn: Optional[Callable] = None,
    aabb=None,
):
    """Occupancy-grid render of [N, 3] rays.

    ``field_fn(xyzs [M, 3], dirs [M, 3]) -> (sigma [M], rgb [M, 3])`` — the
    clean or message-conditioned field with params already bound.
    ``bg_fn(rays_o, rays_d) -> [N, 3]``, when given, overrides ``bg_color``
    (the bg-sphere model path, ref ``nerf/renderer.py:271-274``).
    ``aabb``: optional [6] crop box (xyzmin, xyzmax) replacing the full
    scene bound for the near/far clip — the reference GUI's ``aabb_infer``
    sliders (``nerf/gui.py:355-427``); a DYNAMIC array, so slider moves
    never recompile.
    Returns dict(image [N, 3], depth [N], weights_sum [N]).
    """
    if aabb is None:
        aabb = jnp.array(
            [-rc.bound, -rc.bound, -rc.bound, rc.bound, rc.bound, rc.bound],
            dtype=jnp.float32,
        )
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, rc.min_near)

    m = march_rays(
        rays_o, rays_d, occupancy, nears, fars,
        bound=rc.bound, dt_gamma=rc.dt_gamma, max_steps=rc.max_steps,
        n_cand=n_cand, budget=budget, grid_size=rc.grid_size,
        perturb_key=perturb_key, prefilter=rc.prefilter, t_cull=rc.t_cull,
        group_budget=rc.group_budget or None,
    )
    N, S = m["mask"].shape

    Mc = 0
    if rc.compact_frac > 0:
        Mc = min(int(math.ceil(N * S * rc.compact_frac / 1024.0)) * 1024,
                 N * S)
    if 0 < Mc < N * S:
        # pack occupied samples across the whole batch into Mc static slots
        # (cumsum-rank + one scatter, the same compaction primitive as the
        # marcher), run the field on the packed buffer, gather results back
        flat_mask = m["mask"].reshape(-1)
        rank = jnp.cumsum(flat_mask.astype(jnp.int32)) - 1
        keep = flat_mask & (rank < Mc)
        dst = jnp.where(keep, rank, Mc)
        xyz_c = (
            jnp.zeros((Mc + 1, 3), m["xyzs"].dtype)
            .at[dst].set(m["xyzs"].reshape(-1, 3), mode="drop")[:Mc]
        )
        dir_c = (
            jnp.zeros((Mc + 1, 3), m["dirs"].dtype)
            .at[dst].set(m["dirs"].reshape(-1, 3), mode="drop")[:Mc]
        )
        sig_c, rgb_c = field_fn(xyz_c, dir_c)
        src = jnp.clip(rank, 0, Mc - 1)
        sigmas = jnp.where(keep, sig_c[src], jnp.zeros((), sig_c.dtype))
        rgbs = jnp.where(keep[:, None], rgb_c[src],
                         jnp.zeros((), rgb_c.dtype))
        sigmas = sigmas.reshape(N, S) * rc.density_scale
        rgbs = rgbs.reshape(N, S, 3)
    else:
        sigmas, rgbs = field_fn(
            m["xyzs"].reshape(-1, 3), m["dirs"].reshape(-1, 3)
        )
        sigmas = sigmas.reshape(N, S) * rc.density_scale
        rgbs = rgbs.reshape(N, S, 3)

    out = composite_rays(
        sigmas, rgbs, m["deltas"], m["ts"], mask=m["mask"], T_thresh=rc.T_thresh
    )

    ws = out["weights_sum"]
    if bg_fn is not None:
        bg_color = bg_fn(rays_o, rays_d)
    image = out["image"] + (1.0 - ws)[..., None] * bg_color
    # normalised depth like ref renderer.py:317 (visualisation output)
    hit = nears < _MISS
    span = jnp.where(hit, jnp.maximum(fars - nears, 1e-6), 1.0)
    depth = jnp.where(hit, jnp.clip(out["depth"] - nears * ws, 0.0, None) / span, 0.0)
    return {
        "image": image,
        "depth": depth,
        "weights_sum": ws,
        "n_occupied": m["n_occupied"],
        "n_occupied_raw": m["n_occupied_raw"],
        "n_groups_occ": m["n_groups_occ"],
    }


def render_rays_fixed(
    density_fn: Callable,
    color_fn: Callable,
    rays_o,
    rays_d,
    rc: RenderConfig,
    *,
    bg_color=1.0,
    perturb_key=None,
    upsample_key=None,
    det_upsample=True,
    bg_fn: Optional[Callable] = None,
    aabb=None,
):
    """Fixed-step render (the reference's pure-torch ``run`` path).

    density_fn(x [M,3]) -> dict(sigma [M], geo_feat [M,G]);
    color_fn(x, d, geo_feat) -> rgb [M, 3].
    aabb: optional [6] crop box (see ``render_rays_occ``).
    """
    if aabb is None:
        aabb = jnp.array(
            [-rc.bound, -rc.bound, -rc.bound, rc.bound, rc.bound, rc.bound],
            dtype=jnp.float32,
        )
    N = rays_o.shape[0]
    T = rc.num_steps
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, rc.min_near)
    hit = nears < _MISS
    nears_ = jnp.where(hit, nears, 0.0)
    fars_ = jnp.where(hit, fars, 1.0)

    z = jnp.linspace(0.0, 1.0, T)
    z_vals = nears_[:, None] + (fars_ - nears_)[:, None] * z[None, :]
    sample_dist = (fars_ - nears_)[:, None] / T
    if perturb_key is not None:
        z_vals = z_vals + (
            jax.random.uniform(perturb_key, z_vals.shape) - 0.5
        ) * sample_dist

    def query(zv):
        xyz = rays_o[:, None, :] + rays_d[:, None, :] * zv[..., None]
        xyz = jnp.clip(xyz, -rc.bound, rc.bound)
        d_out = density_fn(xyz.reshape(-1, 3))
        return xyz, d_out

    xyzs, dout = query(z_vals)
    sigma = dout["sigma"].reshape(N, T)
    geo = dout["geo_feat"].reshape(N, T, -1)

    if rc.upsample_steps > 0:
        t = rc.upsample_steps
        deltas = jnp.diff(z_vals, axis=-1)
        deltas = jnp.concatenate([deltas, sample_dist], axis=-1)
        alphas = 1.0 - jnp.exp(-deltas * rc.density_scale * sigma)
        shifted = jnp.concatenate(
            [jnp.ones_like(alphas[..., :1]), 1.0 - alphas + 1e-15], axis=-1
        )
        weights = alphas * jnp.cumprod(shifted, axis=-1)[..., :-1]
        z_mid = z_vals[..., :-1] + 0.5 * deltas[..., :-1]
        upkey = upsample_key if upsample_key is not None else jax.random.PRNGKey(0)
        new_z = sample_pdf(
            upkey, z_mid, weights[:, 1:-1], t, det=det_upsample
        )
        new_z = jax.lax.stop_gradient(new_z)
        new_xyzs, new_dout = query(new_z)
        new_sigma = new_dout["sigma"].reshape(N, t)
        new_geo = new_dout["geo_feat"].reshape(N, t, -1)

        z_vals = jnp.concatenate([z_vals, new_z], axis=-1)
        order = jnp.argsort(z_vals, axis=-1)
        z_vals = jnp.take_along_axis(z_vals, order, axis=-1)
        xyzs = jnp.take_along_axis(
            jnp.concatenate([xyzs, new_xyzs], axis=1), order[..., None], axis=1
        )
        sigma = jnp.take_along_axis(
            jnp.concatenate([sigma, new_sigma], axis=-1), order, axis=-1
        )
        geo = jnp.take_along_axis(
            jnp.concatenate([geo, new_geo], axis=1), order[..., None], axis=1
        )

    deltas = jnp.diff(z_vals, axis=-1)
    deltas = jnp.concatenate([deltas, sample_dist], axis=-1)

    dirs = jnp.broadcast_to(rays_d[:, None, :], xyzs.shape)
    rgbs = color_fn(
        xyzs.reshape(-1, 3), dirs.reshape(-1, 3), geo.reshape(-1, geo.shape[-1])
    ).reshape(N, -1, 3)

    out = composite_rays(
        sigma * rc.density_scale, rgbs, deltas, z_vals,
        mask=jnp.broadcast_to(hit[:, None], sigma.shape),
        T_thresh=0.0,  # the fixed-step reference path has no early-out
    )
    ws = out["weights_sum"]
    if bg_fn is not None:
        bg_color = bg_fn(rays_o, rays_d)
    image = out["image"] + (1.0 - ws)[..., None] * bg_color
    ori_z = jnp.clip(
        (z_vals - nears_[:, None]) / jnp.maximum((fars_ - nears_)[:, None], 1e-6),
        0.0, 1.0,
    )
    depth = jnp.sum(out["weights"] * ori_z, axis=-1)
    return {"image": image, "depth": depth, "weights_sum": ws}
