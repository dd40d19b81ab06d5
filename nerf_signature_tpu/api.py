"""High-level model objects mirroring the reference's ``NeRFNetwork`` API
(``nerf/network_hash.py``, ``nerf/network_wtmk_tcnn.py`` + the renderer base
``nerf/renderer.py``), so providers/trainers read like the original while all
compute stays in jitted pure functions.

State held here (params pytree, occupancy grid, PRNG) is plain data; every
method dispatches to a cached ``jax.jit`` specialised on the static config.
"""

import dataclasses
import functools


import jax
import jax.numpy as jnp
import numpy as np

from .models.ngp import (
    NGPConfig,
    init_ngp_params,
    ngp_background,
    ngp_color,
    ngp_density,
    ngp_field,
)
from .models.watermark import (
    WatermarkConfig,
    init_watermark_params,
    wtmk_density,
    wtmk_field,
)
from .ops.grid import (
    init_occupancy_grid,
    mark_untrained_grid,
    num_cascades,
    render_grid,
    update_occupancy_grid,
)
from .render.renderer import RenderConfig, render_rays_fixed, render_rays_occ

# ---------------------------------------------------------------------------
# jitted render kernels (module-level so the jit cache is shared)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("cfg", "rc", "budget", "use_perturb")
)
def _render_occ_clean(params, occupancy, rays_o, rays_d, bg_color, key,
                      cfg: NGPConfig, rc: RenderConfig, budget, use_perturb,
                      aabb=None):
    field = lambda x, d: ngp_field(params, cfg, x, d)
    bg_fn = (
        (lambda o, d: ngp_background(params, cfg, o, d))
        if cfg.bg_radius > 0 else None
    )
    return render_rays_occ(
        field, occupancy, rays_o, rays_d, rc, budget=budget,
        bg_color=bg_color, perturb_key=key if use_perturb else None,
        bg_fn=bg_fn, aabb=aabb,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "rc", "budget"))
def _render_occ_clean_staged(params, occupancy, rays_o_chunks, rays_d_chunks,
                             bg_color, cfg: NGPConfig, rc: RenderConfig,
                             budget, aabb=None):
    """Whole staged render as ONE program: ``lax.map`` over ray chunks.

    rays_*_chunks: [n_chunks, chunk, 3].  One dispatch per image instead of
    one per chunk (per-call dispatch latency would otherwise dominate under
    remote PJRT; also lets XLA pipeline chunks)."""
    field = lambda x, d: ngp_field(params, cfg, x, d)
    bg_fn = (
        (lambda o, d: ngp_background(params, cfg, o, d))
        if cfg.bg_radius > 0 else None
    )

    def one(args):
        ro, rd = args
        out = render_rays_occ(
            field, occupancy, ro, rd, rc, budget=budget, bg_color=bg_color,
            bg_fn=bg_fn, aabb=aabb,
        )
        return out["image"], out["depth"]

    images, depths = jax.lax.map(one, (rays_o_chunks, rays_d_chunks))
    return images.reshape(-1, 3), depths.reshape(-1)


@functools.partial(jax.jit, static_argnames=("cfg", "rc", "budget", "use_msg"))
def _render_occ_wtmk_staged(backbone, trainable, occupancy, rays_o_chunks,
                            rays_d_chunks, message, bg_color,
                            cfg: WatermarkConfig, rc: RenderConfig, budget,
                            use_msg, aabb=None):
    msg = message if use_msg else None
    field = lambda x, d: wtmk_field(backbone, trainable, cfg, x, d, msg)
    bg_fn = (
        (lambda o, d: ngp_background(backbone, cfg.ngp, o, d))
        if cfg.ngp.bg_radius > 0 else None
    )

    def one(args):
        ro, rd = args
        out = render_rays_occ(
            field, occupancy, ro, rd, rc, budget=budget, bg_color=bg_color,
            bg_fn=bg_fn, aabb=aabb,
        )
        return out["image"], out["depth"]

    images, depths = jax.lax.map(one, (rays_o_chunks, rays_d_chunks))
    return images.reshape(-1, 3), depths.reshape(-1)


@functools.partial(
    jax.jit, static_argnames=("cfg", "rc", "budget", "use_perturb", "use_msg")
)
def _render_occ_wtmk(backbone, trainable, occupancy, rays_o, rays_d, message,
                     bg_color, key, cfg: WatermarkConfig, rc: RenderConfig,
                     budget, use_perturb, use_msg, aabb=None):
    msg = message if use_msg else None
    field = lambda x, d: wtmk_field(backbone, trainable, cfg, x, d, msg)
    bg_fn = (
        (lambda o, d: ngp_background(backbone, cfg.ngp, o, d))
        if cfg.ngp.bg_radius > 0 else None
    )
    return render_rays_occ(
        field, occupancy, rays_o, rays_d, rc, budget=budget,
        bg_color=bg_color, perturb_key=key if use_perturb else None,
        bg_fn=bg_fn, aabb=aabb,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "rc", "use_perturb"))
def _render_fixed_clean(params, rays_o, rays_d, bg_color, key,
                        cfg: NGPConfig, rc: RenderConfig, use_perturb,
                        aabb=None):
    density = lambda x: ngp_density(params, cfg, x)
    color = lambda x, d, g: ngp_color(params, cfg, d, g)
    bg_fn = (
        (lambda o, d: ngp_background(params, cfg, o, d))
        if cfg.bg_radius > 0 else None
    )
    k1, k2 = jax.random.split(key)
    return render_rays_fixed(
        density, color, rays_o, rays_d, rc, bg_color=bg_color,
        perturb_key=k1 if use_perturb else None, upsample_key=k2,
        det_upsample=not use_perturb, bg_fn=bg_fn, aabb=aabb,
    )


# ---------------------------------------------------------------------------
# model wrappers
# ---------------------------------------------------------------------------


class _BaseModel:
    """Shared occupancy-grid bookkeeping (ref ``NeRFRenderer`` base,
    ``nerf/renderer.py:61-123``) and staged/chunked rendering."""

    def __init__(self, rc: RenderConfig, seed=0, cuda_ray=True,
                 train_budget=128, infer_budget=256):
        self.rc = rc
        # Eval/test/pseudo-GT renders are pinned EXACT: rc.t_cull is a
        # train-step-only population lever (the cull's proxy transmittance
        # comes from decayed-MAX cell densities that overestimate the live
        # field, so culled eval renders could drop samples whose true
        # entering T is still >= T_thresh — a divergence from the
        # reference's exact-sigma early termination).  Renders therefore
        # march the plain bool occupancy (render_grid at t_cull=0 — also
        # removes the per-chunk float-grid rebuild in the chunk loop).
        self.rc_eval = (dataclasses.replace(rc, t_cull=0.0)
                        if rc.t_cull else rc)
        self.cascade = num_cascades(rc.bound)
        self.use_occ = cuda_ray  # "cuda_ray" flag == occupancy-grid path
        self.key = jax.random.PRNGKey(seed)
        self.occ = init_occupancy_grid(rc.bound, rc.grid_size)
        self.train_budget = train_budget
        self.infer_budget = infer_budget
        self.mean_count = 0  # running avg of occupied samples/ray (telemetry)
        # inference-time crop box (the reference GUI's aabb_infer sliders,
        # ``nerf/gui.py:355-427``): None = full scene bound; a [6] array
        # tightens the render paths' near/far clip.  Dynamic (set via
        # ``set_aabb_crop``) — slider moves re-use the compiled program.
        self.aabb_infer = None

    def set_aabb_crop(self, bounds):
        """Set (or clear with None) the inference crop box [xmin, ymin,
        zmin, xmax, ymax, zmax], clamped to the scene bound."""
        if bounds is None:
            self.aabb_infer = None
            return
        b = self.rc.bound
        lo = np.clip(np.asarray(bounds[:3], np.float32), -b, b)
        hi = np.clip(np.asarray(bounds[3:], np.float32), -b, b)
        hi = np.maximum(hi, lo + 1e-4)
        self.aabb_infer = jnp.asarray(np.concatenate([lo, hi]))

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    # -- occupancy maintenance ---------------------------------------------
    def density_fn(self, x):
        raise NotImplementedError

    def reset_extra_state(self):
        """Zero the grid / counters (ref ``nerf/renderer.py:113-123``)."""
        self.occ = init_occupancy_grid(self.rc.bound, self.rc.grid_size)
        self.mean_count = 0

    def update_extra_state(self, decay=0.95):
        """Ref ``nerf/renderer.py:444-538``; full update for the first 16
        iters, partial after."""
        if not self.use_occ:
            return
        full = int(self.occ.iter_density) < 16
        self.occ = update_occupancy_grid(
            self.occ, self._next_key(), self.density_fn,
            bound=self.rc.bound, grid_size=self.rc.grid_size,
            density_scale=self.rc.density_scale,
            density_thresh=self.density_thresh, decay=decay, full=full,
        )

    def mark_untrained_grid(self, poses, intrinsics):
        if not self.use_occ:
            return
        self.occ = mark_untrained_grid(
            self.occ, jnp.asarray(poses), tuple(np.asarray(intrinsics).tolist()),
            bound=self.rc.bound, grid_size=self.rc.grid_size,
        )

    # -- rendering -----------------------------------------------------------
    def _render_chunk(self, rays_o, rays_d, message, bg_color, perturb, budget):
        raise NotImplementedError

    def render(self, rays_o, rays_d, message=None, *, staged=False,
               max_ray_batch=4096, bg_color=None, perturb=False,
               budget=None, **_):
        """rays_o/d: [..., 3] (any leading shape).  Returns dict of numpy-able
        arrays with the leading shape restored (image gains a trailing 3)."""
        prefix = rays_o.shape[:-1]
        rays_o = jnp.asarray(rays_o, jnp.float32).reshape(-1, 3)
        rays_d = jnp.asarray(rays_d, jnp.float32).reshape(-1, 3)
        N = rays_o.shape[0]
        if bg_color is None:
            bg = jnp.ones((1, 3), jnp.float32)
        else:
            bg = jnp.asarray(bg_color, jnp.float32).reshape(-1, 3)
        budget = budget or (self.infer_budget if not perturb else self.train_budget)

        if staged and N > max_ray_batch:
            pad = (-N) % max_ray_batch
            ro = jnp.concatenate([rays_o, jnp.ones((pad, 3))], 0) if pad else rays_o
            rd = jnp.concatenate([rays_d, jnp.ones((pad, 3))], 0) if pad else rays_d
            if bg.shape[0] == 1 and not perturb and self.use_occ:
                # fused path: the staged render is a lax.map program, capped
                # at the transport-safe program size (utils/dispatch.py) and
                # dispatched per super-chunk — ONE compiled shape (tail
                # super-chunk padded up), results concatenated host-side
                from .utils.dispatch import max_fused_chunks

                chunks = (N + pad) // max_ray_batch
                cap = max_fused_chunks(chunks, budget)
                gpad = (-chunks) % cap
                if gpad:
                    ro = jnp.concatenate(
                        [ro, jnp.ones((gpad * max_ray_batch, 3))], 0)
                    rd = jnp.concatenate(
                        [rd, jnp.ones((gpad * max_ray_batch, 3))], 0)
                groups = (chunks + gpad) // cap
                ro = ro.reshape(groups, cap, max_ray_batch, 3)
                rd = rd.reshape(groups, cap, max_ray_batch, 3)
                images, depths = [], []
                for g in range(groups):
                    img, dep = self._render_staged(
                        ro[g], rd[g], message, bg, budget,
                    )
                    images.append(img)
                    depths.append(dep)
                image = jnp.concatenate(images, 0)[:N]
                depth = jnp.concatenate(depths, 0)[:N]
            else:
                bgs = jnp.broadcast_to(bg, (N + pad, 3)) if bg.shape[0] > 1 else bg
                images, depths = [], []
                for h in range(0, N + pad, max_ray_batch):
                    bg_c = bgs[h : h + max_ray_batch] if bgs.shape[0] > 1 else bg
                    out = self._render_chunk(
                        ro[h : h + max_ray_batch], rd[h : h + max_ray_batch],
                        message, bg_c, perturb, budget,
                    )
                    images.append(out["image"])
                    depths.append(out["depth"])
                image = jnp.concatenate(images, 0)[:N]
                depth = jnp.concatenate(depths, 0)[:N]
            results = {"image": image, "depth": depth}
        else:
            out = self._render_chunk(rays_o, rays_d, message, bg, perturb, budget)
            results = {k: out[k] for k in ("image", "depth", "weights_sum")}
            self._last_n_occupied = out.get("n_occupied")
            self._last_n_groups_occ = out.get("n_groups_occ")

        results["image"] = results["image"].reshape(*prefix, 3)
        results["depth"] = results["depth"].reshape(*prefix)
        if "weights_sum" in results:
            results["weights_sum"] = results["weights_sum"].reshape(*prefix)
        return results


class NGPModel(_BaseModel):
    """Clean instant-NGP model (ref ``nerf/network_hash.py`` +
    ``nerf/renderer.py``)."""

    def __init__(self, cfg: NGPConfig = None, *, bound=1.0, cuda_ray=True,
                 density_scale=1.0, min_near=0.2, density_thresh=0.01,
                 bg_radius=-1.0, dt_gamma=0.0, max_steps=1024,
                 grid_size=128, seed=0, train_budget=128, infer_budget=256,
                 num_steps=128, upsample_steps=0, compact_frac=0.0,
                 t_cull=0.0):
        self.cfg = cfg or NGPConfig(
            bound=bound, density_scale=density_scale, bg_radius=bg_radius
        )
        rc = RenderConfig(
            bound=self.cfg.bound, grid_size=grid_size,
            density_scale=density_scale, min_near=min_near, dt_gamma=dt_gamma,
            max_steps=max_steps, num_steps=num_steps,
            upsample_steps=upsample_steps, bg_radius=bg_radius,
            compact_frac=compact_frac, t_cull=t_cull,
        )
        super().__init__(rc, seed=seed, cuda_ray=cuda_ray,
                         train_budget=train_budget, infer_budget=infer_budget)
        self.density_thresh = density_thresh
        self.params = init_ngp_params(jax.random.PRNGKey(seed), self.cfg)

    def density_fn(self, x):
        return ngp_density(self.params, self.cfg, x)["sigma"]

    def _render_chunk(self, rays_o, rays_d, message, bg_color, perturb, budget):
        if self.use_occ:
            return _render_occ_clean(
                self.params, render_grid(self.occ, self.rc_eval.t_cull),
                rays_o, rays_d, bg_color,
                self._next_key(), self.cfg, self.rc_eval, budget, perturb,
                aabb=self.aabb_infer,
            )
        return _render_fixed_clean(
            self.params, rays_o, rays_d, bg_color, self._next_key(),
            self.cfg, self.rc, perturb, aabb=self.aabb_infer,
        )

    def _render_staged(self, ro_chunks, rd_chunks, message, bg, budget):
        if not self.use_occ:
            # fixed-step path keeps the python chunk loop
            raise NotImplementedError
        return _render_occ_clean_staged(
            self.params, render_grid(self.occ, self.rc_eval.t_cull),
            ro_chunks, rd_chunks, bg,
            self.cfg, self.rc_eval, budget, aabb=self.aabb_infer,
        )


class WatermarkModel(_BaseModel):
    """Watermarked model: frozen backbone + trainable (msg_tables, decoder).
    Ref ``nerf/network_wtmk_tcnn.py`` + ``nerf/renderer_wtmk.py``."""

    def __init__(self, wcfg: WatermarkConfig = None, *, bound=1.0,
                 message_dim=16, n_views=1, cuda_ray=True, density_scale=1.0,
                 min_near=0.2, density_thresh=0.01, bg_radius=-1.0,
                 dt_gamma=0.0, max_steps=1024, grid_size=128, seed=0,
                 train_budget=128, infer_budget=256, compact_frac=0.0,
                 t_cull=0.0):
        self.wcfg = wcfg or WatermarkConfig(
            ngp=NGPConfig(
                bound=bound, density_scale=density_scale, bg_radius=bg_radius
            ),
            message_dim=message_dim, n_views=n_views,
        )
        rc = RenderConfig(
            bound=self.wcfg.ngp.bound, grid_size=grid_size,
            density_scale=density_scale, min_near=min_near, dt_gamma=dt_gamma,
            max_steps=max_steps, bg_radius=bg_radius,
            compact_frac=compact_frac, t_cull=t_cull,
        )
        super().__init__(rc, seed=seed, cuda_ray=cuda_ray,
                         train_budget=train_budget, infer_budget=infer_budget)
        self.density_thresh = density_thresh
        p = init_watermark_params(jax.random.PRNGKey(seed), self.wcfg)
        self.backbone = p["backbone"]
        self.trainable = p["trainable"]

    @property
    def cfg(self):
        return self.wcfg.ngp

    def density_fn(self, x):
        return wtmk_density(self.backbone, self.trainable, self.wcfg, x, None)[
            "sigma"
        ]

    def _render_chunk(self, rays_o, rays_d, message, bg_color, perturb, budget):
        use_msg = message is not None
        msg = (
            jnp.asarray(message, jnp.int32)
            if use_msg
            else jnp.zeros((self.wcfg.message_dim,), jnp.int32)
        )
        return _render_occ_wtmk(
            self.backbone, self.trainable,
            render_grid(self.occ, self.rc_eval.t_cull), rays_o, rays_d,
            msg, bg_color, self._next_key(), self.wcfg, self.rc_eval, budget,
            perturb, use_msg, aabb=self.aabb_infer,
        )

    def _render_staged(self, ro_chunks, rd_chunks, message, bg, budget):
        use_msg = message is not None
        msg = (
            jnp.asarray(message, jnp.int32)
            if use_msg
            else jnp.zeros((self.wcfg.message_dim,), jnp.int32)
        )
        return _render_occ_wtmk_staged(
            self.backbone, self.trainable,
            render_grid(self.occ, self.rc_eval.t_cull), ro_chunks,
            rd_chunks, msg, bg, self.wcfg, self.rc_eval, budget, use_msg,
            aabb=self.aabb_infer,
        )
