"""Clean-stage trainer: jitted train step, occupancy maintenance, eval/test.

Equivalent of the reference's ``Trainer`` (``nerf/utils.py:317-1137``):
  * Adam(0.9, 0.99, eps=1e-15) with lr schedule ``0.1 ** (step / iters)``
    stepped every iteration (``main_nerf.py:122-130``),
  * density-grid update every ``update_extra_interval`` (16) steps
    (``nerf/utils.py:855-857``),
  * per-ray MSE with pixel-wise random background compositing for RGBA data
    (``nerf/utils.py:498-517``),
  * error-map EMA update ``0.1*old + 0.9*err`` (``nerf/utils.py:549-556``),
  * parameter EMA (decay 0.95) applied at eval time,
  * checkpoint ring buffer + best checkpoint.

TPU-native differences: the whole optimisation step (render + loss + grads +
Adam + EMA) is ONE jitted XLA program; AMP GradScaler is unnecessary (bf16
compute / fp32 params+accum by construction); the ``mean_count`` sample-buffer
heuristic becomes power-of-two adaptation of the static march budget with
hysteresis (recompiles at most a handful of times per run).
"""

import dataclasses
import functools
import math
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..api import NGPModel
from ..models.ngp import ngp_background, ngp_field
from ..ops.grid import render_grid
from ..render.renderer import render_rays_occ
from .checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    prune_checkpoints,
    restore_like,
    save_checkpoint,
)
from .metrics import PSNRMeter


_TB_WRITERS = {}


def _tb_writer(workspace):
    """Cached per-workspace tensorboardX writer (None if tbx is absent).
    Reference logs to ``workspace/run/<name>`` (``utils_wtmk_disen.py:435``)."""
    if workspace in _TB_WRITERS:
        return _TB_WRITERS[workspace]
    try:
        from tensorboardX import SummaryWriter

        w = SummaryWriter(os.path.join(workspace, "run"))
    except Exception:
        w = None
    _TB_WRITERS[workspace] = w
    return w


def linear_to_srgb(x):
    """ref ``nerf/utils.py:44-45``."""
    return np.where(x < 0.0031308, 12.92 * x, 1.055 * x ** (1 / 2.4) - 0.055)


def srgb_to_linear(x):
    """ref ``nerf/utils.py:48-50``."""
    return np.where(x < 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)


def make_lr_schedule(lr, iters):
    """0.1 ** min(step/iters, 1), ref ``main_nerf.py:127``."""
    return lambda count: lr * 0.1 ** jnp.minimum(count / iters, 1.0)


def make_optimizer(lr, iters):
    """Adam(betas=(0.9, 0.99), eps=1e-15), ref ``main_nerf.py:122``."""
    return optax.adam(
        learning_rate=make_lr_schedule(lr, iters), b1=0.9, b2=0.99, eps=1e-15
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "rc", "budget", "opt_update", "has_alpha",
                     "ema_decay", "patch_size"),
    donate_argnums=(0, 1, 2),
)
def _train_step(params, ema_params, opt_state, occupancy, rays_o, rays_d,
                images, key, cfg, rc, budget, opt_update, has_alpha,
                ema_decay, lpips_params=None, patch_size=1,
                lambda_ssim=None):
    """One fused optimisation step.  images: [N, 3/4].

    With ``patch_size > 1`` and LPIPS weights resolved, adds the reference's
    perceptual patch loss ``1e-3 * lpips(pred, gt)`` (``nerf/utils.py:
    374-377,528``) — fully in-graph via the native JAX LPIPS
    (``utils/lpips.py``), so it differentiates into the field like any
    other term.  ``lambda_ssim`` adds the weight-free structural patch
    guard instead/as well (same term as the wm stage, see
    ``trainer_wtmk._wm_step_loss``) — useful where no LPIPS weights ship."""
    kbg, kperturb = jax.random.split(key)
    if has_alpha and not cfg.bg_radius > 0:
        bg = jax.random.uniform(kbg, (images.shape[0], 3))
        gt = images[..., :3] * images[..., 3:] + bg * (1.0 - images[..., 3:])
    else:
        # bg-model path: GT composites over white, the render's bg comes from
        # the trainable bg-sphere net (ref ``nerf/utils.py:498-507``)
        bg = jnp.ones((1, 3))
        gt = (
            images[..., :3] * images[..., 3:] + bg * (1.0 - images[..., 3:])
            if has_alpha else images
        )

    def loss_fn(p):
        field = lambda x, d: ngp_field(p, cfg, x, d)
        bg_fn = (
            (lambda o, d: ngp_background(p, cfg, o, d))
            if cfg.bg_radius > 0 else None
        )
        out = render_rays_occ(
            field, occupancy, rays_o, rays_d, rc, budget=budget,
            bg_color=bg, perturb_key=kperturb, bg_fn=bg_fn,
        )
        per_ray = jnp.mean((out["image"] - gt) ** 2, axis=-1)
        loss = jnp.mean(per_ray)
        if patch_size > 1 and (lpips_params is not None
                               or lambda_ssim is not None):
            B = rays_o.shape[0] // (patch_size * patch_size)
            pred_p = out["image"].reshape(B, patch_size, patch_size, 3)
            gt_p = gt.reshape(B, patch_size, patch_size, 3)
            if lpips_params is not None:
                from ..utils.lpips import lpips_distance

                loss = loss + 1e-3 * jnp.mean(
                    lpips_distance(lpips_params, pred_p, gt_p)
                )
            if lambda_ssim is not None:
                from .metrics import ssim_jnp

                loss = loss + lambda_ssim * (1.0 - ssim_jnp(pred_p, gt_p))
        return loss, (per_ray, out["n_occupied"], out["n_occupied_raw"],
                      out["n_groups_occ"])

    (loss, (per_ray, n_occ, n_occ_raw, n_groups)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(params)
    updates, opt_state = opt_update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    if ema_decay is not None:
        ema_params = jax.tree_util.tree_map(
            lambda e, p: e * ema_decay + p * (1.0 - ema_decay), ema_params, params
        )
    else:
        ema_params = params
    return (params, ema_params, opt_state, loss, per_ray, n_occ,
            n_occ_raw, n_groups)


class Trainer:
    """Orchestrates epochs/eval/ckpt around the jitted step (host-side)."""

    def __init__(self, name, opt, model: NGPModel, workspace="workspace",
                 ema_decay=0.95, metrics=None, eval_interval=50,
                 max_keep_ckpt=2, use_checkpoint="latest", mute=False):
        self.name = name
        self.opt = opt
        self.model = model
        self.workspace = workspace
        self.ema_decay = ema_decay
        self.metrics = metrics if metrics is not None else [PSNRMeter()]
        self.eval_interval = eval_interval
        self.max_keep_ckpt = max_keep_ckpt
        self.mute = mute

        self.optimizer = make_optimizer(opt.lr, opt.iters)
        self.opt_state = self.optimizer.init(model.params)
        # Train-step-scoped field config: forward corner subsampling
        # (--hash_fwd_corners 1) applies ONLY inside the optimisation step;
        # every eval/render/pseudo-GT path keeps model.cfg's exact 8-corner
        # interpolation.  See NGPConfig.hash_fwd_corners.
        fwd_corners = int(getattr(opt, "hash_fwd_corners", 8) or 8)
        # validate against the AUTHORITATIVE config (model.cfg), not the opt
        # namespace — programmatic construction can desync the two, and the
        # field actually consulted by hash_encode is cfg.stochastic_hash_grad
        if fwd_corners != 8 and not model.cfg.stochastic_hash_grad:
            raise ValueError("--hash_fwd_corners 1 requires "
                             "--stochastic_hash_grad")
        self.cfg_train = (
            dataclasses.replace(model.cfg, hash_fwd_corners=fwd_corners)
            if fwd_corners != model.cfg.hash_fwd_corners else model.cfg
        )
        # distinct buffers: params and ema are both donated to the jitted step
        self.ema_params = jax.tree_util.tree_map(jnp.copy, model.params)

        # multi-device data parallelism: shard the ray axis, replicate params;
        # GSPMD inserts the gradient all-reduce over ICI (see parallel/mesh.py).
        # Under a multi-process launch (parallel/multihost.py; DCN for the
        # host dimension) --devices 0 means the whole GLOBAL mesh and every
        # array placement goes through put_global.
        from ..parallel import multihost

        n_dev = getattr(opt, "devices", 0)
        if n_dev == 0:
            n_dev = len(jax.devices()) if multihost.is_multiprocess() else 1
        if n_dev > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import make_mesh

            assert opt.num_rays % n_dev == 0, \
                "num_rays must be a multiple of --devices"
            self.mesh = make_mesh(n_dev)
            self._shard = NamedSharding(self.mesh, P("rays"))
            self._repl = NamedSharding(self.mesh, P())
            put = lambda t: jax.tree_util.tree_map(
                lambda x: multihost.put_global(x, self._repl), t
            )
            self.model.params = put(self.model.params)
            self.ema_params = put(self.ema_params)
            self.opt_state = put(self.opt_state)
            if getattr(self.model, "use_occ", False):
                self.model.occ = put(self.model.occ)
        else:
            self.mesh = None

        self.epoch = 0
        self.global_step = 0
        self.stats = {"loss": [], "valid_loss": [], "results": [],
                      "checkpoints": [], "best_result": None}
        self.error_map = None

        self._budget_hysteresis = 0
        self._group_hysteresis = 0

        if workspace is not None:
            os.makedirs(workspace, exist_ok=True)
            self.ckpt_path = os.path.join(workspace, "checkpoints")
            os.makedirs(self.ckpt_path, exist_ok=True)
            self.log_path = os.path.join(workspace, f"log_{name}.txt")
            self.best_path = os.path.join(self.ckpt_path, f"{name}.ckpt")
        else:
            self.ckpt_path = self.log_path = self.best_path = None

        if use_checkpoint == "scratch" or self.ckpt_path is None:
            pass
        elif use_checkpoint in ("latest", "latest_model", "best"):
            if use_checkpoint == "best" and os.path.exists(self.best_path):
                candidates = [self.best_path]
            else:
                from .checkpoint import checkpoint_candidates

                candidates = checkpoint_candidates(self.ckpt_path, name)
            for path in candidates:
                try:
                    self.load_checkpoint(
                        path, model_only="model" in use_checkpoint
                    )
                    break
                except Exception as e:
                    self.log(f"[ckpt] {path} unreadable ({e}); "
                             f"falling back to previous")
        elif use_checkpoint and os.path.exists(use_checkpoint):
            self.load_checkpoint(use_checkpoint, model_only=True)

        # patch-mode perceptual loss (ref utils.py:374-377,528): resolve
        # LPIPS weights once; degrade with an explicit skip line, never
        # silently — only the host-loop path samples patches, so the scan
        # loop is unaffected
        self.patch_size = getattr(opt, "patch_size", 1)
        self._lpips_params = None
        if self.patch_size > 1:
            from ..utils.lpips import MIN_SIZE, load_lpips_params

            self._lpips_params = load_lpips_params(
                getattr(opt, "lpips_weights", None)
            )
            if self._lpips_params is None:
                self.log("[lpips] patch LPIPS loss skipped: no weights "
                         "(set --lpips_weights or install lpips)")
            elif self.patch_size < MIN_SIZE:
                self.log(f"[lpips] patch LPIPS loss skipped: patch_size "
                         f"{self.patch_size} < {MIN_SIZE} (AlexNet stack "
                         f"collapses)")
                self._lpips_params = None
            if self._lpips_params is not None:
                if self.mesh is not None:
                    from ..parallel.multihost import put_global

                    self._lpips_params = jax.tree_util.tree_map(
                        lambda x: put_global(x, self._repl),
                        self._lpips_params,
                    )
                self.log("[lpips] patch LPIPS loss active (1e-3, in-graph)")
        # weight-free structural patch guard (shared with the wm stage,
        # see trainer_wtmk._wm_step_loss / PERF.md)
        self.lambda_ssim = float(getattr(opt, "lambda_ssim", 0.0) or 0.0)
        if self.lambda_ssim > 0:
            if self.patch_size <= 1:
                raise ValueError(
                    "--lambda_ssim needs --patch_size > 1 "
                    "(patch-structured ray batches)"
                )
            self.log(f"[ssim] patch SSIM guard active "
                     f"(lambda={self.lambda_ssim}, in-graph)")

        # GT-free CLIP guidance (ref nerf/utils.py:474-489; the reference's
        # own CLIP prep is commented out — this is the working completion).
        # Resolution is EXPLICIT: asking for CLIP without weights is an
        # error, not a silent no-op.
        self._clip = None
        self._clip_step = None
        clip_text = getattr(opt, "clip_text", "") or ""
        if clip_text:
            from ..utils.clip_loss import CLIPLoss

            clip = CLIPLoss(getattr(opt, "clip_model", None)
                            or "openai/clip-vit-base-patch32")
            if not clip.available:
                raise RuntimeError(clip.error)
            clip.prepare_text([clip_text])
            self._clip = clip
            self.log(f"[clip] GT-free guidance active: {clip_text!r}")

    # ------------------------------------------------------------------ util
    def log(self, *args):
        if not self.mute:
            print(*args, flush=True)
        if self.log_path:
            from ..parallel.multihost import is_primary
            if not is_primary():
                return  # multi-process: process 0 owns the workspace files
            with open(self.log_path, "a") as f:
                print(*args, file=f)

    def log_metrics(self, **scalars):
        """Scalar telemetry: one JSON line (trivially plottable, no deps)
        plus tensorboardX scalars when available — the reference writes
        ``train/loss``-style tags per step (``utils_wtmk_disen.py:1200-1204``)."""
        if not self.workspace:
            return
        import json

        path = os.path.join(self.workspace, "metrics.jsonl")
        with open(path, "a") as f:
            f.write(json.dumps({"step": self.global_step, **scalars}) + "\n")
        tb = _tb_writer(self.workspace)
        if tb is not None:
            for k, v in scalars.items():
                if isinstance(v, (int, float)):
                    tb.add_scalar(f"train/{k}", v, self.global_step)

    def _adapt_compaction(self, mean_occ, immediate=False):
        """Auto sample-compaction (``--compact_frac -1``): pick the slot
        fraction from measured occupancy (1.3x headroom, 1/16 buckets,
        two-in-a-row hysteresis — a change recompiles the step)."""
        if getattr(self.opt, "compact_frac", 0) != -1:
            return
        m = self.model
        S = m.train_budget
        fill = min(float(mean_occ), S) / S
        # the target is 1.3x the measured fill, rounded UP to the 1/16 grid
        # (16 possible compile shapes; the two-in-a-row hysteresis below
        # absorbs fill noise so shapes don't thrash).  Round-5 history: the
        # round-2 rule was 1.5x headroom over coarse {0.25, 0.5, 1.0}
        # buckets, which (a) could not follow a --t_cull'd fill below 0.25,
        # and (b) at fill 0.39 crossed the 0.5 bucket and turned compaction
        # OFF — 2x the packed slots, 15.9k vs 22.3k rays/s (PERF.md).
        # Overflow stays graceful (drops that batch's tail samples, the
        # reference's mean_count semantics).
        target = min(1.0, math.ceil(1.3 * fill * 16.0) / 16.0)
        cur = m.rc.compact_frac or 1.0
        # LOWER dead-band (2/16): lowering only buys speed (the buffers stay
        # big enough), and each move is a full recompile through a ~100 s
        # remote-compile path — the early-training occupancy descent
        # otherwise walks the 1/16 grid one recompile per bucket (measured
        # 12 recompiles in 240 steps on the multiobj scene, r5/03 log).
        # Raises keep full resolution: they protect against truncation.
        if target == cur or (not immediate and target < cur
                             and cur - target < 0.125):
            self._compact_pending = None
            return
        if immediate or getattr(self, "_compact_pending", None) == target:
            import dataclasses

            m.rc = dataclasses.replace(
                m.rc, compact_frac=0.0 if target == 1.0 else target
            )
            self._compact_pending = None
            self.log(f"[compact] sample compaction -> {target}")
        else:
            self._compact_pending = target

    def _adapt_budget(self, n_occ):
        """mean_count analog: fit the static march budget to the scene
        (power-of-two buckets, hysteresis, ref ``raymarching.py:198-216``).

        Target-seeking and SYMMETRIC: the target bucket is the smallest
        power of two >= 1.5 * mean(n_occ), and the budget moves one bucket
        toward it after 2 consecutive agreeing checks.  Two measured
        failure modes this rule fixes:
          * the round-2 band (raise at stat > b, lower only at stat < b/4)
            was path-dependent — the pre-prune fog phase drove the budget
            up and a converged scene then parked 2 buckets above where it
            settles when approached from below;
          * a p95 target (round-3 first attempt) provisions for the 5%
            grazing-geometry rays and parked the multiobj scene at 512
            (mean 54!) for a ~2.5x step cost with no measured quality
            gain — the reference's own heuristic is the MEAN
            (``mean_count``, raymarching.py:198-216), and 1.5x headroom
            resolves the LLFF saturation case (mean 273 -> bucket 512)
            that motivated p95."""
        mean = float(np.asarray(n_occ).mean())
        b = self.model.train_budget
        target = 1 << max(5, int(np.ceil(np.log2(max(1.5 * mean, 1.0)))))
        target = min(target, self.opt.max_steps)
        if target > b:
            self._budget_hysteresis = max(self._budget_hysteresis, 0) + 1
        elif target < b:
            self._budget_hysteresis = min(self._budget_hysteresis, 0) - 1
        else:
            self._budget_hysteresis = 0
        moved = False
        if self._budget_hysteresis >= 2:
            self.model.train_budget = min(b * 2, self.opt.max_steps)
            self._budget_hysteresis = 0
            moved = True
            self.log(f"[budget] raise march budget -> {self.model.train_budget}")
        elif self._budget_hysteresis <= -2:
            self.model.train_budget = max(b // 2, 32)
            self._budget_hysteresis = 0
            moved = True
            self.log(f"[budget] lower march budget -> {self.model.train_budget}")
        if moved:
            # a budget move changes the step shapes (one recompile already);
            # re-fit the compaction fraction to the NEW budget in the same
            # event, else the fill jump (fill is relative to the budget)
            # triggers a SECOND recompile at the next check (measured on the
            # r5/03 log: every budget move was followed by a compact move).
            self._adapt_compaction(mean, immediate=True)

    def _adapt_group_budget(self, mean_groups):
        """March coarse-group-budget adaptation (``--group_budget -1``).

        The prefilter keeps the first ``group_budget`` coarse-occupied
        groups per ray (4 fine candidates each) and gathers fine occupancy
        only inside them, so the fine-gather + rank/select population is
        ``group_budget * 4`` per ray — the march-side analogue of the sample
        budget.  The marcher's static default ``max(64, budget // 2)``
        provisions 256 candidates/ray at the adapted headline point where
        the measured occupied-group mean is ~10-20: the same
        1.5x-mean-headroom power-of-two rule as ``_adapt_budget``, fed by
        the UNCAPPED ``n_groups_occ`` statistic (counted over all groups
        BEFORE truncation — a capped statistic saturates and biases every
        downstream adaptation, the r5/038 failure), recovers that waste.
        Truncation class and headroom are identical to the sample budget's
        (drop the farthest, 1.5x mean, pow2 buckets, two-in-a-row moves);
        floor 16 groups (64 candidates).  Exactness-contract paths are
        untouched: they force ``prefilter=False``, where no group truncation
        exists.
        """
        if getattr(self.opt, "group_budget", 0) != -1:
            return
        m = self.model
        # fog gate: before the grid's full-update phase ends (the reference
        # runs 16 full-grid updates before partial ones, renderer.py:452),
        # nearly every group is coarse-occupied — adapting to that transient
        # only buys recompiles (the r5/03 churn finding).  The marcher's
        # static formula covers the fog phase; adaptation starts once
        # pruning is real.
        occ_state = getattr(m, "occ", None)
        if occ_state is not None and int(occ_state.iter_density) < 16:
            self._group_hysteresis = 0
            return
        rc = m.rc
        from ..ops.marching import num_candidates

        n_groups_max = max(
            num_candidates(rc.bound, rc.max_steps, rc.dt_gamma) // 4, 1
        )
        cur = rc.group_budget or max(64, m.train_budget // 2)
        target = 1 << max(4, int(np.ceil(np.log2(max(1.5 * mean_groups,
                                                     1.0)))))
        target = min(target, n_groups_max)
        if target > cur:
            self._group_hysteresis = max(
                getattr(self, "_group_hysteresis", 0), 0) + 1
        elif target < cur:
            self._group_hysteresis = min(
                getattr(self, "_group_hysteresis", 0), 0) - 1
        else:
            self._group_hysteresis = 0
        if self._group_hysteresis >= 2:
            m.rc = dataclasses.replace(
                rc, group_budget=min(max(cur * 2, 16), n_groups_max))
            self._group_hysteresis = 0
            self.log(f"[group] raise march group budget -> "
                     f"{m.rc.group_budget}")
        elif self._group_hysteresis <= -2:
            m.rc = dataclasses.replace(rc, group_budget=max(cur // 2, 16))
            self._group_hysteresis = 0
            self.log(f"[group] lower march group budget -> "
                     f"{m.rc.group_budget}")

    # ----------------------------------------------------------------- train
    def _make_clip_step(self, H, W):
        """Jitted GT-free step: render the low-res full-image bundle, CLIP
        guidance loss IN-GRAPH (native jnp vision tower), grads, Adam, EMA."""
        from ..utils.clip_loss import clip_guidance_loss

        m = self.model
        clip_meta = self._clip.meta
        opt_update = self.optimizer.update
        ema_decay = self.ema_decay
        cfg, rc = m.cfg, m.rc
        budget = m.train_budget  # static; closure rebuilt if it adapts

        # the CLIP tower and text features enter as ARGUMENTS, not closure
        # constants: closed-over weight pytrees embed into the serialized
        # HLO as literals and blow the tunneled relay's request-size limit
        # (HTTP 413 on remote_compile — observed live on the attack suite,
        # whose programs closed over the backbone the same way)
        @jax.jit
        def step(params, ema_params, opt_state, occupancy, clip_params,
                 text_features, rays_o, rays_d, key):
            def loss_fn(p):
                field = lambda x, d: ngp_field(p, cfg, x, d)
                bg_fn = (
                    (lambda o, d: ngp_background(p, cfg, o, d))
                    if cfg.bg_radius > 0 else None
                )
                out = render_rays_occ(
                    field, occupancy, rays_o, rays_d, rc, budget=budget,
                    bg_color=1.0, perturb_key=key, bg_fn=bg_fn,
                )
                img = out["image"].reshape(1, H, W, 3)
                return clip_guidance_loss(
                    clip_params, clip_meta, text_features, img
                )

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt_update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if ema_decay is not None:
                ema_params = jax.tree_util.tree_map(
                    lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                    ema_params, params,
                )
            else:
                ema_params = params
            return params, ema_params, opt_state, loss

        return step

    def _train_step_clip(self, data):
        """GT-free batch (rand_pose collate, ``data/provider.py:210-216``)."""
        m = self.model
        H, W = int(data["H"]), int(data["W"])
        sig = (H, W, m.train_budget)
        if self._clip_step is None or self._clip_hw != sig:
            self._clip_step = self._make_clip_step(H, W)
            self._clip_hw = sig
        rays_o = jnp.asarray(data["rays_o"]).reshape(-1, 3)
        rays_d = jnp.asarray(data["rays_d"]).reshape(-1, 3)
        (m.params, self.ema_params, self.opt_state, loss) = self._clip_step(
            m.params, self.ema_params, self.opt_state,
            render_grid(m.occ, m.rc.t_cull),
            self._clip.params, self._clip.text_features,
            rays_o, rays_d, m._next_key(),
        )
        n = rays_o.shape[0]
        z = jnp.zeros((n,), jnp.int32)
        return loss, jnp.zeros((n,)), z, z, z

    def _rc_train(self):
        """RenderConfig for the next train dispatch: the t_cull fog gate.

        The cull's proxy transmittance comes from the maintained cell
        densities, which LAG the live field by up to an update interval.
        While fog is clearing (the grid's full-update phase, first 16
        updates — reference renderer.py:452) the field falls fast, the
        proxy systematically OVERestimates, and the cull drops samples
        whose true entering T is still above the composite threshold —
        measured r5/03: t_cull 1e-6 from scratch lost 1.6 dB at matched
        steps.  Until ``iter_density >= 16`` the train step therefore
        marches exact (t_cull 0, bool grid); the crossing costs one
        recompile and lands inside the early-phase adaptation churn window.
        """
        rc = self.model.rc
        if rc.t_cull and int(self.model.occ.iter_density) < 16:
            return dataclasses.replace(rc, t_cull=0.0)
        return rc

    def train_step_data(self, data):
        if "images" not in data:
            # GT-free rand_pose batch: CLIP branch, or an explicit skip —
            # never a KeyError (round-1 VERDICT missing #3)
            if self._clip is not None:
                return self._train_step_clip(data)
            if not getattr(self, "_warned_gt_free", False):
                self._warned_gt_free = True
                self.log("[train] skipping GT-free rand_pose batches: no "
                         "--clip_text configured")
            return None, None, None, None, None
        m = self.model
        images = np.asarray(data["images"]).reshape(-1, data["images"].shape[-1])
        if getattr(self.opt, "color_space", "srgb") == "linear":
            images = images.copy()
            images[..., :3] = srgb_to_linear(images[..., :3])
        has_alpha = images.shape[-1] == 4
        rays_o = jnp.asarray(data["rays_o"]).reshape(-1, 3)
        rays_d = jnp.asarray(data["rays_d"]).reshape(-1, 3)
        images_dev = jnp.asarray(images)
        rc_step = self._rc_train()
        occupancy = render_grid(m.occ, rc_step.t_cull)
        if self.mesh is not None:
            from ..parallel.multihost import put_global

            rays_o = put_global(rays_o, self._shard)
            rays_d = put_global(rays_d, self._shard)
            images_dev = put_global(images_dev, self._shard)
            occupancy = put_global(occupancy, self._repl)
        (m.params, self.ema_params, self.opt_state, loss, per_ray, n_occ,
         n_occ_raw, n_groups) = _train_step(
            m.params, self.ema_params, self.opt_state, occupancy,
            rays_o, rays_d, images_dev, m._next_key(),
            self.cfg_train, rc_step, m.train_budget, self.optimizer.update,
            has_alpha,
            self.ema_decay, self._lpips_params,
            self.patch_size if (self._lpips_params is not None
                                or self.lambda_ssim > 0) else 1,
            lambda_ssim=(jnp.float32(self.lambda_ssim)
                         if self.lambda_ssim > 0 else None),
        )
        return loss, per_ray, n_occ, n_occ_raw, n_groups

    def train_one_epoch(self, loader):
        m = self.model
        total_loss, nsteps = 0.0, 0
        t_epoch = time.time()
        self.error_map = getattr(loader, "error_map", None)
        update_interval = getattr(self.opt, "update_extra_interval", 16)
        for data in loader:
            if (self.global_step % update_interval == 0
                    and self.global_step != getattr(self, "_last_extra", -1)):
                # dedup on the step counter: skipped GT-free batches leave
                # global_step unchanged and must not re-run the grid update
                m.update_extra_state()
                self._last_extra = self.global_step
            gt_free = "images" not in data
            (loss, per_ray, n_occ, n_occ_raw,
             n_groups) = self.train_step_data(data)
            if loss is None:  # GT-free batch skipped (no --clip_text)
                continue
            # error-map EMA update (host-side scatter; ref utils.py:549-556)
            if self.error_map is not None and "inds_coarse" in data:
                idx = data["index"]
                inds = np.asarray(data["inds_coarse"]).reshape(-1)
                err = np.asarray(per_ray).reshape(-1)
                em = self.error_map[idx]
                em[inds] = 0.1 * em[inds] + 0.9 * err
                self.error_map[idx] = em
            if (self.global_step % update_interval == update_interval - 1
                    and not gt_free):
                self._adapt_budget(n_occ_raw)
                self._adapt_compaction(float(np.asarray(n_occ).mean()))
                self._adapt_group_budget(float(np.asarray(n_groups).mean()))
            total_loss += float(loss)
            nsteps += 1
            self.global_step += 1
            if self.global_step >= self.opt.iters:
                break
        avg = total_loss / max(nsteps, 1)
        self.stats["loss"].append(avg)
        dt = max(time.time() - t_epoch, 1e-9)
        self.log_metrics(
            loss=avg,
            rays_per_sec=nsteps * self.opt.num_rays / dt,
            train_budget=m.train_budget,
        )
        return avg

    def train_device(self, loader, max_steps=None, steps_per_dispatch=256):
        """Fully on-device training (``train/device_loop.py``): K steps per
        dispatch, dataset preloaded to HBM.  With ``--error_map`` the coarse
        error map is importance-sampled and EMA-updated ON DEVICE inside the
        scan (``sample_error_map``)."""
        from .device_loop import device_train_loop

        m = self.model
        max_steps = max_steps or self.opt.iters
        # the scan loop supports the SSIM patch guard (patch-structured
        # sampling in-program) but not the LPIPS patch loss (the AlexNet
        # stack would ride every scan carry) — fail loud instead of
        # silently dropping a validated, logged-as-active flag
        if self._lpips_params is not None:
            raise RuntimeError(
                "--patch_size LPIPS loss is not supported with "
                "--steps_per_dispatch scan training; drop "
                "--steps_per_dispatch (per-step path) or unset the LPIPS "
                "weights"
            )
        use_ssim = self.lambda_ssim > 0 and self.patch_size > 1
        if use_ssim and getattr(loader, "error_map", None) is not None:
            raise RuntimeError(
                "--lambda_ssim patch sampling and --error_map importance "
                "sampling are mutually exclusive in the scan loop"
            )
        P = len(loader.poses)
        C = loader.images.shape[-1]
        poses = jnp.asarray(np.asarray(loader.poses))
        images = jnp.asarray(
            np.asarray(loader.images, np.float32).reshape(P, -1, C)
        )
        intr = jnp.asarray(np.asarray(loader.intrinsics, np.float32))
        H, W = loader.H, loader.W

        if m.use_occ:
            self.model.mark_untrained_grid(loader.poses, loader.intrinsics)

        # error-map importance sampling runs ON DEVICE inside the scan when
        # the loader carries a map (--error_map)
        em = getattr(loader, "error_map", None)
        em = jnp.asarray(np.asarray(em, np.float32)) if em is not None else None
        if self.mesh is not None:
            # replicate the scan-loop inputs onto the (possibly
            # multi-process) mesh; sampling/sharding happens in-program
            from ..parallel.multihost import put_global

            poses = put_global(poses, self._repl)
            images = put_global(images, self._repl)
            intr = put_global(intr, self._repl)
            if em is not None:
                em = put_global(em, self._repl)

        from ..utils.dispatch import max_scan_steps

        steps_per_dispatch = max_scan_steps(steps_per_dispatch)
        start = time.time()
        while self.global_step < max_steps:
            k = min(steps_per_dispatch, max_steps - self.global_step)
            (m.params, self.ema_params, self.opt_state, m.occ, losses,
             mean_occ, em, occ_p95, mean_groups,
             mean_occ_raw) = device_train_loop(
                m.params, self.ema_params, self.opt_state, m.occ, poses,
                images, intr, m._next_key(), self.global_step, self.cfg_train,
                self._rc_train(),
                m.train_budget, self.optimizer.update, C == 4,
                self.ema_decay, k, self.opt.num_rays, H, W,
                update_interval=getattr(self.opt, "update_extra_interval", 16),
                density_thresh=m.density_thresh,
                mesh=self.mesh, error_map=em,
                patch_size=self.patch_size if use_ssim else 1,
                lambda_ssim=(jnp.float32(self.lambda_ssim)
                             if use_ssim else None),
            )
            if getattr(loader, "error_map", None) is None:
                em = None  # keep passing the no-map trace
            losses = np.asarray(losses)
            self.global_step += k
            self.stats["loss"].append(float(losses.mean()))
            rays_s = k * self.opt.num_rays / max(time.time() - start, 1e-9)
            self.log(
                f"[device loop] step={self.global_step}/{max_steps} "
                f"loss={losses[-1]:.6f} mean_occ={float(mean_occ):.1f} "
                f"({rays_s / 1e6:.2f}M rays/s)"
            )
            self.log_metrics(loss=float(losses.mean()), rays_per_sec=rays_s,
                             mean_occ=float(mean_occ),
                             occ_p95=float(occ_p95),
                             train_budget=m.train_budget)
            self._adapt_compaction(float(mean_occ))
            # march-budget adaptation in the scan path too (the LLFF r2
            # finding: forward-facing scenes saturate the static budget and
            # starve surfaces when only the per-step path adapts).  Feed the
            # MEAN — _adapt_budget targets 1.5x mean (mean_count parity);
            # feeding occ_p95 here parked the multiobj campaign at a 512
            # budget (mean 54) for ~2.5x step cost.
            self._adapt_budget(float(mean_occ_raw))
            self._adapt_group_budget(float(mean_groups))
            start = time.time()
            self.epoch += 1
            # checkpoint periodically, NOT per dispatch: a full save fetches
            # params+EMA+opt state off the device (hundreds of MB), which
            # under a slow host link dwarfs the 8-step dispatch itself
            # (measured 600 rays/s with per-dispatch saves vs ~8k without)
            if self.workspace and self.epoch % max(
                1, getattr(self.opt, "save_interval", 10)
            ) == 0:
                self.save_checkpoint(full=True)
                prune_checkpoints(self.ckpt_path, self.name, self.max_keep_ckpt)
                # fog-deadlock guard: an occupancy grid that never prunes
                # (frac ~1) starves the march budget on near-camera fog and
                # training converges to mush — almost always a too-low
                # --density_thresh (threshold is min(mean_density, thresh))
                occ_frac = float(jnp.mean(
                    m.occ.occupancy.astype(jnp.float32)
                ))
                self.log(f"[grid] occupancy frac {occ_frac:.3f} "
                         f"mean_density {float(m.occ.mean_density):.3f}")
                if (occ_frac > 0.9 and self.global_step > 500
                        and not getattr(self, "_warned_fog", False)):
                    self._warned_fog = True
                    self.log(
                        "[grid] WARNING: occupancy grid is >90% occupied "
                        "after 500 steps — the march budget is being spent "
                        "on unpruned fog. Raise --density_thresh (the "
                        "torch-ngp Blender recipe uses 10) or check the "
                        "scene scale."
                    )
        if self.workspace:
            self.save_checkpoint(full=True)
            prune_checkpoints(self.ckpt_path, self.name, self.max_keep_ckpt)
        if em is not None and getattr(loader, "error_map", None) is not None:
            loader.error_map = np.asarray(em)
            self.error_map = loader.error_map

    def train(self, train_loader, valid_loader=None, max_epochs=1):
        if self.model.use_occ and getattr(train_loader, "poses", None) is not None:
            self.model.mark_untrained_grid(
                train_loader.poses, train_loader.intrinsics
            )
        start = time.time()
        for epoch in range(self.epoch + 1, max_epochs + 1):
            self.epoch = epoch
            avg = self.train_one_epoch(train_loader)
            self.log(
                f"[epoch {epoch}/{max_epochs}] loss={avg:.6f} "
                f"step={self.global_step} "
                f"elapsed={time.time() - start:.1f}s"
            )
            if self.workspace:
                self.save_checkpoint(full=True)
                prune_checkpoints(self.ckpt_path, self.name, self.max_keep_ckpt)
            if valid_loader is not None and epoch % self.eval_interval == 0:
                self.evaluate_one_epoch(valid_loader)
            if self.global_step >= self.opt.iters:
                break

    # ------------------------------------------------------------------ eval
    def eval_params(self):
        return self.ema_params if self.ema_decay is not None else self.model.params

    def evaluate_one_epoch(self, loader, name=None):
        m = self.model
        for metric in self.metrics:
            metric.clear()
        # evaluate with EMA weights (ref: ema.store/copy_to around eval)
        params_backup, m.params = m.params, self.eval_params()
        total_loss, n = 0.0, 0
        try:
            for data in loader:
                images = np.asarray(data["images"])
                B, H, W, C = images.shape
                gt = (
                    images[..., :3] * images[..., 3:] + (1.0 - images[..., 3:])
                    if C == 4 else images
                )
                out = m.render(
                    jnp.asarray(data["rays_o"]), jnp.asarray(data["rays_d"]),
                    staged=True, max_ray_batch=getattr(self.opt, "max_ray_batch", 4096),
                    bg_color=None, perturb=False,
                )
                pred = np.asarray(out["image"]).reshape(B, H, W, 3)
                total_loss += float(np.mean((pred - gt) ** 2))
                n += 1
                for metric in self.metrics:
                    metric.update(pred, gt)
        finally:
            m.params = params_backup
        avg = total_loss / max(n, 1)
        self.stats["valid_loss"].append(avg)
        result = self.metrics[0].measure() if self.metrics else -avg
        self.stats["results"].append(result)
        for metric in self.metrics:
            self.log(f"[eval] {metric.report()}")
        if self.workspace and (
            self.stats["best_result"] is None or result > self.stats["best_result"]
        ):
            self.stats["best_result"] = result
            self.save_checkpoint(best=True)
        return avg

    def test(self, loader, save_path=None, write_video=False, name=None):
        """Render the test trajectory to PNGs (and mp4 when imageio+ffmpeg
        available), ref ``nerf/utils.py:661-717``."""
        m = self.model
        save_path = save_path or os.path.join(self.workspace, "results")
        os.makedirs(save_path, exist_ok=True)
        frames = []
        params_backup, m.params = m.params, self.eval_params()
        try:
            for i, data in enumerate(loader):
                out = m.render(
                    jnp.asarray(data["rays_o"]), jnp.asarray(data["rays_d"]),
                    staged=True,
                    max_ray_batch=getattr(self.opt, "max_ray_batch", 4096),
                )
                H, W = data["H"], data["W"]
                img = np.asarray(out["image"]).reshape(H, W, 3)
                img8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)
                frames.append(img8)
                try:
                    import cv2
                    cv2.imwrite(
                        os.path.join(save_path, f"{self.name}_{i:04d}_rgb.png"),
                        cv2.cvtColor(img8, cv2.COLOR_RGB2BGR),
                    )
                except Exception:
                    pass
        finally:
            m.params = params_backup
        if write_video and frames:
            try:
                import imageio
                imageio.mimwrite(
                    os.path.join(save_path, f"{self.name}_rgb.mp4"),
                    np.stack(frames), fps=25, quality=8,
                    macro_block_size=1,
                )
            except Exception:  # no ffmpeg backend in the image -> GIF
                try:
                    from PIL import Image
                    imgs = [Image.fromarray(f) for f in frames]
                    imgs[0].save(
                        os.path.join(save_path, f"{self.name}_rgb.gif"),
                        save_all=True, append_images=imgs[1:], duration=40,
                        loop=0,
                    )
                    self.log("[test] mp4 backend absent; wrote GIF instead")
                except Exception as e:
                    self.log(f"[test] video write skipped: {e}")
        return frames

    # ------------------------------------------------------------ checkpoint
    def _state(self, full=True):
        state = {
            "params": self.model.params,
            "ema_params": self.ema_params,
            "occ": self.model.occ._asdict(),
            "epoch": self.epoch,
            "global_step": self.global_step,
            "train_budget": self.model.train_budget,
        }
        if full:
            state["opt_state"] = self.opt_state
        return state

    def save_checkpoint(self, full=True, best=False):
        from ..parallel.multihost import is_primary
        if not is_primary():
            return None  # multi-process: process 0 owns the workspace files
        if best:
            state = self._state(full=False)
            state.pop("occ")  # best ckpt drops the grid, ref utils.py:1067-1069
            save_checkpoint(self.best_path, state)
            return self.best_path
        path = os.path.join(
            self.ckpt_path, f"{self.name}_ep{self.epoch:04d}.ckpt"
        )
        save_checkpoint(path, self._state(full=full))
        self.stats["checkpoints"].append(path)
        return path

    def load_checkpoint(self, path, model_only=False):
        raw = load_checkpoint(path)
        self.model.params = restore_like(self.model.params, raw["params"])
        if "ema_params" in raw:
            self.ema_params = restore_like(self.ema_params, raw["ema_params"])
        if "occ" in raw:
            occ = self.model.occ
            self.model.occ = occ._replace(
                **{
                    k: restore_like(getattr(occ, k), v)
                    for k, v in raw["occ"].items()
                }
            )
        if not model_only:
            self.epoch = int(raw.get("epoch", 0))
            self.global_step = int(raw.get("global_step", 0))
            self.model.train_budget = int(
                raw.get("train_budget", self.model.train_budget)
            )
            if "opt_state" in raw:
                try:
                    self.opt_state = restore_like(self.opt_state, raw["opt_state"])
                except Exception as e:
                    self.log(f"[ckpt] optimizer restore failed (soft): {e}")
        self.log(f"[ckpt] loaded {path}")
        self._ensure_occupancy(path)

    def _ensure_occupancy(self, path):
        """Best-format checkpoints drop the density grid (ref
        ``utils.py:1067-1069``); loading one for --test used to leave the
        occupancy grid empty — every render pure background (same silent
        failure the wm stage hit, see ``WatermarkTrainer._ensure_occupancy``).
        Rebuild deterministically from the loaded density field."""
        m = self.model
        if not getattr(m, "use_occ", False):
            return
        if bool(jnp.any(m.occ.occupancy)):
            return
        self.log(f"[ckpt] {path} carries no occupancy grid (best-ckpt "
                 "format drops it) — rebuilding from the density field")
        from ..ops.grid import update_occupancy_grid

        # full-query passes regardless of iter_density bookkeeping
        # (update_extra_state only does full updates while iter_density < 16)
        for _ in range(2):
            m.occ = update_occupancy_grid(
                m.occ, m._next_key(), m.density_fn,
                bound=m.rc.bound, grid_size=m.rc.grid_size,
                density_scale=m.rc.density_scale,
                density_thresh=m.density_thresh, full=True,
            )
        frac = float(jnp.mean(m.occ.occupancy.astype(jnp.float32)))
        self.log(f"[ckpt] rebuilt occupancy grid: {frac:.3f} occupied")
        if frac == 0.0:
            raise RuntimeError(
                "occupancy rebuild produced an empty grid — the model in "
                f"{path} renders nothing (wrong checkpoint, or density_thresh "
                f"{m.density_thresh} too high for this scene)"
            )
