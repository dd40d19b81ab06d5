"""Watermark-stage trainer: embed the codebook message + train the extractor.

Equivalent of the reference's watermark ``Trainer``
(``nerf/utils_wtmk_disen.py:363-1517``):
  * ``loss_w`` = BCE-with-logits on ``decoded * temp(10)`` vs bits, or MSE vs
    +-1 (``utils_wtmk_disen.py:438-443``),
  * ``train_step`` (``:579-646``): render the ``message_dim`` key blocks with
    the message -> clamp -> distort -> HiDDeN decode (1 bit/block); render
    fresh content rays -> MSE vs pseudo-GT; total =
    ``lambda_w * loss_w + lambda_i * loss_i``,
  * a FRESH random message every step (``:1165``),
  * gradients flow ONLY to msg_tables + decoder (structural freeze — the
    backbone is a captured constant of the jitted step),
  * occupancy grid inherited frozen from the clean checkpoint; only
    ``mark_untrained_grid`` at train start (``:759-760``), never
    ``update_extra_state``,
  * ``test_bitacc``: 200 random messages -> sign-agreement accuracy
    (``:935-1017``); ``test_bitacc_record`` appends per-trial accuracies to
    ``bitacc.txt`` (``:1019-1085``),
  * ``test_image``: PSNR/SSIM/LPIPS vs pseudo-GT + PNG dumps (``:816-933``).

TPU-native: the whole (render blocks + distort + decode + render content +
losses + Adam) step is ONE jitted program; block rays are a static
[D, bh, bw, 3] tensor so every step reuses the same executable.
"""

import dataclasses
import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..api import WatermarkModel
from ..models.hidden import hidden_decoder_apply, normalize_img
from ..models.message import msg_effective_table
from ..models.ngp import ngp_background
from ..models.watermark import wtmk_field
from ..ops.grid import render_grid
from ..render.renderer import render_rays_occ
from ..utils.image import distortion_layer
from .checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    prune_checkpoints,
    restore_like,
    save_checkpoint,
)
from .metrics import BitAccMeter, PSNRMeter, SSIMMeter
from .trainer import make_optimizer


def make_loss_w(kind, temp=10.0):
    """ref ``utils_wtmk_disen.py:438-443``."""
    if kind == "mse":
        return lambda decoded, bits: jnp.mean(
            (decoded * temp - (2.0 * bits - 1.0)) ** 2
        )
    if kind == "bce":
        return lambda decoded, bits: jnp.mean(
            optax.sigmoid_binary_cross_entropy(decoded * temp, bits)
        )
    raise NotImplementedError(kind)


def _bg_fn(backbone, wcfg):
    """Frozen-backbone bg-sphere closure when the clean model has one
    (bg_radius > 0), else None — keeps the wm-stage renders consistent with
    the pseudo-GT produced through ``model.render`` (which applies it)."""
    if wcfg.ngp.bg_radius > 0:
        return lambda o, d: ngp_background(backbone, wcfg.ngp, o, d)
    return None


def _render_blocks(backbone, trainable, occupancy, rays_o_b, rays_d_b,
                   message, wcfg, rc, budget):
    """Render the key blocks with the message embedded.

    rays_*_b: [D, bh, bw, 3] (single view) or [D, V, bh, bw, 3] (multi-view);
    returns decoder-ready blocks [D, bh, bw, 3] or [D, bh, bw, V*3]."""
    field = lambda x, d: wtmk_field(backbone, trainable, wcfg, x, d, message)
    out = render_rays_occ(
        field, occupancy, rays_o_b.reshape(-1, 3), rays_d_b.reshape(-1, 3),
        rc, budget=budget, bg_color=1.0, bg_fn=_bg_fn(backbone, wcfg),
    )
    img = jnp.clip(out["image"].reshape(*rays_o_b.shape), 0.0, 1.0)
    if img.ndim == 5:  # [D, V, bh, bw, 3] -> channel-concat views
        D, V, bh, bw, _ = img.shape
        img = jnp.transpose(img, (0, 2, 3, 1, 4)).reshape(D, bh, bw, V * 3)
    return img


def _per_view(fn, blocks):
    """Apply an RGB-image fn to blocks that may be multi-view channel-concat:
    [D, bh, bw, 3] applies directly; [D, bh, bw, V*3] applies per view."""
    C = blocks.shape[-1]
    if C == 3:
        return fn(blocks)
    D, bh, bw, _ = blocks.shape
    V = C // 3
    x = blocks.reshape(D, bh, bw, V, 3)
    x = jnp.transpose(x, (0, 3, 1, 2, 4)).reshape(D * V, bh, bw, 3)
    x = fn(x)
    x = x.reshape(D, V, bh, bw, 3)
    return jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(D, bh, bw, C)


def wm_rays(wcfg, wm):
    """Decoder-input ray bundles from a watermark data dict: block bundles,
    or (legacy whole-image mode, ``nerf/utils_wtmk.py``, and the CopyRNeRF
    baseline) a strided whole-key-image bundle.  Shared by the trainer and
    the attack suites so every decode path agrees on the extraction rays."""
    if not (wcfg.whole_image or wcfg.copyrnerf):
        return wm["rays_o_block"], wm["rays_d_block"]
    ro, rd = wm["rays_o"], wm["rays_d"]  # [1, H, W, 3]
    s = max(1, int(np.ceil(max(ro.shape[1], ro.shape[2]) / 96)))
    return ro[:, ::s, ::s], rd[:, ::s, ::s]


def _distort_and_normalize(key, blocks, kind):
    """Distort + ImageNet-normalise; multi-view blocks [D, bh, bw, V*3] are
    distorted/normalised per view."""
    return _per_view(
        lambda x: normalize_img(distortion_layer(key, x, kind)), blocks
    )


def _wm_step_loss(backbone, tr, occupancy, rays_o_b, rays_d_b, ct_o, ct_d,
                  ct_gt, message, key, lambda_w, lambda_i, wcfg, rc, budget,
                  block_budget, distortion, loss_w_fn, patch_size=1,
                  lambda_ssim=None, lambda_msg_reg=None):
    """The ONE watermark training objective (ref ``utils_wtmk_disen.py:
    579-646``), shared by the per-step path (``_wtmk_train_step``) and the
    scan loop (``_wm_device_loop``) so the two can never drift.

    Key blocks render at the EXTRACTION budget: the decoder must train on
    exactly the images ownership verification will decode — a train/infer
    budget mismatch is a systematic domain shift that caps bit accuracy.
    Content rays render at the PSEUDO-GT budget for the same reason (the
    pseudo-GT pool is produced at infer_budget), which also makes the two
    budgets equal in the default recipe — and then both ray sets render in
    ONE fused march+field+composite program instead of two.

    ``patch_size > 1`` + ``lambda_ssim``: the content rays are
    patch-structured (``--patch_size``, same convention as the clean
    trainer's LPIPS patch loss) and a structural term
    ``lambda_ssim * (1 - SSIM(pred_patches, gt_patches))`` is added.  The
    per-ray MSE is blind to the spatial STRUCTURE of the message
    perturbation — the codebook features at a single resolution manifest as
    high-frequency density speckle that MSE suppresses only slowly — while
    SSIM's local-variance terms penalise exactly that.  Weight-free (unlike
    LPIPS) so it works where no perceptual weights ship.  No reference
    equivalent; measured motivation in PERF.md (round-2 wm rerun).

    ``lambda_msg_reg``: amplitude regulariser on the message perturbation at
    its SOURCE — ``lambda_msg_reg * mean(effective_table(message) ** 2)``.
    The effective table (sum of the per-bit tables the message selects) IS
    the feature-space perturbation injected into the frozen backbone, so
    bounding its amplitude bounds the density speckle for every backbone
    draw instead of repairing it after the fact (cf. the PERF.md
    reproducibility note: the quality equilibrium varies with the frozen
    sigma-MLP's sensitivity to the injected features).  Cross-bit
    cancellation inside the sum is deliberately rewarded.  No reference
    equivalent (the reference re-tunes lambda/iters per scene)."""
    field = lambda x, d: wtmk_field(backbone, tr, wcfg, x, d, message)
    if budget == block_budget:
        n_b = int(np.prod(rays_o_b.shape[:-1]))
        out = render_rays_occ(
            field, occupancy,
            jnp.concatenate([rays_o_b.reshape(-1, 3), ct_o], 0),
            jnp.concatenate([rays_d_b.reshape(-1, 3), ct_d], 0),
            rc, budget=block_budget, bg_color=1.0,
            bg_fn=_bg_fn(backbone, wcfg),
        )
        blocks = jnp.clip(
            out["image"][:n_b].reshape(*rays_o_b.shape), 0.0, 1.0
        )
        if blocks.ndim == 5:  # [D, V, bh, bw, 3] -> channel-concat views
            D, V, bh, bw, _ = blocks.shape
            blocks = jnp.transpose(blocks, (0, 2, 3, 1, 4)).reshape(
                D, bh, bw, V * 3
            )
        content_img = out["image"][n_b:]
    else:  # A/B escape hatch (--wm_content_budget): two renders
        blocks = _render_blocks(
            backbone, tr, occupancy, rays_o_b, rays_d_b, message,
            wcfg, rc, block_budget,
        )
        content_img = render_rays_occ(
            field, occupancy, ct_o, ct_d, rc,
            budget=budget, bg_color=1.0, bg_fn=_bg_fn(backbone, wcfg),
        )["image"]
    decoded = hidden_decoder_apply(
        tr["decoder"], wcfg.decoder,
        _distort_and_normalize(key, blocks, distortion),
    )  # [D, 1] (block mode) or [1, D] (whole-image mode)
    lossw = loss_w_fn(decoded.reshape(-1),
                      message.astype(jnp.float32).reshape(-1))
    lossi = jnp.mean((content_img - ct_gt) ** 2)
    loss = lambda_w * lossw + lambda_i * lossi
    if patch_size > 1 and lambda_ssim is not None:
        from .metrics import ssim_jnp

        pp = patch_size
        npatch = content_img.shape[0] // (pp * pp)
        pred = content_img[: npatch * pp * pp].reshape(npatch, pp, pp, 3)
        gtp = ct_gt[: npatch * pp * pp].reshape(npatch, pp, pp, 3)
        loss = loss + lambda_ssim * (1.0 - ssim_jnp(pred, gtp))
    if lambda_msg_reg is not None and "msg_tables" in tr:
        eff = msg_effective_table(tr["msg_tables"], message)
        loss = loss + lambda_msg_reg * jnp.mean(jnp.square(eff))
    return loss, (lossw, lossi, decoded)


@functools.partial(
    jax.jit,
    static_argnames=("wcfg", "rc", "budget", "block_budget", "opt_update",
                     "distortion", "loss_kind", "patch_size"),
    donate_argnums=(1, 2),
)
def _wtmk_train_step(backbone, trainable, opt_state, occupancy, rays_o_b,
                     rays_d_b, content_rays_o, content_rays_d, content_gt,
                     message, key, lambda_w, lambda_i, wcfg, rc, budget,
                     block_budget, opt_update, distortion, loss_kind,
                     patch_size=1, lambda_ssim=None, lambda_msg_reg=None):
    loss_w_fn = make_loss_w(loss_kind)

    def loss_fn(tr):
        return _wm_step_loss(
            backbone, tr, occupancy, rays_o_b, rays_d_b, content_rays_o,
            content_rays_d, content_gt, message, key, lambda_w, lambda_i,
            wcfg, rc, budget, block_budget, distortion, loss_w_fn,
            patch_size=patch_size, lambda_ssim=lambda_ssim,
            lambda_msg_reg=lambda_msg_reg,
        )

    (loss, (lossw, lossi, decoded)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(trainable)
    updates, opt_state = opt_update(grads, opt_state, trainable)
    trainable = optax.apply_updates(trainable, updates)
    return trainable, opt_state, loss, lossw, lossi, decoded


@functools.partial(
    jax.jit,
    static_argnames=("wcfg", "rc", "budget", "block_budget", "opt_update",
                     "distortion", "loss_kind", "n_steps", "num_rays",
                     "H", "W", "mesh", "patch_size"),
    donate_argnums=(1, 2),
)
def _wm_device_loop(backbone, trainable, opt_state, occupancy, rays_o_b,
                    rays_d_b, poses, images, intrinsics, key, lambda_w,
                    lambda_i, wcfg, rc, budget, block_budget, opt_update,
                    distortion, loss_kind, n_steps, num_rays, H, W,
                    mesh=None, patch_size=1, lambda_ssim=None,
                    lambda_msg_reg=None):
    """K watermark steps per dispatch, the wm-stage analogue of
    ``train/device_loop.device_train_loop``: fresh random message, content
    pose/pixel sampling, block render + distort + decode, content MSE, and
    Adam — all inside ONE ``lax.scan`` program (zero host round-trips per
    step; the pseudo-GT pool lives in HBM).

    poses: [P, 4, 4]; images: [P, H*W, 3] (pseudo-GT);
    rays_*_b: the static key-block bundles.
    Returns (trainable, opt_state, losses/lossw/lossi [n_steps]).
    """
    from .device_loop import rays_from_pixels

    P = poses.shape[0]
    intr = (intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3])
    loss_w_fn = make_loss_w(loss_kind)
    if mesh is not None:
        # content rays sharded over the mesh inside the scan (params/blocks
        # replicated; GSPMD inserts the grad psum over ICI)
        from jax.sharding import NamedSharding, PartitionSpec
        _shard_rays = NamedSharding(mesh, PartitionSpec("rays"))
        shard = lambda x: jax.lax.with_sharding_constraint(x, _shard_rays)
    else:
        shard = lambda x: x

    def body(carry, k):
        trainable, opt_state = carry
        km, kp, ki, kd = jax.random.split(k, 4)
        message = jax.random.randint(km, (wcfg.message_dim,), 0, 2)
        pidx = jax.random.randint(kp, (), 0, P)
        if patch_size > 1:
            # patch-structured content sampling (mirrors data/rays.get_rays
            # patch mode): contiguous patch_size**2 pixel grids so the
            # SSIM/LPIPS patch terms see real local structure
            pp = patch_size
            npatch = num_rays // (pp * pp)
            kx, ky, kt = jax.random.split(ki, 3)
            tx = jax.random.randint(kx, (npatch,), 0, H - pp)
            ty = jax.random.randint(ky, (npatch,), 0, W - pp)
            pi, pj = np.meshgrid(np.arange(pp), np.arange(pp), indexing="ij")
            off = jnp.asarray(pi.ravel() * W + pj.ravel())
            pix = ((tx * W + ty)[:, None] + off[None]).reshape(-1)
            if npatch * pp * pp < num_rays:  # tail stays uniform
                rest = jax.random.randint(
                    kt, (num_rays - npatch * pp * pp,), 0, H * W
                )
                pix = jnp.concatenate([pix, rest])
        else:
            pix = jax.random.randint(ki, (num_rays,), 0, H * W)
        ct_o, ct_d = rays_from_pixels(poses[pidx], intr, pix, H, W)
        ct_o, ct_d = shard(ct_o), shard(ct_d)
        gt = shard(images[pidx, pix])

        def loss_fn(tr):
            loss, (lossw, lossi, _) = _wm_step_loss(
                backbone, tr, occupancy, rays_o_b, rays_d_b, ct_o, ct_d, gt,
                message, kd, lambda_w, lambda_i, wcfg, rc, budget,
                block_budget, distortion, loss_w_fn,
                patch_size=patch_size, lambda_ssim=lambda_ssim,
                lambda_msg_reg=lambda_msg_reg,
            )
            return loss, (lossw, lossi)

        (loss, (lossw, lossi)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(trainable)
        updates, opt_state = opt_update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return (trainable, opt_state), (loss, lossw, lossi)

    keys = jax.random.split(key, n_steps)
    (trainable, opt_state), (losses, lossws, lossis) = jax.lax.scan(
        body, (trainable, opt_state), keys
    )
    return trainable, opt_state, losses, lossws, lossis


@functools.partial(
    jax.jit,
    static_argnames=("wcfg", "rc", "budget", "distortion"),
)
def _wtmk_decode_blocks(backbone, trainable, occupancy, rays_o_b, rays_d_b,
                        message, key, wcfg, rc, budget, distortion):
    blocks = _render_blocks(
        backbone, trainable, occupancy, rays_o_b, rays_d_b, message,
        wcfg, rc, budget,
    )
    decoded = hidden_decoder_apply(
        trainable["decoder"], wcfg.decoder,
        _distort_and_normalize(key, blocks, distortion),
    )
    return blocks, decoded


@functools.partial(
    jax.jit,
    static_argnames=("wcfg", "rc", "budget", "distortion"),
)
def _wtmk_decode_blocks_batched(backbone, trainable, occupancy, rays_o_b,
                                rays_d_b, messages, keys, wcfg, rc, budget,
                                distortion):
    """Message-BATCHED ownership verification: vmap the whole block render +
    distort + decode over B messages in one program.

    The reference (and the per-message path) dispatches one program per
    trial — 200 dispatches per evaluation; under per-dispatch-latency
    environments that measures the transport.  vmap keeps the decoder's
    batch-stat normalisation PER MESSAGE (each vmapped instance computes its
    own batch statistics), so the logits are semantically identical to the
    sequential path.  messages: [B, D] int; keys: [B] PRNG keys."""
    def one(message, key):
        blocks = _render_blocks(
            backbone, trainable, occupancy, rays_o_b, rays_d_b, message,
            wcfg, rc, budget,
        )
        return hidden_decoder_apply(
            trainable["decoder"], wcfg.decoder,
            _distort_and_normalize(key, blocks, distortion),
        )

    return jax.vmap(one)(messages, keys)


class WatermarkTrainer:
    def __init__(self, name, opt, model: WatermarkModel, workspace="workspace",
                 metrics=None, metrics_message=None, eval_interval=10,
                 save_interval=10, max_keep_ckpt=2, use_checkpoint="latest",
                 mute=False):
        self.name = name
        self.opt = opt
        self.model = model
        self.workspace = workspace
        self.metrics = metrics if metrics is not None else [PSNRMeter(), SSIMMeter()]
        self.metrics_message = metrics_message if metrics_message is not None else [BitAccMeter()]
        self.eval_interval = eval_interval
        self.save_interval = save_interval
        self.max_keep_ckpt = max_keep_ckpt
        self.mute = mute

        self.lambda_w = opt.lambda_w
        self.lambda_i = opt.lambda_i
        self.loss_kind = getattr(opt, "loss_w", "bce")
        self.distortion = getattr(opt, "distortion", "none")
        self.message_dim = opt.message_dim
        # post-lock content polish (--wm_polish_iters): extra iters appended
        # after the main schedule with lambda_w dropped to
        # --wm_polish_lambda_w, so the content loss recovers image quality
        # while the locked bit margins survive (measured: 50 pure-image-MSE
        # finetune-attack steps leave bit-acc ~0.99, train/attack.py).
        # No reference equivalent — a quality/robustness knob this side of
        # the bits-vs-PSNR tradeoff.
        self.polish_iters = int(getattr(opt, "wm_polish_iters", 0) or 0)
        self.total_iters = opt.iters + self.polish_iters
        self._polishing = False
        # content rays render at the pseudo-GT budget by default: the
        # pseudo-GT pool is produced at infer_budget (provider_wtmk), so a
        # train_budget content render gives loss_i a floor that is pure
        # render-budget mismatch, not watermark perturbation (the same
        # domain-shift class as the round-1 key-block fix; ref
        # utils_wtmk_disen.py:598-638 renders content with the SAME pipeline
        # that made the pseudo-GT).  --wm_content_budget overrides for A/B.
        self.content_budget = (
            getattr(opt, "wm_content_budget", 0) or model.infer_budget
        )
        # --patch_size + --lambda_ssim: structural content guard on
        # patch-shaped content rays (see _wm_step_loss docstring)
        self.patch_size = int(getattr(opt, "patch_size", 1) or 1)
        self.lambda_ssim = float(getattr(opt, "lambda_ssim", 0.0) or 0.0)
        if self.lambda_ssim > 0 and self.patch_size <= 1:
            raise ValueError(
                "--lambda_ssim needs patch-structured content rays: "
                "set --patch_size > 1 (num_rays divisible by patch_size**2)"
            )
        # --lambda_msg_reg: amplitude regulariser on the message-table
        # perturbation source (see _wm_step_loss docstring)
        self.lambda_msg_reg = float(
            getattr(opt, "lambda_msg_reg", 0.0) or 0.0
        )
        if self.lambda_msg_reg > 0 and "msg_tables" not in model.trainable:
            raise ValueError(
                "--lambda_msg_reg regularises the codebook msg tables; this "
                "model variant has no msg_tables in its trainable subtree"
            )
        # Train-step-scoped field config (same contract as the clean
        # Trainer.cfg_train): --hash_fwd_corners 1 makes the IN-STEP block +
        # content renders one-corner importance estimates (8x fewer forward
        # gather rows); every eval / decode / pseudo-GT path keeps
        # model.wcfg's exact 8-corner interpolation, so ownership decodes
        # stay exact.  See NGPConfig.hash_fwd_corners.
        fwd_corners = int(getattr(opt, "hash_fwd_corners", 8) or 8)
        if fwd_corners != 8 and not model.wcfg.ngp.stochastic_hash_grad:
            raise ValueError("--hash_fwd_corners 1 requires "
                             "--stochastic_hash_grad")
        self.wcfg_train = (
            dataclasses.replace(
                model.wcfg,
                ngp=dataclasses.replace(model.wcfg.ngp,
                                        hash_fwd_corners=fwd_corners),
            )
            if fwd_corners != model.wcfg.ngp.hash_fwd_corners
            else model.wcfg
        )

        self.optimizer = make_optimizer(opt.lr, opt.iters)
        if model.wcfg.finetune_decoder:
            # ref network_wtmk_tcnn.py:90-95,179-184: msg_encoder frozen too,
            # only the decoder trains.  NB: optax.masked alone does NOT
            # freeze — it passes the raw gradient through where mask=False;
            # frozen params must have their updates zeroed.
            self.optimizer = optax.multi_transform(
                {"train": self.optimizer, "freeze": optax.set_to_zero()},
                param_labels={
                    k: ("train" if k == "decoder" else "freeze")
                    for k in model.trainable
                },
            )
        self.opt_state = self.optimizer.init(model.trainable)

        self.epoch = 0
        self.global_step = 0
        self._wm_state_loaded = False
        self.stats = {"loss": [], "lossi": [], "lossw": [], "results": [],
                      "checkpoints": [], "best_result": None}
        self.rng = np.random.default_rng(opt.seed)

        # multi-device data parallelism over the content-ray axis (key blocks
        # + decoder stay replicated — they are small); params replicated,
        # GSPMD inserts the gradient psum over ICI.  Mirrors the clean
        # Trainer; the reference's DDP scaffolding is never launched
        # (SURVEY.md §2.8).
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
            model.backbone = put(model.backbone)
            model.trainable = put(model.trainable)
            self.opt_state = put(self.opt_state)
            model.occ = put(model.occ)
        else:
            self.mesh = None

        if workspace is not None:
            os.makedirs(workspace, exist_ok=True)
            self.ckpt_path = os.path.join(workspace, "checkpoints")
            os.makedirs(self.ckpt_path, exist_ok=True)
            self.log_path = os.path.join(workspace, f"log_{name}.txt")
            self.best_path = os.path.join(self.ckpt_path, f"{name}.ckpt")
        else:
            self.ckpt_path = self.log_path = self.best_path = None

        # checkpoint resolution, ref utils_wtmk_disen.py:508-526
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
            # Crash-resume guard: a watchdogged wm stage relaunches with its
            # ORIGINAL flags, so --ckpt still names the clean backbone (in
            # another workspace) even when THIS workspace already holds
            # wm-stage progress — loading only the backbone would silently
            # retrain the watermark from step 0 (observed live: a relay
            # wedge at the 600-iter mark cost a full re-embed).  If the
            # explicit path lies outside this workspace and wm checkpoints
            # exist here, resume from the newest of those instead.  An
            # explicit path INSIDE the workspace (a deliberate rewind to a
            # specific epoch) is honoured unchanged.
            resumed = False
            explicit_inside = self.ckpt_path is not None and (
                os.path.dirname(os.path.abspath(use_checkpoint))
                == os.path.abspath(self.ckpt_path)
            )
            if self.ckpt_path is not None and not explicit_inside:
                from .checkpoint import checkpoint_candidates

                for path in checkpoint_candidates(self.ckpt_path, name):
                    # Peek at the raw dict BEFORE applying anything: both
                    # stages name checkpoints ngp_ep*.ckpt, and committing
                    # to load_checkpoint() first would apply a stale
                    # CLEAN-stage candidate's epoch/global_step/opt_state —
                    # the model-only fallback below never resets them, so
                    # the wm stage would silently train ~0 steps.
                    try:
                        raw = load_checkpoint(path)
                    except Exception as e:
                        self.log(f"[ckpt] {path} unreadable ({e}); "
                                 f"falling back to previous")
                        continue
                    if not ("backbone" in raw and "trainable" in raw
                            and int(raw.get("global_step", 0)) > 0):
                        self.log(f"[ckpt] {path} holds no wm-stage progress "
                                 "(clean-format or step 0) — not a resume "
                                 "candidate")
                        continue
                    self.load_checkpoint(path)
                    self.log(
                        f"[ckpt] workspace already holds wm-stage "
                        f"progress (step {self.global_step}) — resumed "
                        f"from {path} instead of restarting from the "
                        f"backbone {use_checkpoint}")
                    resumed = True
                    break
            if not resumed:
                self.load_checkpoint(use_checkpoint, model_only=True)

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
        if not self.workspace:
            return
        import json

        from .trainer import _tb_writer

        path = os.path.join(self.workspace, "metrics.jsonl")
        with open(path, "a") as f:
            f.write(json.dumps({"step": self.global_step, **scalars}) + "\n")
        tb = _tb_writer(self.workspace)
        if tb is not None:
            for k, v in scalars.items():
                if isinstance(v, (int, float)):
                    tb.add_scalar(f"train/{k}", v, self.global_step)

    def random_message(self):
        return self.rng.integers(0, 2, self.message_dim).astype(np.int32)

    # ----------------------------------------------------------------- train
    def _wm_rays(self, wm):
        return wm_rays(self.model.wcfg, wm)

    def train_step_data(self, data, message):
        m = self.model
        wm = data["watermark"]
        ct = data["content"]
        ro_b, rd_b = self._wm_rays(wm)
        ct_o = jnp.asarray(ct["rays_o"]).reshape(-1, 3)
        ct_d = jnp.asarray(ct["rays_d"]).reshape(-1, 3)
        ct_gt = jnp.asarray(ct["images"]).reshape(-1, 3)
        if self.mesh is not None:
            from ..parallel.multihost import put_global
            put = lambda x: put_global(x, self._shard)
            ct_o, ct_d, ct_gt = put(ct_o), put(ct_d), put(ct_gt)
        (m.trainable, self.opt_state, loss, lossw, lossi, decoded
         ) = _wtmk_train_step(
            m.backbone, m.trainable, self.opt_state,
            render_grid(m.occ, m.rc.t_cull),
            jnp.asarray(ro_b), jnp.asarray(rd_b),
            ct_o, ct_d, ct_gt,
            jnp.asarray(message), m._next_key(),
            jnp.float32(self.lambda_w), jnp.float32(self.lambda_i),
            self.wcfg_train, m.rc, self.content_budget, m.infer_budget,
            self.optimizer.update, self.distortion, self.loss_kind,
            patch_size=self.patch_size,
            lambda_ssim=(jnp.float32(self.lambda_ssim)
                         if self.lambda_ssim > 0 else None),
            lambda_msg_reg=(jnp.float32(self.lambda_msg_reg)
                            if self.lambda_msg_reg > 0 else None),
        )
        return loss, lossw, lossi, decoded

    def train_one_epoch(self, loader):
        tot, totw, toti, n = 0.0, 0.0, 0.0, 0
        for data in loader:
            self._maybe_enter_polish(self.opt.iters)
            message = self.random_message()  # fresh per step, ref :1165
            loss, lossw, lossi, _ = self.train_step_data(data, message)
            tot += float(loss); totw += float(lossw); toti += float(lossi)
            n += 1
            self.global_step += 1
            if self.global_step >= self.total_iters:
                break
        self.stats["loss"].append(tot / max(n, 1))
        self.stats["lossw"].append(totw / max(n, 1))
        self.stats["lossi"].append(toti / max(n, 1))
        self.log_metrics(loss=tot / max(n, 1), lossw=totw / max(n, 1),
                         lossi=toti / max(n, 1))
        return tot / max(n, 1), totw / max(n, 1), toti / max(n, 1)

    def train(self, train_loader, test_image_loader=None,
              test_bitacc_loader=None, max_epochs=1):
        # grid is frozen from the clean ckpt; only frustum-mark it
        if self.model.use_occ and getattr(train_loader, "poses", None) is not None:
            self.model.mark_untrained_grid(
                train_loader.poses, train_loader.intrinsics
            )
        if self.workspace and getattr(train_loader, "images_block", None) is not None:
            self._save_gt_blocks(train_loader)
        start = time.time()
        for epoch in range(self.epoch + 1, max_epochs + 1):
            self.epoch = epoch
            loss, lossw, lossi = self.train_one_epoch(train_loader)
            self.log(
                f"[wm epoch {epoch}/{max_epochs}] loss={loss:.6f} "
                f"lossw={lossw:.6f} lossi={lossi:.6f} "
                f"step={self.global_step} elapsed={time.time()-start:.1f}s"
            )
            if test_bitacc_loader is not None and epoch % self.eval_interval == 0:
                self.test_bitacc(test_bitacc_loader)
            if test_image_loader is not None and epoch % self.eval_interval == 0:
                self.test_image(test_image_loader)
            if self.workspace and epoch % self.save_interval == 0:
                self.save_checkpoint(full=True)
                prune_checkpoints(self.ckpt_path, self.name, self.max_keep_ckpt)
            if self.global_step >= self.total_iters:
                break
        if self.workspace:
            self.save_checkpoint(full=True)

    def train_device(self, train_loader, max_steps=None,
                     steps_per_dispatch=256, test_image_loader=None,
                     test_bitacc_loader=None):
        """Fully on-device wm training (``_wm_device_loop``): K steps per
        dispatch, pseudo-GT pool + key-block bundles preloaded to HBM.
        With ``--devices N`` the content-ray batch is sharded over the mesh
        inside the scan; evals run host-side between dispatches."""
        m = self.model
        max_steps = max_steps or self.opt.iters
        if m.use_occ and getattr(train_loader, "poses", None) is not None:
            m.mark_untrained_grid(train_loader.poses, train_loader.intrinsics)
        if self.workspace and getattr(train_loader, "images_block", None) is not None:
            self._save_gt_blocks(train_loader)

        wm = next(iter(train_loader))["watermark"]
        ro_b, rd_b = self._wm_rays(wm)
        ro_b, rd_b = jnp.asarray(ro_b), jnp.asarray(rd_b)
        P = len(train_loader.poses)
        poses = jnp.asarray(np.asarray(train_loader.poses, np.float32))
        images = jnp.asarray(
            np.asarray(train_loader.train_images, np.float32).reshape(P, -1, 3)
        )
        intr = jnp.asarray(np.asarray(train_loader.intrinsics, np.float32))
        if self.mesh is not None:
            # replicate the scan-loop inputs onto the (possibly
            # multi-process) mesh; content-ray sharding happens in-program
            from ..parallel.multihost import put_global

            ro_b = put_global(ro_b, self._repl)
            rd_b = put_global(rd_b, self._repl)
            poses = put_global(poses, self._repl)
            images = put_global(images, self._repl)
            intr = put_global(intr, self._repl)
        H, W = train_loader.H, train_loader.W
        # rays/step = content rays + key-block rays (consistent with BENCH_WM)
        rays_per_step = self.opt.num_rays + int(np.prod(ro_b.shape[:-1]))

        from ..utils.dispatch import max_scan_steps

        steps_per_dispatch = max_scan_steps(steps_per_dispatch)
        total = max_steps + self.polish_iters
        start = time.time()
        while self.global_step < total:
            self._maybe_enter_polish(max_steps)
            k = min(steps_per_dispatch, total - self.global_step)
            if (self.polish_iters and not self._polishing
                    and self.global_step < max_steps):
                # never straddle the main/polish boundary: the dispatch's
                # lambda_w is fixed at launch, so straddling would run up to
                # k-1 polish-schedule steps at the full weight
                k = min(k, max_steps - self.global_step)
            (m.trainable, self.opt_state, losses, lossws, lossis
             ) = _wm_device_loop(
                m.backbone, m.trainable, self.opt_state,
                render_grid(m.occ, m.rc.t_cull),
                ro_b, rd_b, poses, images, intr, m._next_key(),
                jnp.float32(self.lambda_w), jnp.float32(self.lambda_i),
                self.wcfg_train, m.rc, self.content_budget, m.infer_budget,
                self.optimizer.update, self.distortion, self.loss_kind,
                k, self.opt.num_rays, H, W, mesh=self.mesh,
                patch_size=self.patch_size,
                lambda_ssim=(jnp.float32(self.lambda_ssim)
                             if self.lambda_ssim > 0 else None),
                lambda_msg_reg=(jnp.float32(self.lambda_msg_reg)
                                if self.lambda_msg_reg > 0 else None),
            )
            losses = np.asarray(losses)
            self.global_step += k
            self.epoch += 1
            rays_s = k * rays_per_step / max(time.time() - start, 1e-9)
            self.log(
                f"[wm device loop] step={self.global_step}/{max_steps} "
                f"loss={losses[-1]:.6f} lossw={float(np.asarray(lossws)[-1]):.6f} "
                f"lossi={float(np.asarray(lossis)[-1]):.6f} "
                f"({rays_s / 1e6:.2f}M rays/s)"
            )
            self.log_metrics(loss=float(losses.mean()),
                             lossw=float(np.asarray(lossws).mean()),
                             lossi=float(np.asarray(lossis).mean()),
                             rays_per_sec=rays_s)
            start = time.time()
            if test_bitacc_loader is not None and self.epoch % self.eval_interval == 0:
                self.test_bitacc(test_bitacc_loader)
            if test_image_loader is not None and self.epoch % self.eval_interval == 0:
                self.test_image(test_image_loader)
            if self.workspace and self.epoch % self.save_interval == 0:
                self.save_checkpoint(full=True)
                prune_checkpoints(self.ckpt_path, self.name, self.max_keep_ckpt)
        if self.workspace:
            self.save_checkpoint(full=True)

    def resolve_auto_compaction(self, loader):
        """``--compact_frac -1`` in the wm stage: the backbone is frozen, so
        occupancy never changes — resolve auto sample compaction ONCE from a
        probe render instead of the clean trainer's adaptive loop (same
        1.5x-headroom buckets as ``Trainer._adapt_compaction``)."""
        if getattr(self.opt, "compact_frac", 0) != -1:
            return
        import dataclasses

        from ..data.rays import get_rays

        m = self.model
        pose = np.asarray(loader.poses[:1], np.float32)
        rays = get_rays(pose, loader.intrinsics, loader.H, loader.W,
                        min(4096, loader.H * loader.W))
        m.render(jnp.asarray(rays["rays_o"][0]),
                 jnp.asarray(rays["rays_d"][0]), None,
                 staged=False, budget=m.train_budget)
        n_occ = np.asarray(m._last_n_occupied)
        S = m.train_budget
        fill = min(float(n_occ.mean()), S) / S
        # same 1.3x-headroom 1/16-grid rule as Trainer._adapt_compaction
        # (the probe render is cull-free — rc_eval — so with --t_cull the
        # measured fill OVERestimates the train step's: conservative)
        import math as _math

        target = min(1.0, _math.ceil(1.3 * fill * 16.0) / 16.0)
        if target < 1.0:
            m.rc = dataclasses.replace(m.rc, compact_frac=target)
        self.log(f"[compact] wm auto sample compaction -> {target} "
                 f"(probe mean occupied {float(n_occ.mean()):.1f}/{S})")
        # group budget: same one-shot resolution (frozen backbone -> frozen
        # occupancy), same 1.5x-mean pow2 rule over the UNCAPPED
        # occupied-group statistic as the clean trainer's
        # _adapt_group_budget; the probe render's group count is
        # budget-independent (geometry only).
        if getattr(self.opt, "group_budget", 0) == -1:
            n_grp = getattr(m, "_last_n_groups_occ", None)
            if n_grp is not None:
                from ..ops.marching import num_candidates

                mean_g = float(np.asarray(n_grp).mean())
                gb = 1 << max(4, int(np.ceil(np.log2(max(1.5 * mean_g,
                                                         1.0)))))
                gb = min(gb, max(num_candidates(
                    m.rc.bound, m.rc.max_steps, m.rc.dt_gamma) // 4, 1))
                m.rc = dataclasses.replace(m.rc, group_budget=gb)
                self.log(f"[group] wm auto march group budget -> {gb} "
                         f"(probe mean occupied groups {mean_g:.1f})")

    def _maybe_enter_polish(self, main_iters):
        """Switch to the content-polish lambda once the main schedule ends."""
        if (self.polish_iters and not self._polishing
                and self.global_step >= main_iters):
            self._polishing = True
            self.lambda_w = float(
                getattr(self.opt, "wm_polish_lambda_w", 0.0) or 0.0
            )
            self.log(
                f"[polish] entering {self.polish_iters}-iter content polish "
                f"at lambda_w={self.lambda_w} (bits locked; recovering PSNR)"
            )

    def _save_gt_blocks(self, loader):
        """Dump the GT key-block crops once (ref ``:766-789``)."""
        try:
            import cv2
            path = os.path.join(self.workspace, "gt_blocks")
            os.makedirs(path, exist_ok=True)
            for i, b in enumerate(np.asarray(loader.images_block)):
                cv2.imwrite(
                    os.path.join(path, f"block_{i:02d}.png"),
                    cv2.cvtColor((np.clip(b, 0, 1) * 255).astype(np.uint8),
                                 cv2.COLOR_RGB2BGR),
                )
        except Exception:
            pass

    # ------------------------------------------------------------------ eval
    def _rc_eval(self):
        """Block-decode evals run UNCOMPACTED.  Sample compaction is sized by
        ``resolve_auto_compaction`` from a CONTENT-ray probe (full-view rays,
        most of which miss geometry); key-block rays are concentrated on
        textured surfaces with far higher fill, so rendering blocks through
        that compaction silently drops overflow samples and corrupts the
        decode.  This was the in-train (0.933) vs fresh-process (0.9987)
        bit-acc discrepancy: the ``--test`` CLI never resolves auto
        compaction, so it always decoded exactly.  Exactness > speed here —
        a block render is only D * bh * bw rays.  The march pre-filter is
        forced off for the same reason: its group-budget truncation can drop
        in-budget samples when occupied candidates are spread over more than
        group_budget groups (speckled occupancy) — decodes must be exact up
        to the sample budget ONLY."""
        return dataclasses.replace(self.model.rc, compact_frac=0.0,
                                    prefilter=False, t_cull=0.0)

    def eval_blocks(self, wm, message, distortion=None):
        m = self.model
        ro_b, rd_b = self._wm_rays(wm)
        blocks, decoded = _wtmk_decode_blocks(
            m.backbone, m.trainable, m.occ.occupancy,
            jnp.asarray(ro_b), jnp.asarray(rd_b),
            jnp.asarray(message), m._next_key(), m.wcfg, self._rc_eval(),
            m.infer_budget, distortion or self.distortion,
        )
        return np.asarray(blocks), np.asarray(decoded)

    def test_bitacc(self, loader, record_path=None, batch=None):
        """200 random messages -> sign-agreement bit accuracy.
        Ref ``test_bitacc`` / ``test_bitacc_record`` (``:935-1085``).

        Trials run message-batched (``--bitacc_batch`` messages per
        dispatch, vmapped — see ``_wtmk_decode_blocks_batched``); batch=1
        falls back to the sequential per-message path."""
        meter = self.metrics_message[0]
        meter.clear()
        batch = batch or getattr(self.opt, "bitacc_batch", 8)
        n_trials = len(loader)
        wm = None
        for data in loader:
            wm = data["watermark"]
            break
        if wm is None:
            return None
        m = self.model
        ro_b, rd_b = self._wm_rays(wm)
        ro_b, rd_b = jnp.asarray(ro_b), jnp.asarray(rd_b)
        done = 0
        t0 = time.time()
        next_report = 60.0  # progress heartbeat: long evals look like a
        # stall to watchdogs otherwise (each batched dispatch syncs to host,
        # so this costs nothing extra)
        self.log(
            f"[test_bitacc] evaluating {n_trials} messages "
            f"(batch {batch}; first dispatch compiles)"
        )
        while done < n_trials:
            if time.time() - t0 >= next_report:
                # one >60s dispatch must not cause a burst of catch-up lines
                next_report = time.time() - t0 + 60.0
                self.log(
                    f"[test_bitacc] {done}/{n_trials} messages "
                    f"(acc so far {meter.measure():.4f}, "
                    f"{time.time() - t0:.0f}s)"
                )
            use = min(batch, n_trials - done)
            if batch == 1:
                # documented sequential escape hatch (per-message dispatch,
                # the reference's per-trial behaviour)
                message = self.random_message()
                _, decoded = self.eval_blocks(wm, message)
                meter.update(np.asarray(decoded).reshape(-1), message)
                done += 1
                continue
            # always dispatch the FULL batch shape (tail trials padded with
            # extra random messages, rows past ``use`` discarded) so the
            # vmapped program compiles exactly once
            messages = np.stack(
                [self.random_message() for _ in range(batch)]
            )
            keys = jax.random.split(m._next_key(), batch)
            decoded = np.asarray(_wtmk_decode_blocks_batched(
                m.backbone, m.trainable, m.occ.occupancy, ro_b, rd_b,
                jnp.asarray(messages), keys, m.wcfg, self._rc_eval(),
                m.infer_budget, self.distortion,
            ))
            for b in range(use):
                meter.update(decoded[b].reshape(-1), messages[b])
            done += use
        acc = meter.measure()
        sig = meter.significance() if hasattr(meter, "significance") else "n/a"
        self.log(f"[test_bitacc] {meter.report()} over {meter.N} messages "
                 f"(ownership evidence vs random guessing: {sig})")
        if record_path or (self.workspace and record_path is None):
            path = record_path or os.path.join(self.workspace, "bitacc.txt")
            with open(path, "a") as f:
                for r in meter.records:
                    f.write(f"{r}\n")
        if acc is not None and (
            self.stats["best_result"] is None or acc > self.stats["best_result"]
        ):
            self.stats["best_result"] = acc
            if self.workspace:
                self.save_checkpoint(best=True)
        return acc

    def test_image(self, loader, name="test_image"):
        """Whole-image renders with a random message vs pseudo-GT.
        Ref ``test_image`` (``:816-933``)."""
        for metric in self.metrics:
            metric.clear()
        m = self.model
        save_path = os.path.join(self.workspace, name) if self.workspace else None
        if save_path:
            os.makedirs(save_path, exist_ok=True)
        for i, data in enumerate(loader):
            message = self.random_message()
            out = m.render(
                jnp.asarray(data["rays_o"]), jnp.asarray(data["rays_d"]),
                message, staged=True,
                max_ray_batch=getattr(self.opt, "max_ray_batch", 4096),
            )
            H, W = data["H"], data["W"]
            pred = np.clip(np.asarray(out["image"]).reshape(-1, H, W, 3), 0, 1)
            gt = np.asarray(data["images"]).reshape(-1, H, W, 3)
            for metric in self.metrics:
                metric.update(pred, gt)
            if save_path:
                try:
                    import cv2
                    cv2.imwrite(
                        os.path.join(save_path, f"{i:04d}_rgb.png"),
                        cv2.cvtColor((pred[0] * 255).astype(np.uint8),
                                     cv2.COLOR_RGB2BGR),
                    )
                except Exception:
                    pass
        for metric in self.metrics:
            self.log(f"[{name}] {metric.report()}")
        return {m_.name: m_.measure() for m_ in self.metrics}

    # ------------------------------------------------------------ checkpoint
    def _state(self, full=True):
        state = {
            "backbone": self.model.backbone,
            "trainable": self.model.trainable,
            "occ": self.model.occ._asdict(),
            "epoch": self.epoch,
            "global_step": self.global_step,
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
            state.pop("occ")
            save_checkpoint(self.best_path, state)
            return self.best_path
        path = os.path.join(self.ckpt_path, f"{self.name}_ep{self.epoch:04d}.ckpt")
        save_checkpoint(path, self._state(full=full))
        self.stats["checkpoints"].append(path)
        return path

    def load_checkpoint(self, path, model_only=False):
        """Loads either a watermark ckpt or a CLEAN-stage ckpt (whose params
        become the frozen backbone; msg/decoder keys absent => keep init) —
        the strict=False cross-stage ingestion (ref ``:1474-1479``)."""
        raw = load_checkpoint(path)
        m = self.model
        if "backbone" in raw:
            m.backbone = restore_like(m.backbone, raw["backbone"])
            if "trainable" in raw:
                m.trainable = restore_like(m.trainable, raw["trainable"])
                self._wm_state_loaded = True
        elif "params" in raw:  # clean-stage checkpoint
            m.backbone = restore_like(m.backbone, raw["params"])
        if "occ" in raw:
            occ = m.occ
            m.occ = occ._replace(
                **{k: restore_like(getattr(occ, k), v)
                   for k, v in raw["occ"].items()}
            )
        if not model_only:
            self.epoch = int(raw.get("epoch", 0))
            self.global_step = int(raw.get("global_step", 0))
            if "opt_state" in raw:
                try:
                    self.opt_state = restore_like(self.opt_state, raw["opt_state"])
                except Exception as e:
                    self.log(f"[ckpt] optimizer restore failed (soft): {e}")
        self.log(f"[ckpt] loaded {path}")
        self._ensure_occupancy(path)

    def _ensure_occupancy(self, path):
        """The wm stage inherits its occupancy grid FROZEN from the loaded
        checkpoint and never runs grid maintenance (ref behaviour).  A "best"
        checkpoint intentionally drops the grid (ref ``utils.py:1067-1069``),
        and loading one used to leave the grid EMPTY — every render is then
        pure background and the message gradient is STRUCTURALLY ZERO, so
        training silently converges to a collapsed decoder (bit-acc 0.5,
        PSNR vs pseudo-GT ~inf; observed live on the 32-bit campaign).
        Rebuild the grid from the frozen backbone's density field instead:
        two full-query update passes are deterministic given the frozen
        params and reproduce what the clean stage would have saved."""
        m = self.model
        if not m.use_occ:
            return
        if bool(jnp.any(m.occ.occupancy)):
            return
        self.log(f"[ckpt] {path} carries no occupancy grid (best-ckpt "
                 "format drops it) — rebuilding from the frozen backbone "
                 "density field")
        from ..ops.grid import update_occupancy_grid

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
                "occupancy rebuild produced an empty grid — the backbone in "
                f"{path} renders nothing (wrong checkpoint, or density_thresh "
                f"{m.density_thresh} too high for this scene)"
            )
