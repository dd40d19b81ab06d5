"""Watermark attack suites: distortion sweep, epsilon-ball parameter attack,
and the backbone finetuning attack.

Equivalents of the reference's robustness tooling:
  * the ``--distortion`` re-extraction evaluation
    (``main_nerf_wtmk.py:75``, ``utils_wtmk_disen.py:551-577``) generalised to
    a named-attack sweep over ``utils.attacks.ATTACKS``,
  * the checkpoint-variant PARAMETER-SPACE adversarial attack
    (``nerf/.ipynb_checkpoints/utils_adv_attack_disen-checkpoint.py:416,
    1126-1131``): an adversary finetunes the model to erase the watermark
    while clamping every parameter to an L-inf epsilon-ball around the
    original weights (so rendering quality survives); ownership is then
    re-verified with the attacked weights,
  * the FINETUNING attack (``nerf/.ipynb_checkpoints/
    utils_finetuning_attack_disen-checkpoint.py:538-593`` +
    ``network_finetuning_attack_tcnn-checkpoint.py:128-146,231-241``): the
    adversary trains ONLY the clean backbone hash encoder with a pure image
    MSE (the watermark loss is zeroed upstream at ``:585-586``) against views
    of the model, hoping the re-fitted geometry/colour washes the message
    contribution out of renders; ownership is re-verified afterwards.

TPU-native: both the attacker step (render + image loss + grad + update +
ball projection) and the sweep evaluation are single jitted programs.
"""

import dataclasses
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.hidden import hidden_decoder_apply, normalize_img
from ..models.watermark import wtmk_field
from ..render.renderer import render_rays_occ
from ..utils.attacks import ATTACKS
from .metrics import BitAccMeter
from .trainer_wtmk import _per_view, _render_blocks, wm_rays


@functools.partial(jax.jit, static_argnames=("wcfg", "rc", "budget"))
def _attack_render_batch(backbone, trainable, occupancy, rays_o_b, rays_d_b,
                         messages, wcfg, rc, budget):
    """Block renders for B messages (same program shape as test_bitacc's)."""
    def one(message):
        return _render_blocks(
            backbone, trainable, occupancy, rays_o_b, rays_d_b, message,
            wcfg, rc, budget,
        )

    return jax.vmap(one)(messages)


@functools.partial(jax.jit, static_argnames=("wcfg", "attack"))
def _attack_decode_batch(decoder, blocks, keys, wcfg, attack):
    """Attack + normalise + decode, vmapped over messages.

    Multi-view aware: blocks come back [B, D, bh, bw, 3] or [..., V*3];
    attacks + normalisation run per view, batch stats per message."""
    def one(blk, key):
        blk = _per_view(
            lambda x: normalize_img(ATTACKS[attack](key, x)), blk
        )
        return hidden_decoder_apply(decoder, wcfg.decoder, blk)

    return jax.vmap(one)(blocks, keys)


def attack_sweep(trainer, loader, attacks=None, n_test=50, batch=None):
    """Bit-accuracy under each named image attack.

    trainer: WatermarkTrainer; loader: 'test'-mode NeRFDatasetDisen.
    Trials run message-batched like ``test_bitacc`` (vmapped render +
    attack + decode; ``--bitacc_batch`` messages per dispatch).
    Returns {attack_name: bit_acc}.
    """
    attacks = attacks or list(ATTACKS)
    m = trainer.model
    batch = batch or getattr(getattr(trainer, "opt", None),
                             "bitacc_batch", None) or 8
    results = {}
    wm = None
    for data in loader:  # grab the (static) watermark dict once
        wm = data["watermark"]
        break
    # same extraction rays as the trainer (block bundles, or the strided
    # whole key image in whole-image/CopyRNeRF decoder modes)
    ro_b, rd_b = wm_rays(m.wcfg, wm)
    rays_o_b = jnp.asarray(ro_b)
    rays_d_b = jnp.asarray(rd_b)

    # TWO jit programs, not one fused render+attack+decode, and BOTH take
    # the model state as ARGUMENTS, never as closure constants: a closed-
    # over pytree (hash tables alone are tens of MB) is embedded into the
    # serialized HLO as literals, which exceeded the relay's request-size
    # limit (HTTP 413 on remote_compile, then a wedged worker — observed
    # live on the 32-bit multiobj campaign, twice: first on the fused
    # program, then again on a split whose render still closed over the
    # params).  As arguments the weights ship once via the normal transfer
    # path and the HLO stays small — the same structure that makes
    # _wtmk_decode_blocks_batched fit.  Blocks stay on device between the
    # two dispatches.
    # block renders are evaluated UNCOMPACTED (exact) — see
    # WatermarkTrainer._rc_eval: key-block rays have far higher sample fill
    # than the content rays that size auto compaction, and overflow drops
    # samples silently
    # (and with the march pre-filter off, so group-budget truncation can't
    # drop in-budget samples either — decodes are exact up to the budget)
    rc_eval = dataclasses.replace(m.rc, compact_frac=0.0, prefilter=False,
                                  t_cull=0.0)

    def decode_batch(messages, keys, attack):
        blocks = _attack_render_batch(
            m.backbone, m.trainable, m.occ.occupancy, rays_o_b, rays_d_b,
            messages, m.wcfg, rc_eval, m.infer_budget,
        )
        return _attack_decode_batch(
            m.trainable["decoder"], blocks, keys, m.wcfg, attack
        )

    t0 = time.time()
    next_report = 60.0
    for attack in attacks:
        meter = BitAccMeter()
        done = 0
        while done < n_test:
            if time.time() - t0 >= next_report:
                # watchdog heartbeat — each attack is its own compiled
                # program and dispatches are silent otherwise
                next_report = time.time() - t0 + 60.0
                trainer.log(
                    f"[attack_sweep] {attack}: {done}/{n_test} messages "
                    f"({time.time() - t0:.0f}s)"
                )
            # full batch shape every dispatch (tail rows discarded) — one
            # compiled program per attack
            use = min(batch, n_test - done)
            messages = np.stack(
                [trainer.random_message() for _ in range(batch)]
            )
            keys = jax.random.split(m._next_key(), batch)
            decoded = np.asarray(decode_batch(
                jnp.asarray(messages), keys, attack
            ))
            for b in range(use):
                meter.update(decoded[b].reshape(-1), messages[b])
            done += use
        results[attack] = meter.measure()
        trainer.log(f"[attack_sweep] {attack:16s} bit_acc={results[attack]:.4f}")
    return results


@functools.partial(
    jax.jit, static_argnames=("wcfg", "rc", "budget", "opt_update")
)
def _param_attack_step(trainable, opt_state, message, backbone, occupancy,
                       orig, rays_o, rays_d, target, epsilon, wcfg, rc,
                       budget, opt_update):
    # model state enters as ARGUMENTS, not closure constants (see the
    # attack_sweep comment: closed-over weight pytrees embed as HLO
    # literals and blow the relay's request-size limit — HTTP 413)
    def loss_fn(tr):
        field = lambda x, d: wtmk_field(backbone, tr, wcfg, x, d, message)
        out = render_rays_occ(
            field, occupancy, rays_o, rays_d, rc, budget=budget, bg_color=1.0,
        )
        # adversary wants message renders to look message-free
        return jnp.mean((out["image"] - target) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(trainable)
    updates, opt_state = opt_update(grads, opt_state, trainable)
    trainable = optax.apply_updates(trainable, updates)
    # epsilon-ball projection around the original weights
    # (ref utils_adv_attack_disen-checkpoint.py:1126-1131)
    trainable = jax.tree_util.tree_map(
        lambda p, o: jnp.clip(p, o - epsilon, o + epsilon), trainable, orig
    )
    return trainable, opt_state, loss


def parameter_attack(trainer, loader, epsilon=1e-3, steps=100, lr=1e-3,
                     num_rays=4096):
    """Epsilon-ball finetuning attack on the watermarked model.

    The adversary minimises the image loss against the model's OWN renders
    while perturbing ``msg_tables`` (the watermark carrier) toward zero
    effect, with every parameter clamped to +-epsilon of its original value.
    Returns the attacked trainable params (the caller re-runs ``test_bitacc``
    with them to measure surviving bit accuracy).
    """
    m = trainer.model
    orig = jax.tree_util.tree_map(jnp.copy, m.trainable)
    opt = optax.adam(lr)
    opt_state = opt.init(m.trainable)

    # content rays from the first train pose batch
    data = next(iter(loader))
    ct = data["content"] if "content" in data else data
    rays_o = jnp.asarray(ct["rays_o"]).reshape(-1, 3)[:num_rays]
    rays_d = jnp.asarray(ct["rays_d"]).reshape(-1, 3)[:num_rays]

    # adversary's target: the clean (message-free) render.  t_cull stays off
    # in the attack loops (they pass the bool occupancy field).
    rc_atk = dataclasses.replace(m.rc, t_cull=0.0)
    clean_field = lambda x, d: wtmk_field(m.backbone, orig, m.wcfg, x, d, None)
    target = render_rays_occ(
        clean_field, m.occ.occupancy, rays_o, rays_d, rc_atk,
        budget=m.infer_budget, bg_color=1.0,
    )["image"]

    attacked = m.trainable
    loss = float("nan")
    rng = np.random.default_rng(0)
    for i in range(steps):
        msg = jnp.asarray(
            rng.integers(0, 2, m.wcfg.message_dim).astype(np.int32)
        )
        attacked, opt_state, loss = _param_attack_step(
            attacked, opt_state, msg, m.backbone, m.occ.occupancy, orig,
            rays_o, rays_d, target, jnp.float32(epsilon), m.wcfg, rc_atk,
            m.train_budget, opt.update,
        )
    trainer.log(f"[parameter_attack] eps={epsilon} steps={steps} "
                f"final adv loss={float(loss):.6f}")
    return attacked


@functools.partial(
    jax.jit, static_argnames=("wcfg", "rc", "budget", "opt_update")
)
def _finetune_attack_step(train_part, opt_state, rays_o, rays_d, target,
                          orig_backbone, trainable, occupancy, wcfg, rc,
                          budget, opt_update):
    # model state enters as ARGUMENTS, not closure constants (see the
    # attack_sweep comment: closed-over weight pytrees embed as HLO
    # literals and blow the relay's request-size limit — HTTP 413)
    ones_msg = jnp.ones((wcfg.message_dim,), jnp.int32)

    def loss_fn(tp):
        bb = dict(orig_backbone, **tp)
        field = lambda x, d: wtmk_field(bb, trainable, wcfg, x, d, ones_msg)
        # render at the SAME budget the pseudo-GT targets were produced
        # with, so the loss floor is the watermark contribution alone,
        # not a render-budget domain shift
        out = render_rays_occ(
            field, occupancy, rays_o, rays_d, rc, budget=budget, bg_color=1.0,
        )
        return jnp.mean((out["image"] - target) ** 2)

    loss, grad = jax.value_and_grad(loss_fn)(train_part)
    updates, opt_state = opt_update(grad, opt_state, train_part)
    return optax.apply_updates(train_part, updates), opt_state, loss


def finetune_attack(trainer, loader, steps=100, lr=1e-3, num_rays=4096,
                    full_backbone=False):
    """Backbone finetuning attack on the watermarked model.

    The adversary re-trains the backbone with an image MSE against the
    training views' pseudo-GT (the reference fits ``data['images']`` per
    batch, ``utils_finetuning_attack_disen-checkpoint.py:559-586``, cycling
    over the dataset); the message pathway stays active during the attack
    renders with a fixed all-ones message, mirroring the reference's
    ``torch.randint(1, 2, ...)`` message (``provider_wtmk-checkpoint.py:
    2383``).  Two trainable surfaces, matching the two reference variants:

      * ``full_backbone=False``: ONLY the hash table — the finetuning-ATTACK
        variant's group is exactly ``self.encoder.parameters()``
        (``network_finetuning_attack_tcnn-checkpoint.py:231-241``),
      * ``full_backbone=True``: encoder + sigma/dir/color nets — the
        ``network_finetune_tcnn`` variant's four param groups
        (``network_finetune_tcnn-checkpoint.py:257-268``).

    Returns the attacked backbone params; the caller re-runs ``test_bitacc``
    with them to measure how much of the watermark survives.
    """
    m = trainer.model
    orig_backbone = jax.tree_util.tree_map(jnp.copy, m.backbone)
    keys = (list(orig_backbone) if full_backbone else ["hash_table"])
    train0 = {k: orig_backbone[k] for k in keys}
    opt = optax.adam(lr)
    opt_state = opt.init(train0)

    tp = train0
    loss = float("nan")
    done = 0
    while done < steps:  # cycle the loader: fresh rays/views every step
        before = done
        for data in loader:
            if done >= steps:
                break
            ct = data["content"] if "content" in data else data
            rays_o = jnp.asarray(ct["rays_o"]).reshape(-1, 3)[:num_rays]
            rays_d = jnp.asarray(ct["rays_d"]).reshape(-1, 3)[:num_rays]
            target = jnp.asarray(ct["images"]).reshape(-1, 3)[:num_rays]
            tp, opt_state, loss = _finetune_attack_step(
                tp, opt_state, rays_o, rays_d, target, orig_backbone,
                m.trainable, m.occ.occupancy, m.wcfg,
                dataclasses.replace(m.rc, t_cull=0.0), m.infer_budget,
                opt.update,
            )
            done += 1
        if done == before:
            raise ValueError("finetune_attack loader yielded no batches — "
                             "pass a re-iterable loader, not a one-shot "
                             "generator")
    trainer.log(f"[finetune_attack] steps={steps} lr={lr} "
                f"full_backbone={full_backbone} "
                f"final adv loss={float(loss):.6f}")
    return dict(orig_backbone, **tp)
