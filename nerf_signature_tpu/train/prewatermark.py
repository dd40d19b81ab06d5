"""Prewatermarking baseline: watermark the 2D training images FIRST, train a
fresh NeRF on them, then measure whether the bits survive novel-view
rendering.

This is the classical "2D watermark + distill" baseline the paper's codebook
design is motivated against.  The reference keeps it as a stale experimental
snapshot (``nerf/.ipynb_checkpoints/utils_wtmk_pre-checkpoint.py`` — a clean
Trainer over a ``NeRFDataset_Prewatermarking`` whose images come from a
pretrained model, ``provider_wtmk-checkpoint.py:2118-2352``) and relies on an
externally pretrained HiDDeN checkpoint (``get_hidden_decoder_ckpt``,
``nerf/hidden_models.py:183-196``).  This module is self-contained instead:

  1. ``pretrain_hidden``: jointly train the HiDDeN encoder/decoder pair
     (``models/hidden``) on random crops of the scene's own images — BCE on
     decoded bits + residual-magnitude penalty, with noise/resize jitter in
     the loop so the decoder tolerates render imperfections,
  2. ``watermark_images``: embed one fixed owner message into every training
     image (tanh residual, strength-scaled, clipped to [0, 1]),
  3. the normal clean trainer (``train/trainer.Trainer``) fits an NGP to the
     watermarked images,
  4. ``bit_survival``: decode the owner message from rendered views and
     report bit accuracy (the sign-agreement protocol of
     ``utils_wtmk_disen.py:340-346``).

Everything device-side is jitted; the crop sampling is host-side numpy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.hidden import (
    HiddenDecoderSingleConfig,
    HiddenEncoderConfig,
    hidden_decoder_single_apply,
    hidden_encoder_apply,
    init_hidden_decoder_single,
    init_hidden_encoder,
    normalize_img,
)


def _bce_logits(logits, bits):
    return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, bits))


def pretrain_hidden(images, message_dim, steps=600, crop=64, batch=8,
                    lr=1e-3, strength=0.1, lambda_res=0.01, noise_std=0.02,
                    seed=0, log=print, channels=64, dec_blocks=8,
                    enc_blocks=4):
    """Train a HiDDeN encoder/decoder pair on random crops of ``images``.

    images: [N, H, W, 3] float in [0, 1] (host numpy).
    Returns (enc_params, dec_params, enc_cfg, dec_cfg).
    """
    enc_cfg = HiddenEncoderConfig(num_bits=message_dim, channels=channels,
                                  num_blocks=enc_blocks)
    # single-view decoder with RUNNING-stats BN (ref ``get_hidden_decoder``,
    # ``hidden_models.py:77-102``): eval-time normalisation must not depend
    # on the decode batch — a batch-stat decoder erases any spatially-
    # constant message component when decoding one view at a time
    dec_cfg = HiddenDecoderSingleConfig(num_blocks=dec_blocks,
                                        num_bits=message_dim,
                                        channels=channels)
    k_enc, k_dec = jax.random.split(jax.random.PRNGKey(seed))
    dec_params, dec_state = init_hidden_decoder_single(k_dec, dec_cfg)
    params = {"enc": init_hidden_encoder(k_enc, enc_cfg), "dec": dec_params}
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, dec_state, opt_state, imgs, bits, key):
        def loss_fn(p):
            residual = hidden_encoder_apply(p["enc"], enc_cfg, imgs, bits)
            wm = jnp.clip(imgs + strength * residual, 0.0, 1.0)
            # in-loop distortion: additive noise (renders are never
            # pixel-exact copies of the training images)
            wm_n = wm + noise_std * jax.random.normal(key, wm.shape)
            x = normalize_img(jnp.clip(wm_n, 0.0, 1.0))
            logits, new_state = hidden_decoder_single_apply(
                p["dec"], dec_state, dec_cfg, x, train=True,
            )
            loss_w = _bce_logits(logits, bits)
            loss_r = jnp.mean(residual**2)
            acc = jnp.mean(((logits > 0) == (bits > 0.5)).astype(jnp.float32))
            return loss_w + lambda_res * loss_r, (acc, new_state)

        (loss, (acc, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_state, opt_state,
                loss, acc)

    rng = np.random.default_rng(seed)
    N, H, W = images.shape[:3]
    c = min(crop, H, W)
    for i in range(steps):
        idx = rng.integers(0, N, batch)
        ys = rng.integers(0, H - c + 1, batch)
        xs = rng.integers(0, W - c + 1, batch)
        crops = np.stack(
            [images[n, y:y + c, x:x + c, :3] for n, y, x in zip(idx, ys, xs)]
        ).astype(np.float32)
        bits = rng.integers(0, 2, (batch, message_dim)).astype(np.float32)
        params, dec_state, opt_state, loss, acc = step(
            params, dec_state, opt_state, jnp.asarray(crops),
            jnp.asarray(bits), jax.random.PRNGKey(seed * 100003 + i),
        )
        if log is not None and (i + 1) % max(1, steps // 5) == 0:
            log(f"[prewatermark] hidden pretrain {i + 1}/{steps} "
                f"loss={float(loss):.4f} bit_acc={float(acc):.4f}")
    return (params["enc"], {"params": params["dec"], "state": dec_state},
            enc_cfg, dec_cfg)


def watermark_images(enc_params, enc_cfg, images, message, strength=0.1,
                     chunk=4):
    """Embed ``message`` into every image.  images [N, H, W, 3] in [0, 1];
    message [message_dim] 0/1.  Returns the watermarked images (numpy)."""
    msg = jnp.asarray(message, jnp.float32)[None]

    @jax.jit
    def embed(imgs):
        bits = jnp.broadcast_to(msg, (imgs.shape[0], msg.shape[-1]))
        residual = hidden_encoder_apply(enc_params, enc_cfg, imgs, bits)
        return jnp.clip(imgs + strength * residual, 0.0, 1.0)

    out = []
    for i in range(0, images.shape[0], chunk):
        out.append(np.asarray(embed(jnp.asarray(
            images[i:i + chunk, ..., :3], jnp.float32))))
    return np.concatenate(out, axis=0)


def bit_survival(dec, dec_cfg, renders, message):
    """Decode the owner message from rendered views.

    dec: {'params', 'state'} as returned by ``pretrain_hidden``;
    renders: [N, H, W, 3] in [0, 1]; message: [message_dim] 0/1.
    Returns (bit_acc, per_view_acc).  Sign-agreement protocol of
    ``utils_wtmk_disen.py:340-346``; decoding uses the RUNNING BN stats
    (train=False), so per-view decode batches are well-defined."""

    @jax.jit
    def decode(x):
        logits, _ = hidden_decoder_single_apply(
            dec["params"], dec["state"], dec_cfg, x, train=False,
        )
        return logits

    msg = np.asarray(message) > 0.5
    per_view = []
    for i in range(renders.shape[0]):
        logits = np.asarray(
            decode(normalize_img(jnp.asarray(renders[i:i + 1, ..., :3],
                                             jnp.float32)))
        )[0]
        per_view.append(float(np.mean((logits > 0) == msg)))
    return float(np.mean(per_view)), per_view
