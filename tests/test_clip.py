"""Parity test for the native JAX CLIP vision tower against a randomly
initialised ``transformers`` CLIP vision model — validates ingestion +
forward math offline (the real checkpoint needs network access).
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from nerf_signature_tpu.utils.clip_loss import (
    clip_guidance_loss,
    clip_image_features,
    clip_vision_params_from_torch,
)


def _tiny_model():
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    cfg = CLIPVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=16,
        projection_dim=24, hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    model = CLIPVisionModelWithProjection(cfg)
    model.eval()
    return model


def test_vision_tower_parity_with_transformers():
    model = _tiny_model()
    params, meta = clip_vision_params_from_torch(model)
    assert meta["n_heads"] == 4 and meta["patch"] == 16

    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)

    ours = np.asarray(clip_image_features(params, meta, jnp.asarray(imgs)))

    # transformers expects already-normalised NCHW pixel values
    from nerf_signature_tpu.utils.clip_loss import _CLIP_MEAN, _CLIP_STD

    x = (imgs - _CLIP_MEAN) / _CLIP_STD
    with torch.no_grad():
        out = model(pixel_values=torch.tensor(x).permute(0, 3, 1, 2))
    ref = out.image_embeds.numpy()
    ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)

    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-5)


def test_guidance_loss_differentiable():
    model = _tiny_model()
    params, meta = clip_vision_params_from_torch(model)
    text = jnp.asarray(
        np.random.default_rng(1).normal(size=(1, 24)), jnp.float32
    )
    text = text / jnp.linalg.norm(text, axis=-1, keepdims=True)
    imgs = jnp.asarray(
        np.random.default_rng(2).uniform(0, 1, (1, 48, 48, 3)), jnp.float32
    )
    loss, g = jax.value_and_grad(
        lambda im: clip_guidance_loss(params, meta, text, im)
    )(imgs)
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0
