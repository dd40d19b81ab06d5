"""Differentiable image distortions for watermark-robustness training.

Equivalent of the reference's ``Trainer.distortion_layer``
(``nerf/utils_wtmk_disen.py:551-577``): none / noise(sigma^2=0.1) /
rotation(+-30 deg) / scaling(0.75-1.25) / blurring(gaussian k=3,
sigma U(0.01,0.5)) / brightness(ColorJitter 0.5 => multiply U(0.5,1.5)).

All variants are pure jnp with STATIC shapes so they live inside the jitted
watermark train step (the reference applies torchvision transforms eagerly):
  * rotation and scaling are implemented as affine warps via bilinear
    ``map_coordinates`` on a fixed canvas.  Note: the reference's "scaling"
    actually calls 1-D ``F.interpolate(mode='linear')`` on a [3, h, w] tensor
    (scaling only the last axis and changing the output shape); we implement
    a true isotropic 2-D rescale about the image centre on the same canvas —
    a strictly stronger distortion with static shapes.
"""

import jax
import jax.numpy as jnp


def _warp(img, coords):
    """img [h, w, c]; coords [2, h, w] (row, col) sample positions."""
    from jax.scipy.ndimage import map_coordinates

    return jnp.stack(
        [
            map_coordinates(img[..., c], [coords[0], coords[1]], order=1,
                            mode="constant", cval=0.0)
            for c in range(img.shape[-1])
        ],
        axis=-1,
    )


def _grid(h, w):
    r = jnp.arange(h, dtype=jnp.float32)
    c = jnp.arange(w, dtype=jnp.float32)
    rr, cc = jnp.meshgrid(r, c, indexing="ij")
    return rr, cc


def rotate(images, angles_deg):
    """images [B, h, w, c]; angles per image (degrees, +-)."""
    B, h, w, _ = images.shape
    rr, cc = _grid(h, w)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0

    def one(img, a):
        t = -a * jnp.pi / 180.0  # inverse map
        cos, sin = jnp.cos(t), jnp.sin(t)
        r0, c0 = rr - cy, cc - cx
        src_r = cos * r0 - sin * c0 + cy
        src_c = sin * r0 + cos * c0 + cx
        return _warp(img, jnp.stack([src_r, src_c]))

    return jax.vmap(one)(images, angles_deg)


def scale(images, factors):
    """Isotropic rescale about the centre on the same canvas (zoom in/out)."""
    B, h, w, _ = images.shape
    rr, cc = _grid(h, w)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0

    def one(img, s):
        src_r = (rr - cy) / s + cy
        src_c = (cc - cx) / s + cx
        return _warp(img, jnp.stack([src_r, src_c]))

    return jax.vmap(one)(images, factors)


def gaussian_blur3(images, sigmas):
    """3x3 gaussian blur with per-batch sigma (reflect-ish via edge clamp)."""

    def one(img, sigma):
        x = jnp.array([-1.0, 0.0, 1.0])
        k = jnp.exp(-(x**2) / (2 * sigma**2))
        k = k / k.sum()
        # separable conv along h and w (same padding, edge replicate)
        p = jnp.pad(img, ((1, 1), (0, 0), (0, 0)), mode="edge")
        img2 = p[:-2] * k[0] + p[1:-1] * k[1] + p[2:] * k[2]
        p = jnp.pad(img2, ((0, 0), (1, 1), (0, 0)), mode="edge")
        return p[:, :-2] * k[0] + p[:, 1:-1] * k[1] + p[:, 2:] * k[2]

    return jax.vmap(one)(images, sigmas)


def distortion_layer(key, images, kind="none"):
    """images [B, h, w, 3] in [0, 1].  Differentiable w.r.t. images."""
    if kind == "none":
        return images
    B = images.shape[0]
    if kind == "noise":
        return images + jax.random.normal(key, images.shape) * jnp.sqrt(0.1)
    if kind == "rotation":
        angles = jax.random.uniform(key, (B,), minval=-30.0, maxval=30.0)
        return rotate(images, angles)
    if kind == "scaling":
        # the reference draws ONE factor per batch; keep that
        sf = jax.random.uniform(key, (), minval=0.75, maxval=1.25)
        return scale(images, jnp.full((B,), sf))
    if kind == "blurring":
        sigmas = jax.random.uniform(key, (B,), minval=0.01, maxval=0.5)
        return gaussian_blur3(images, sigmas)
    if kind == "brightness":
        f = jax.random.uniform(key, (B, 1, 1, 1), minval=0.5, maxval=1.5)
        return images * f
    if kind == "crop":
        # train-through-crop: random central keep-area per step, the same
        # zero-outside masking as the crop_50 attack (utils/attacks.py) —
        # closes the sweep's crop hole the way the reference's in-loop
        # distortion recipe closes noise/rotation (utils_wtmk_disen.py:551-577
        # has no crop arm; the attack geometry makes one necessary at 32 bits)
        from .attacks import center_crop

        frac = jax.random.uniform(key, (), minval=0.3, maxval=0.9)
        return center_crop(images, frac)
    if kind == "jpeg":
        # JPEG-in-the-loop robust training (the reference's experimental
        # ``utils_wtmk_disen_jpeg`` variant, SURVEY.md §2.7) — fully in-XLA
        # via the DCT JPEG with a random quality per step
        from .jpeg import random_diff_jpeg

        return random_diff_jpeg(key, images, low=40, use_dct=True)
    raise ValueError(f"unknown distortion: {kind}")
