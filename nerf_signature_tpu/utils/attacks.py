"""Image attack / normalisation utilities for robustness evaluation.

Equivalent of the reference's ``nerf/utils_img.py:38-175`` (torchvision/augly
based): pixel rounding/clamping, L-inf projection, PSNR, center crop, resize,
rotation, brightness/contrast, JPEG, gaussian blur — all as pure jnp ops so
attack suites run jitted on device.  Images are [B, H, W, 3] in [0, 1]
(channel-last; the reference is NCHW).
"""

import jax
import jax.numpy as jnp

from .image import gaussian_blur3, rotate, scale
from .jpeg import diff_jpeg_ste, jpeg_dct


def round_pixel(x):
    """Quantise to the 8-bit pixel lattice with straight-through gradient."""
    y = jnp.round(x * 255.0) / 255.0
    return x + jax.lax.stop_gradient(y - x)


def clamp_pixel(x):
    return jnp.clip(x, 0.0, 1.0)


def project_linf(x, y, radius):
    """Project x into the L-inf ball of `radius` (pixel units /255) around y."""
    delta = jnp.clip(x - y, -radius / 255.0, radius / 255.0)
    return y + delta


def psnr(x, y):
    mse = jnp.mean((x - y) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def center_crop(x, frac):
    """Keep the central `frac` area (sqrt(frac) per side), zero outside —
    shape-static equivalent of a crop-attack."""
    B, H, W, C = x.shape
    side = jnp.sqrt(jnp.asarray(frac))
    h2 = H * side / 2.0
    w2 = W * side / 2.0
    rr = jnp.arange(H)[:, None]
    cc = jnp.arange(W)[None, :]
    mask = (
        (jnp.abs(rr - (H - 1) / 2.0) <= h2) & (jnp.abs(cc - (W - 1) / 2.0) <= w2)
    )
    return x * mask[None, :, :, None]


def resize_attack(x, factor):
    """Down-then-up resample through `factor` resolution (information loss)."""
    B, H, W, C = x.shape
    h2, w2 = max(1, int(H * factor)), max(1, int(W * factor))
    small = jax.image.resize(x, (B, h2, w2, C), "linear")
    return jax.image.resize(small, (B, H, W, C), "linear")


def adjust_brightness(x, factor):
    return jnp.clip(x * factor, 0.0, 1.0)


def adjust_contrast(x, factor):
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    return jnp.clip((x - mean) * factor + mean, 0.0, 1.0)


def jpeg_compress(x, quality=50, real_codec=False):
    if real_codec:
        return diff_jpeg_ste(x, int(quality))
    return jpeg_dct(x, float(quality))


def gaussian_blur(x, sigma):
    """3x3 gaussian blur (per-batch sigma broadcastable)."""
    sigmas = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32), (x.shape[0],))
    return gaussian_blur3(x, sigmas)


# named attack registry for sweep-style robustness evals
ATTACKS = {
    "none": lambda key, x: x,
    "jpeg_80": lambda key, x: jpeg_compress(x, 80),
    "jpeg_50": lambda key, x: jpeg_compress(x, 50),
    "noise_01": lambda key, x: x + jax.random.normal(key, x.shape) * 0.1,
    "blur": lambda key, x: gaussian_blur(x, 0.5),
    "brightness_1_5": lambda key, x: adjust_brightness(x, 1.5),
    "brightness_0_5": lambda key, x: adjust_brightness(x, 0.5),
    "contrast_1_5": lambda key, x: adjust_contrast(x, 1.5),
    "crop_50": lambda key, x: center_crop(x, 0.5),
    "resize_50": lambda key, x: resize_attack(x, 0.5),
    "rotation_15": lambda key, x: rotate(
        x, jax.random.uniform(key, (x.shape[0],), minval=-15.0, maxval=15.0)
    ),
    "scaling": lambda key, x: scale(
        x, jnp.full((x.shape[0],),
                    jax.random.uniform(key, (), minval=0.75, maxval=1.25))
    ),
    "round": lambda key, x: round_pixel(x),
}
