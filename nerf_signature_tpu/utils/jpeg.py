"""Differentiable JPEG compression layers.

Equivalents of the reference's ``nerf/jpeg_layer.py``:
  * ``DiffJPEG`` (``jpeg_layer.py:22-34``): REAL codec JPEG under a
    straight-through estimator — ``x + stop_grad(jpeg(x) - x)``.  The
    reference calls PIL inside ``no_grad``; here the codec runs in a
    ``jax.pure_callback`` (host roundtrip, not jittable into one program).
  * ``jpeg_dct`` — a TPU-native alternative with NO host callback: the full
    JPEG transform (RGB->YCbCr, 8x8 block DCT, quality-scaled quantization
    with straight-through rounding, IDCT) in pure jnp, so JPEG-in-loop robust
    training stays one XLA program.  The DCT is two 8x8 matmuls per block —
    MXU-friendly.
  * ``RandomDiffJPEG`` (``jpeg_layer.py:36-54``): random quality in
    [low, 100) step 10 per call.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

# ITU-T T.81 Annex K base quantization tables
_Q_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], np.float32)
_Q_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], np.float32)


def _dct_matrix():
    n = 8
    k = np.arange(n)
    C = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    C[0] *= 1.0 / np.sqrt(2.0)
    return C.astype(np.float32)


_DCT = _dct_matrix()


def _quality_scale(quality):
    q = jnp.clip(quality, 1.0, 100.0)
    return jnp.where(q < 50.0, 5000.0 / q, 200.0 - 2.0 * q) / 100.0


def _ste_round(x):
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def _rgb_to_ycbcr(x):
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 0.5
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 0.5
    return jnp.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(x):
    y, cb, cr = x[..., 0], x[..., 1] - 0.5, x[..., 2] - 0.5
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return jnp.stack([r, g, b], axis=-1)


def _pad_to8(img):
    h, w = img.shape[-3], img.shape[-2]
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        img = jnp.pad(img, [(0, 0)] * (img.ndim - 3) + [(0, ph), (0, pw), (0, 0)],
                      mode="edge")
    return img, h, w


def jpeg_dct(images, quality=75.0):
    """TPU-native differentiable JPEG: images [B, H, W, 3] in [0, 1]."""
    x, H, W = _pad_to8(jnp.clip(images, 0.0, 1.0))
    B, Hp, Wp, _ = x.shape
    ycc = _rgb_to_ycbcr(x) * 255.0 - 128.0

    # [B, Hb, 8, Wb, 8, 3] -> blocks [B, Hb, Wb, 3, 8, 8]
    blocks = ycc.reshape(B, Hp // 8, 8, Wp // 8, 8, 3)
    blocks = jnp.transpose(blocks, (0, 1, 3, 5, 2, 4))

    D = jnp.asarray(_DCT)
    coef = jnp.einsum("ij,...jk,lk->...il", D, blocks, D)

    scale = _quality_scale(quality)
    q = jnp.stack([_Q_LUMA, _Q_CHROMA, _Q_CHROMA])  # [3, 8, 8]
    q = jnp.clip(jnp.floor(q * scale + 0.5), 1.0, 255.0)
    coef_q = _ste_round(coef / q) * q

    rec = jnp.einsum("ji,...jk,kl->...il", D, coef_q, D)
    rec = jnp.transpose(rec, (0, 1, 4, 2, 5, 3)).reshape(B, Hp, Wp, 3)
    out = _ycbcr_to_rgb((rec + 128.0) / 255.0)
    return jnp.clip(out[:, :H, :W], 0.0, 1.0)


def _pil_jpeg_roundtrip(arr, quality):
    """Host: encode/decode each image with the real codec."""
    import io

    from PIL import Image

    out = np.empty_like(arr)
    for i, img in enumerate(arr):
        pil = Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8))
        buf = io.BytesIO()
        pil.save(buf, format="JPEG", quality=int(quality))
        buf.seek(0)
        out[i] = np.asarray(Image.open(buf), np.float32) / 255.0
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def diff_jpeg_ste(images, quality=50):
    """Real-codec JPEG with a straight-through gradient
    (ref ``DiffJPEG.forward``, ``jpeg_layer.py:27-34``).
    images: [B, H, W, 3] in [0, 1]."""
    return jax.pure_callback(
        lambda a: _pil_jpeg_roundtrip(np.asarray(a, np.float32), quality),
        jax.ShapeDtypeStruct(images.shape, jnp.float32),
        images,
    )


def _diff_jpeg_fwd(images, quality):
    return diff_jpeg_ste(images, quality), None


def _diff_jpeg_bwd(quality, _, g):
    return (g,)  # straight-through


diff_jpeg_ste.defvjp(_diff_jpeg_fwd, _diff_jpeg_bwd)


def random_diff_jpeg(key, images, low=40, use_dct=True):
    """Random quality from {low, low+10, ..., 90}
    (ref ``RandomDiffJPEG``, ``jpeg_layer.py:36-54``)."""
    qualities = jnp.arange(low, 100, 10, dtype=jnp.float32)
    q = qualities[jax.random.randint(key, (), 0, len(qualities))]
    if use_dct:
        return jpeg_dct(images, q)
    # real-codec path needs a concrete quality -> pick host-side
    q_host = int(np.asarray(jax.device_get(q)))
    return diff_jpeg_ste(images, q_host)
