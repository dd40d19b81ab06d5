"""Inverse-CDF importance sampling along rays (hierarchical NeRF sampling).

Equivalent of the reference's ``sample_pdf`` (``nerf/renderer.py:12-46``),
used by the fixed-step render path when ``upsample_steps > 0``.  Implemented
with ``jnp.searchsorted`` over the batched CDF — static shapes throughout.
"""

import jax
import jax.numpy as jnp


def sample_pdf(key, bins, weights, n_samples, det=False):
    """bins: [B, T] z-values, weights: [B, T-1] bin weights.

    Returns [B, n_samples] new z-values drawn proportionally to weights.
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [B, T]

    B = cdf.shape[0]
    if det:
        u = jnp.linspace(0.5 / n_samples, 1.0 - 0.5 / n_samples, n_samples)
        u = jnp.broadcast_to(u, (B, n_samples))
    else:
        u = jax.random.uniform(key, (B, n_samples))

    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)

    cdf_b = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_a = jnp.take_along_axis(cdf, above, axis=-1)
    bins_b = jnp.take_along_axis(bins, below, axis=-1)
    bins_a = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_b) / denom
    return bins_b + t * (bins_a - bins_b)
