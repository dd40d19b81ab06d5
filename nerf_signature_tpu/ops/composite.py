"""Volume-rendering alpha compositing with early-termination semantics.

TPU-native replacement for the reference's three CUDA compositing kernels
(``kernel_composite_rays_train_forward/backward``, ``kernel_composite_rays``,
``raymarching/src/raymarching.cu:501-693,819-914``).

Key identity: with ``alpha_i = 1 - exp(-sigma_i * dt_i)`` the transmittance is

    T_i = prod_{j<i} (1 - alpha_j) = exp(-cumsum_exclusive(sigma_j * dt_j))

so the per-ray sequential scan of the CUDA kernels becomes two parallel
cumulative sums that XLA maps onto the VPU, and **autodiff of this closed form
reproduces the reference's hand-derived analytic backward**
(``raymarching.cu:602-693``) exactly — no custom VJP needed.

Early termination: the reference breaks the scan once T drops below
``T_thresh``; because T is monotonically non-increasing this is equivalent to
masking sample i with ``T_i >= T_thresh`` (T *entering* the sample), which is
what we do — same forward values, same zeroed gradients for dead samples.
"""

import jax.numpy as jnp


def composite_rays(sigmas, rgbs, deltas, ts, mask=None, T_thresh=1e-4):
    """Front-to-back composite of per-ray sample sequences.

    Args:
      sigmas: [N, S] densities (already scaled by density_scale).
      rgbs:   [N, S, 3] sample colors in [0, 1].
      deltas: [N, S] step sizes dt_i.
      ts:     [N, S] sample distances along the ray (used for depth; the
              reference accumulates ``t_i + dt_i - t0``, we use raw ``ts`` —
              depth is a visualization output).
      mask:   optional [N, S] bool; False samples contribute nothing (the
              static-budget marcher uses this for padding slots).
      T_thresh: early-termination transmittance threshold.

    Returns dict with 'weights_sum' [N], 'depth' [N], 'image' [N, 3],
    'weights' [N, S].
    """
    tau = sigmas * deltas  # optical depth per step
    if mask is not None:
        tau = jnp.where(mask, tau, 0.0)
    cum = jnp.cumsum(tau, axis=-1)
    T_in = jnp.exp(-(cum - tau))  # transmittance entering sample i
    alpha = 1.0 - jnp.exp(-tau)
    weights = alpha * T_in
    # early termination: sample only live while entering T >= T_thresh
    live = T_in >= T_thresh
    weights = jnp.where(live, weights, 0.0)
    if mask is not None:
        weights = jnp.where(mask, weights, 0.0)

    weights_sum = jnp.sum(weights, axis=-1)
    depth = jnp.sum(weights * ts, axis=-1)
    image = jnp.sum(weights[..., None] * rgbs, axis=-2)
    return {
        "weights_sum": weights_sum,
        "depth": depth,
        "image": image,
        "weights": weights,
    }
