"""Ray/AABB and ray/sphere intersections, vectorized over rays.

Equivalents of the reference CUDA kernels ``kernel_near_far_from_aabb``
(``raymarching/src/raymarching.cu:92-156``) and ``kernel_sph_from_ray``
(``raymarching/src/raymarching.cu:163-209``).  Branchless slab test so the
whole batch is one fused VPU program.
"""

import jax.numpy as jnp

_MISS = 3.4028235e38  # float32 max, matches the CUDA kernel's miss sentinel


def near_far_from_aabb(rays_o, rays_d, aabb, min_near=0.2):
    """Slab test of rays against one axis-aligned box.

    rays_o, rays_d: [N, 3]; aabb: [6] (xmin, ymin, zmin, xmax, ymax, zmax).
    Returns (nears, fars): [N] each.  Misses get near == far == float32 max,
    same sentinel as the reference; hits clamp near to ``min_near``.
    """
    inv_d = 1.0 / rays_d
    t0 = (aabb[:3] - rays_o) * inv_d  # [N, 3]
    t1 = (aabb[3:] - rays_o) * inv_d
    tmin = jnp.minimum(t0, t1)
    tmax = jnp.maximum(t0, t1)
    near = jnp.max(tmin, axis=-1)
    far = jnp.min(tmax, axis=-1)
    miss = near > far
    near = jnp.maximum(near, min_near)
    near = jnp.where(miss, _MISS, near)
    far = jnp.where(miss, _MISS, far)
    return near, far


def sph_from_ray(rays_o, rays_d, radius):
    """Ray / sphere(radius) far intersection -> (theta, phi) scaled to [-1, 1].

    Mirrors ``kernel_sph_from_ray``: assumes the origin is inside the sphere
    and takes the exit point.  Used by the optional background model.
    """
    # solve |o + t d|^2 = r^2 for the larger root (d need not be unit-norm)
    a = jnp.sum(rays_d * rays_d, axis=-1)
    b = 2.0 * jnp.sum(rays_o * rays_d, axis=-1)
    c = jnp.sum(rays_o * rays_o, axis=-1) - radius * radius
    disc = jnp.maximum(b * b - 4 * a * c, 0.0)
    t = (-b + jnp.sqrt(disc)) / (2 * a)
    p = rays_o + t[..., None] * rays_d
    # spherical coords scaled to [-1, 1]
    theta = jnp.arctan2(jnp.sqrt(p[..., 0] ** 2 + p[..., 1] ** 2), p[..., 2]) / jnp.pi
    phi = jnp.arctan2(p[..., 1], p[..., 0]) / jnp.pi
    return jnp.stack([2.0 * theta - 1.0, phi], axis=-1)
