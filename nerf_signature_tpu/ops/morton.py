"""Morton (Z-order) 3-D encode/decode as pure jnp bit ops.

API-parity equivalents of the reference's CUDA ``kernel_morton3D`` /
``kernel_morton3D_invert`` (``raymarching/src/raymarching.cu:56-81,214-260``).

Note: the TPU occupancy grid in this framework uses PLAIN row-major cell
indexing — Morton order is a GPU cache-line trick with no benefit for XLA
gathers — but these ops are kept (a) for torch-ngp checkpoint ingestion, where
``density_grid`` is stored Morton-ordered, and (b) for API completeness.
"""

import jax.numpy as jnp


def _expand_bits(v):
    # bit-interleave expansion, identical to raymarching.cu:56-63
    v = v.astype(jnp.uint32)
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton3d(coords):
    """coords: [..., 3] int in [0, 1024). Returns [...] uint32 Morton codes."""
    x = _expand_bits(coords[..., 0])
    y = _expand_bits(coords[..., 1])
    z = _expand_bits(coords[..., 2])
    return x | (y << jnp.uint32(1)) | (z << jnp.uint32(2))


def _compact_bits(x):
    x = x.astype(jnp.uint32) & jnp.uint32(0x49249249)
    x = (x | (x >> jnp.uint32(2))) & jnp.uint32(0xC30C30C3)
    x = (x | (x >> jnp.uint32(4))) & jnp.uint32(0x0F00F00F)
    x = (x | (x >> jnp.uint32(8))) & jnp.uint32(0xFF0000FF)
    x = (x | (x >> jnp.uint32(16))) & jnp.uint32(0x0000FFFF)
    return x


def morton3d_invert(codes):
    """codes: [...] uint32. Returns [..., 3] uint32 coords."""
    codes = codes.astype(jnp.uint32)
    x = _compact_bits(codes)
    y = _compact_bits(codes >> jnp.uint32(1))
    z = _compact_bits(codes >> jnp.uint32(2))
    return jnp.stack([x, y, z], axis=-1)
