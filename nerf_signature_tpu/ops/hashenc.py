"""Multiresolution hash encoding, vectorized over levels.

Behavioural parity with the reference's pure-torch HashNeRF encoder
(``hash_encoding.py:8-111``):

  * per-level resolution ``floor(base * b**i)`` with geometric growth
    ``b = exp((ln(finest) - ln(base)) / (L - 1))``,
  * spatial hash = XOR of corner coords times primes
    ``[1, 2654435761, 805459861]`` masked to ``2**log2_hashmap_size - 1``
    (identical bit pattern to torch's wrapping int32 arithmetic, computed here
    in uint32),
  * 8-corner trilinear interpolation,
  * per-level features concatenated level-major -> ``[N, L * F]``,
  * tables initialised U(-1e-4, 1e-4).

TPU-native differences from the reference:
  * the reference keeps 16 separate ``nn.Embedding`` tables and loops over
    levels in Python; here all levels live in ONE ``[L * 2**S, F]`` array and
    the encode is a single batched gather over a ``[N, L, 8]`` index tensor —
    one XLA gather instead of 16 kernel launches,
  * the corner-weight product is computed as a ``[N, L, 8]`` tensor and the
    interpolation is one einsum (VPU-friendly), not 7 chained lerps.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Same primes as the reference (`hash_encoding.py:16`); 3 are enough for xyz.
_PRIMES = np.array([1, 2654435761, 805459861], dtype=np.uint32)

# Corner offsets in the reference's BOX_OFFSETS order (`hash_encoding.py:8`):
# corner index c = i*4 + j*2 + k for (i, j, k) in {0,1}^3.
_CORNERS = np.array(
    [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)], dtype=np.uint32
)  # [8, 3]


def level_resolutions(n_levels, base_resolution, finest_resolution):
    """Per-level grid resolutions, matching ``hash_encoding.py:60,100``.

    Returns a float64 numpy array; the reference floors
    ``base * b**i`` where b is computed in float32/torch — we floor in float64
    which agrees for all practical (base, finest, L).
    """
    if n_levels == 1:
        return np.array([float(base_resolution)])
    b = np.exp(
        (np.log(float(finest_resolution)) - np.log(float(base_resolution)))
        / (n_levels - 1)
    )
    return np.floor(base_resolution * b ** np.arange(n_levels)).astype(np.float64)


def init_hash_table(key, n_levels, n_features, log2_hashmap_size, dtype=jnp.float32):
    """One table for all levels: ``[n_levels * 2**log2_hashmap_size, F]``,
    initialised U(-1e-4, 1e-4) like ``hash_encoding.py:66``."""
    size = n_levels * (1 << log2_hashmap_size)
    return jax.random.uniform(
        key, (size, n_features), dtype=dtype, minval=-1e-4, maxval=1e-4
    )


def hash_coords(coords, log2_hashmap_size):
    """Spatial hash of integer corner coords (uint32), ref ``hash_encoding.py:11-22``.

    coords: [..., 3] uint32.  Returns uint32 indices in [0, 2**S).
    """
    coords = coords.astype(jnp.uint32)
    h = coords[..., 0] * _PRIMES[0]
    h = h ^ (coords[..., 1] * _PRIMES[1])
    h = h ^ (coords[..., 2] * _PRIMES[2])
    return h & jnp.uint32((1 << log2_hashmap_size) - 1)


@functools.partial(
    jax.jit, static_argnames=("log2_hashmap_size", "resolutions_key")
)
def _hash_encode_impl(x, table, resolutions, log2_hashmap_size, resolutions_key):
    del resolutions_key  # only used to key the jit cache on the level config
    n_levels = resolutions.shape[0]
    f = table.shape[-1]

    x = jnp.clip(x, 0.0, 1.0)  # ref clamps to the (0,1) bounding box
    # [N, L, 3] = position scaled into each level's grid
    scaled = x[:, None, :] * resolutions[None, :, None]
    floor = jnp.floor(scaled)
    w = (scaled - floor).astype(table.dtype)  # trilinear weights in [0, 1)

    corner_coords = floor.astype(jnp.uint32)[:, :, None, :] + _CORNERS[None, None]
    idx = hash_coords(corner_coords, log2_hashmap_size)  # [N, L, 8]
    # offset each level into its slice of the fused table
    level_offset = (
        jnp.arange(n_levels, dtype=jnp.uint32) << jnp.uint32(log2_hashmap_size)
    )
    idx = (idx + level_offset[None, :, None]).astype(jnp.int32)

    emb = table[idx]  # [N, L, 8, F] — one batched XLA gather

    # corner weight for (i,j,k): prod over axes of (w if bit else 1-w)
    bits = _CORNERS.astype(table.dtype)  # [8, 3]
    cw = jnp.prod(
        w[:, :, None, :] * bits[None, None] + (1.0 - w[:, :, None, :]) * (1.0 - bits[None, None]),
        axis=-1,
    )  # [N, L, 8]

    out = jnp.einsum("nlc,nlcf->nlf", cw, emb)
    return out.reshape(x.shape[0], n_levels * f)


def hash_encode(x, table, resolutions, log2_hashmap_size):
    """Encode positions x in [0, 1]^3 -> [N, L*F] features.

    x: [N, 3] float; table: [L * 2**S, F]; resolutions: numpy array [L].
    """
    res = jnp.asarray(resolutions, dtype=jnp.float32)
    return _hash_encode_impl(
        x, table, res, log2_hashmap_size, tuple(np.asarray(resolutions).tolist())
    )
