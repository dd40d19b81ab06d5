"""Cascaded occupancy (density) grid: state + maintenance.

TPU-native equivalent of the reference's occupancy-grid machinery:
``NeRFRenderer.update_extra_state`` / ``mark_untrained_grid``
(``nerf/renderer.py:379-538``) plus the CUDA ``kernel_packbits``
(``raymarching/src/raymarching.cu:268-300``).

Differences by design:
  * cells are indexed ROW-MAJOR ``(x*H + y)*H + z`` instead of Morton order —
    Morton is a GPU cache-line trick; XLA gathers don't care.  Morton ops are
    still available in ``ops.morton`` for torch-ngp checkpoint ingestion.
  * occupancy is stored as a bool ``[C, H, H, H]`` array (the natural gather
    layout for the marcher) rather than a packed uint8 bitfield; ``packbits``
    is provided for compact checkpoints / parity.
  * the reference's partial update gathers "random occupied cells" through a
    dynamic-shape ``nonzero``; here occupied cells are resampled with a fixed
    count via ``jax.random.categorical`` over ``log(grid > 0)`` — static
    shapes, same distribution (uniform over occupied cells, with replacement).
  * the whole update (query -> scatter -> EMA -> threshold) is one jitted
    program; ``mean_density`` stays on-device (the reference syncs it to host
    every update, ``nerf/renderer.py:524``).
"""

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp


class OccupancyGrid(NamedTuple):
    """Pytree state; analog of the reference's density_grid/bitfield buffers."""

    density: jnp.ndarray     # [C, H**3] float32, -1 marks untrained cells
    occupancy: jnp.ndarray   # [C, H, H, H] bool
    mean_density: jnp.ndarray  # scalar float32
    iter_density: jnp.ndarray  # scalar int32 (# updates so far)
    # Most-recent requeried cell density (NO max-EMA), for the t_cull proxy
    # ONLY — thresholding/occupancy stay on the reference's decayed-max
    # ``density``.  Why a second array: the decayed-max is conservative in
    # the KEEP direction for occupancy, but for transmittance culling it is
    # conservative in the WRONG direction — a transient density spike (the
    # forward ``trunc_exp`` is reference-parity UNclamped, so a sigma_raw
    # excursion of 54 writes e^54) sticks in the max for ~log-magnitude/
    # log(1/decay) updates and poisons the proxy T to ~0 behind that cell,
    # culling real samples for hundreds of steps.  Measured: the r5 draw-C
    # campaign (seed 33, t_cull 1e-5, 1200 it) hit grid max e^23 @step 800,
    # e^54 @1200, mean_occ collapsed 30 -> 8/ray and eval lost ~8 dB, while
    # params stayed finite and healthy (PERF.md r5 post-mortem).  The live
    # value is at most one partial-update stale for occupied cells (the
    # occupied-resample quarter requeries them), which the t_cull buffer
    # decade absorbs.  Old checkpoints restore without this field (init
    # zeros -> proxy culls nothing until the first update refreshes it).
    density_live: jnp.ndarray = None  # [C, H**3] float32


def num_cascades(bound):
    """1 + ceil(log2(bound)), ref ``nerf/renderer.py:73``."""
    return 1 + max(0, math.ceil(math.log2(bound)))


def render_grid(grid: OccupancyGrid, t_cull=0.0):
    """The grid array to hand ``march_rays`` for a render/train step.

    With ``t_cull == 0`` (default): the bool occupancy field, the exact
    reference-parity selection.  With ``t_cull > 0``: a float32 grid that is
    0 on unoccupied cells and the LIVE (most-recent requeried,
    density_scale'd) cell density on occupied ones — ``march_rays`` derives
    the SAME occupancy test from it (occupied cells have density > thresh
    >= 0, and ``mark_untrained_grid`` zeros flow through the occupancy
    mask) and additionally accumulates it into the proxy transmittance that
    drives the t_cull sample drop.  Same gather index count either way.

    The proxy density is ``density_live``, NOT the decayed-max ``density``:
    the max-EMA retains transient forward-``trunc_exp`` spikes (e^23..e^54
    measured on the r5 draw-C run) for hundreds of updates and collapses
    the proxy transmittance behind one stale cell — see the
    ``OccupancyGrid.density_live`` note and the PERF.md r5 post-mortem.
    Grids restored from pre-r5 checkpoints have ``density_live`` zeros
    until their first maintenance update: the proxy then culls nothing
    (conservative), never wrongly.  A grid constructed DIRECTLY without
    ``density_live`` (hand-built fixtures) falls back to ``density`` — the
    two are interchangeable when no max-EMA history exists.
    """
    if not t_cull > 0:
        return grid.occupancy
    C = grid.density.shape[0]
    H = grid.occupancy.shape[1]
    src = (grid.density_live if grid.density_live is not None
           else grid.density)
    return jnp.where(
        grid.occupancy,
        jnp.maximum(src.reshape(C, H, H, H), 0.0),
        0.0,
    ).astype(jnp.float32)


def init_occupancy_grid(bound, grid_size=128):
    C = num_cascades(bound)
    H = grid_size
    return OccupancyGrid(
        density=jnp.zeros((C, H**3), dtype=jnp.float32),
        occupancy=jnp.zeros((C, H, H, H), dtype=bool),
        mean_density=jnp.zeros((), jnp.float32),
        iter_density=jnp.zeros((), jnp.int32),
        density_live=jnp.zeros((C, H**3), dtype=jnp.float32),
    )


def _cell_world_coords(coords, cas_bound, grid_size, key=None):
    """Grid cell -> jittered world position, ref ``nerf/renderer.py:470-479``."""
    xyzs = 2.0 * coords.astype(jnp.float32) / (grid_size - 1) - 1.0  # [-1, 1]
    half = cas_bound / grid_size
    cas_xyzs = xyzs * (cas_bound - half)
    if key is not None:
        noise = jax.random.uniform(key, cas_xyzs.shape, minval=-1.0, maxval=1.0)
        cas_xyzs = cas_xyzs + noise * half
    return cas_xyzs


def _linear_coords(grid_size):
    """All H^3 cell coords in row-major order, [H^3, 3] int32."""
    r = jnp.arange(grid_size, dtype=jnp.int32)
    x, y, z = jnp.meshgrid(r, r, r, indexing="ij")
    return jnp.stack([x.ravel(), y.ravel(), z.ravel()], axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "density_fn", "bound", "grid_size", "density_scale", "density_thresh",
        "decay", "full",
    ),
)
def update_occupancy_grid(
    grid: OccupancyGrid,
    key,
    density_fn,
    *,
    bound,
    grid_size=128,
    density_scale=1.0,
    density_thresh=0.01,
    decay=0.95,
    full=True,
):
    """One maintenance step: re-query densities, EMA, re-threshold.

    ``density_fn(x)`` maps [M, 3] world positions (in [-bound, bound]) to
    [M] raw sigmas.  ``full=True`` queries every cell (the reference does this
    for the first 16 updates); ``full=False`` queries H^3/4 random + H^3/4
    occupied-resampled cells per cascade (ref ``nerf/renderer.py:488-514``).
    """
    C = grid.density.shape[0]
    H = grid_size
    tmp = -jnp.ones_like(grid.density)

    for cas in range(C):
        cas_bound = min(2**cas, bound)
        key, knoise, kcoord, kocc = jax.random.split(key, 4)
        if full:
            coords = _linear_coords(H)
            indices = (coords[:, 0] * H + coords[:, 1]) * H + coords[:, 2]
        else:
            n = H**3 // 4
            rand_coords = jax.random.randint(kcoord, (n, 3), 0, H, dtype=jnp.int32)
            rand_idx = (rand_coords[:, 0] * H + rand_coords[:, 1]) * H + rand_coords[:, 2]
            # resample occupied cells uniformly-with-replacement (static
            # shape) by inverse-CDF: cumsum over the occupancy mask +
            # searchsorted.  NOT jax.random.categorical — its Gumbel-max
            # broadcasts to an [n, H^3] intermediate (~1e12 ops at H=128,
            # n=H^3/4), which made every 16th training step ~7x slower.
            occ_mask = (grid.density[cas] > 0).astype(jnp.float32)
            # guard: if nothing occupied yet, fall back to uniform
            any_occ = jnp.any(occ_mask > 0)
            weights = jnp.where(any_occ, occ_mask, jnp.ones_like(occ_mask))
            cdf = jnp.cumsum(weights)
            u = jax.random.uniform(kocc, (n,)) * cdf[-1]
            occ_idx = jnp.clip(
                jnp.searchsorted(cdf, u), 0, H**3 - 1
            ).astype(jnp.int32)
            occ_coords = jnp.stack(
                [occ_idx // (H * H), (occ_idx // H) % H, occ_idx % H], axis=-1
            )
            coords = jnp.concatenate([rand_coords, occ_coords], axis=0)
            indices = jnp.concatenate([rand_idx, occ_idx], axis=0)

        xyzs = _cell_world_coords(coords, cas_bound, H, knoise)
        sigmas = density_fn(xyzs).reshape(-1) * density_scale
        tmp = tmp.at[cas, indices].set(sigmas.astype(tmp.dtype))

    # EMA: only cells that are trained (>=0) and were re-queried update
    valid = (grid.density >= 0) & (tmp >= 0)
    density = jnp.where(valid, jnp.maximum(grid.density * decay, tmp), grid.density)
    mean_density = jnp.mean(jnp.clip(density, 0.0, None))

    # live value: requeried cells take the fresh query VERBATIM (no max —
    # see the density_live field note); others keep their last reading
    live_prev = (grid.density_live if grid.density_live is not None
                 else jnp.zeros_like(grid.density))
    density_live = jnp.where(valid, tmp, live_prev)

    thresh = jnp.minimum(mean_density, density_thresh)
    occupancy = (density > thresh).reshape(C, H, H, H)
    return OccupancyGrid(
        density=density,
        occupancy=occupancy,
        mean_density=mean_density,
        iter_density=grid.iter_density + 1,
        density_live=density_live,
    )


@functools.partial(jax.jit, static_argnames=("bound", "grid_size", "chunk"))
def mark_untrained_grid(grid: OccupancyGrid, poses, intrinsics, *, bound,
                        grid_size=128, chunk=16):
    """Mark cells seen by no training camera as -1 (never occupied).

    Ref ``nerf/renderer.py:379-442``: per-cascade frustum test of every cell
    centre against every camera; poses are cam2world [B, 4, 4], intrinsics
    (fx, fy, cx, cy).
    """
    C = grid.density.shape[0]
    H = grid_size
    fx, fy, cx, cy = intrinsics
    coords = _linear_coords(H)
    world = 2.0 * coords.astype(jnp.float32) / (H - 1) - 1.0  # [H^3, 3]

    B = poses.shape[0]
    pad = (-B) % chunk
    poses_p = jnp.concatenate([poses, jnp.tile(poses[:1], (pad, 1, 1))], axis=0) if pad else poses
    pose_valid = jnp.arange(B + pad) < B

    count = jnp.zeros((C, H**3), dtype=jnp.int32)
    for cas in range(C):
        cas_bound = min(2**cas, bound)
        half = cas_bound / H
        pts = world * (cas_bound - half)  # [H^3, 3]

        def body(carry, inp):
            pose_c, valid_c = inp  # [chunk, 4, 4], [chunk]
            cam = pts[None] - pose_c[:, None, :3, 3]       # [chunk, H^3, 3]
            cam = jnp.einsum("bnj,bjk->bnk", cam, pose_c[:, :3, :3])
            mz = cam[..., 2] > 0
            mx = jnp.abs(cam[..., 0]) < cx / fx * cam[..., 2] + half * 2
            my = jnp.abs(cam[..., 1]) < cy / fy * cam[..., 2] + half * 2
            m = (mz & mx & my) & valid_c[:, None]
            return carry + jnp.sum(m.astype(jnp.int32), axis=0), None

        cnt, _ = jax.lax.scan(
            body,
            jnp.zeros((H**3,), jnp.int32),
            (poses_p.reshape(-1, chunk, 4, 4), pose_valid.reshape(-1, chunk)),
        )
        count = count.at[cas].set(cnt)

    density = jnp.where(count == 0, -1.0, grid.density)
    return grid._replace(density=density)


def packbits(occupancy_flat):
    """Pack a flat bool array (len divisible by 8) into uint8, LSB-first —
    same bit order as ``kernel_packbits`` (``raymarching.cu:268-300``)."""
    bits = occupancy_flat.reshape(-1, 8).astype(jnp.uint8)
    shifts = jnp.arange(8, dtype=jnp.uint8)
    return jnp.sum(bits << shifts, axis=-1).astype(jnp.uint8)
