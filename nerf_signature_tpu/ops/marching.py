"""Static-budget occupancy-grid ray marching.

This is the TPU-native redesign of the reference's hottest CUDA kernels,
``kernel_march_rays_train`` / ``kernel_march_rays``
(``raymarching/src/raymarching.cu:312-490,701-815``).  The reference runs a
per-ray DDA with atomicAdd compaction into a dynamically-sized sample buffer;
that shape-dynamic, atomic design is hostile to XLA.  Key observation that
makes a static redesign *exact*, not approximate:

  The reference's empty-space skip loop advances ``t`` by the very same
  ``clamp(t * dt_gamma, dt_min, dt_max)`` recurrence as the sampling step —
  it just doesn't emit samples (``raymarching.cu:396-398,475-477``).  So the
  set of visited t-values is a fixed per-ray sequence ``t_{i+1} = t_i + dt(t_i)``
  independent of occupancy, and marching is exactly:

    1. materialise the candidate t-grid  [N, T]   (closed form when gamma==0,
       a short ``lax.scan`` otherwise),
    2. gather occupancy at each candidate            -> occ [N, T] bool,
    3. keep the first S occupied candidates per ray  -> cumsum rank + one
       scatter into [N, S] (deterministic, no atomics, no host syncs;
       replaced a ``lax.top_k`` sort network — 518 ms -> scatter at
       [4096, 1024] on v5e).

The fixed per-ray budget S plays the role of the reference's ``mean_count``
buffer heuristic (``raymarching/raymarching.py:198-216``): instead of randomly
dropping whole rays on buffer overflow, we truncate the farthest samples of
over-budget rays.  The trainer adapts S between compiles (power-of-two
buckets) from the measured mean occupied count, mirroring ``mean_count``.
"""

import functools
import math

import jax
import jax.numpy as jnp

SQRT3 = 1.7320508075688772


def dt_bounds(max_steps, cascade, grid_size):
    """(dt_min, dt_max) as in ``raymarching.cu:345-346``."""
    dt_min = 2.0 * SQRT3 / max_steps
    dt_max = 2.0 * SQRT3 * (2 ** (cascade - 1)) / grid_size
    return dt_min, dt_max


def num_candidates(bound, max_steps, dt_gamma):
    """Static candidate-grid length covering a full AABB traversal.

    With gamma==0 the grid is uniform with step dt_min, and a ray can cross at
    most ``2*bound*sqrt(3)`` of distance -> ``bound * max_steps`` candidates.
    With gamma>0 steps grow geometrically, so max_steps always suffices.
    """
    if dt_gamma > 0:
        return max_steps
    return int(math.ceil(bound)) * max_steps


def _candidate_ts(t0, n_cand, dt_min, dt_max, dt_gamma):
    """Per-ray candidate t-grid and step sizes: ts, dts [N, T]."""
    if dt_gamma == 0:
        steps = jnp.arange(n_cand, dtype=t0.dtype)
        ts = t0[:, None] + steps[None, :] * dt_min
        dts = jnp.full_like(ts, dt_min)
        return ts, dts

    def body(t, _):
        dt = jnp.clip(t * dt_gamma, dt_min, dt_max)
        return t + dt, (t, dt)

    _, (ts, dts) = jax.lax.scan(body, t0, None, length=n_cand)
    return ts.T, dts.T  # scan stacks on axis 0 -> [T, N] -> transpose


@functools.partial(
    jax.jit,
    static_argnames=("bound", "dt_gamma", "max_steps", "n_cand", "budget",
                     "grid_size"),
)
def march_rays(
    rays_o,
    rays_d,
    occupancy,
    nears,
    fars,
    *,
    bound,
    dt_gamma=0.0,
    max_steps=1024,
    n_cand=None,
    budget=128,
    grid_size=128,
    perturb_key=None,
):
    """March N rays through the occupancy grid with a fixed sample budget.

    Args:
      rays_o, rays_d: [N, 3] (dirs need not be re-normalised; t is metric
        along d as in the reference).
      occupancy: [C, H, H, H] bool.
      nears, fars: [N] from ``near_far_from_aabb``.
      budget: S — static per-ray sample budget after compaction.
      n_cand: candidate-grid length; default ``num_candidates(...)``.
      perturb_key: optional PRNG key; jitters t0 by U[0,1)*dt like the
        reference's ``noises`` (``raymarching.cu:351``).

    Returns dict(xyzs [N,S,3], dirs [N,S,3], deltas [N,S], ts [N,S],
                 mask [N,S] bool, n_occupied [N] int32).
    """
    C, H = occupancy.shape[0], occupancy.shape[1]
    assert H == grid_size
    N = rays_o.shape[0]
    if n_cand is None:
        n_cand = num_candidates(bound, max_steps, dt_gamma)

    dt_min, dt_max = dt_bounds(max_steps, C, grid_size)

    t0 = nears
    if perturb_key is not None:
        noise = jax.random.uniform(perturb_key, (N,), dtype=t0.dtype)
        t0 = t0 + jnp.clip(t0 * dt_gamma, dt_min, dt_max) * noise

    ts, dts = _candidate_ts(t0, n_cand, dt_min, dt_max, dt_gamma)  # [N, T]
    valid = ts < fars[:, None]

    # per-axis positions [N, T] (a stacked [N, T, 3] would be padded 42x by
    # TPU register tiling; see ops/hashenc.py)
    pos = [
        jnp.clip(rays_o[:, a : a + 1] + ts * rays_d[:, a : a + 1], -bound, bound)
        for a in range(3)
    ]

    if C == 1:
        level = None
        mip_bound = jnp.float32(min(1.0, bound))
    else:
        mx = jnp.maximum(jnp.abs(pos[0]),
                         jnp.maximum(jnp.abs(pos[1]), jnp.abs(pos[2])))
        e_pos = jnp.floor(jnp.log2(jnp.maximum(mx, 1e-30))) + 1.0
        e_dt = jnp.floor(jnp.log2(jnp.maximum(dts * H * 0.5, 1e-30))) + 1.0
        level = jnp.clip(jnp.maximum(e_pos, e_dt), 0, C - 1).astype(jnp.int32)
        mip_bound = jnp.minimum(jnp.exp2(level.astype(jnp.float32)), bound)

    # nearest cell, ref ``raymarching.cu:374-376``
    cell = [
        jnp.clip(0.5 * (p / mip_bound + 1.0) * H, 0.0, H - 1).astype(jnp.int32)
        for p in pos
    ]
    flat_idx = (cell[0] * H + cell[1]) * H + cell[2]
    if level is not None:
        flat_idx = level * (H * H * H) + flat_idx
    occ = occupancy.reshape(-1)[flat_idx] & valid  # [N, T] bool

    n_occupied = jnp.sum(occ.astype(jnp.int32), axis=-1)

    # keep the first `budget` occupied candidates per ray, in order.
    # Selection by cumsum-rank + ONE scatter: occupied candidate i with rank
    # cumsum(occ)[i]-1 < S goes to output slot rank; everything else lands in
    # a discarded scratch slot.  Replaces a ``lax.top_k`` over [N, T] (a sort
    # network: 518 ms at [4096, 1024] on v5e) with a cheap int cumsum + a
    # [N, T] scatter — same output, in-order and deterministic.
    steps_i = jnp.arange(n_cand, dtype=jnp.int32)
    rank = jnp.cumsum(occ.astype(jnp.int32), axis=-1) - 1  # [N, T]
    dst = jnp.where(occ & (rank < budget), rank, budget)   # budget = scratch
    sel = (
        jnp.full((N, budget + 1), 0, jnp.int32)
        .at[jnp.arange(N)[:, None], dst]
        .set(jnp.broadcast_to(steps_i[None, :], (N, n_cand)), mode="drop")
    )[:, :budget]
    mask = jnp.arange(budget, dtype=jnp.int32)[None, :] < jnp.minimum(
        n_occupied, budget
    )[:, None]

    ts_sel = jnp.take_along_axis(ts, sel, axis=-1)
    dts_sel = jnp.take_along_axis(dts, sel, axis=-1)
    xyzs = rays_o[:, None, :] + ts_sel[..., None] * rays_d[:, None, :]
    xyzs = jnp.clip(xyzs, -bound, bound)
    dirs = jnp.broadcast_to(rays_d[:, None, :], xyzs.shape)

    # keep padded slots numerically benign
    ts_sel = jnp.where(mask, ts_sel, 0.0)
    dts_sel = jnp.where(mask, dts_sel, 0.0)
    xyzs = jnp.where(mask[..., None], xyzs, 0.0)

    return {
        "xyzs": xyzs,
        "dirs": dirs,
        "deltas": dts_sel,
        "ts": ts_sel,
        "mask": mask,
        "n_occupied": n_occupied,
    }
