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

Coarse pre-filter (round-3 perf work; the analogue of the reference's
empty-space *skip* doing useful work instead of being flattened into the
candidate grid):  the [N, T] fine occupancy gather is the step's second
largest term once sample compaction shrinks the field (67 ms at [4096, 1024]
on the relay'd v5e, and it does NOT shrink with scene convergence).  We pool
the fine grid to a dilated 64^3 coarse grid (256 KB; the gather engine is
index-rate-bound, not table-size-bound — measured 117 vs 123 M idx/s for
32 KB vs 8 MB tables — so a finer coarse grid costs nothing and halves
false-positive groups), test ONE midpoint candidate per group of 4, compact
to the first ``group_budget`` coarse-occupied groups with the same
cumsum-rank+scatter primitive, and run the fine gather + downstream
compaction only on the surviving ``group_budget * group`` candidates.  Dilation of the coarse grid
by ``ceil(group_span / coarse_cell)`` cells makes the midpoint test
conservative (a coarse miss PROVES every candidate in the group is in empty
fine cells), so the selected fine candidate set is exact; the only
approximation is the group-budget truncation, which has the same semantics
as the sample budget itself (drop the farthest).  With gamma == 0 the
candidate t-grid is closed-form, so the pre-filtered path never materialises
[N, T] anything — all per-candidate work runs at [N, group_budget * group].
"""

import functools
import math
import os

import jax
import jax.numpy as jnp

SQRT3 = 1.7320508075688772

# A/B + tuning knobs (scripts_dev/ab_step.py measures them on the chip):
# NGP_MARCH_PREFILTER in {auto, 0, 1}; NGP_MARCH_GROUP and
# NGP_MARCH_GROUP_BUDGET override the static defaults.  They are re-read from
# os.environ on every ``march_rays`` call (in the plain-Python wrapper, so a
# changed value produces a fresh jit cache entry); when march_rays is traced
# inside an enclosing ``jax.jit``, the values are frozen into that program at
# its trace time like any other static argument.


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


def coarse_occupancy(occupancy, factor):
    """Pool [C, H, H, H] bool fine occupancy to [C, H/f, H/f, H/f] by OR.

    A coarse cell is occupied iff ANY fine cell inside it is — the
    conservative direction for the pre-filter.
    """
    C, H = occupancy.shape[0], occupancy.shape[1]
    Hc = H // factor
    return (
        occupancy.reshape(C, Hc, factor, Hc, factor, Hc, factor)
        .any(axis=(2, 4, 6))
    )


def dilate_occupancy(coarse, dil):
    """OR-dilate [C, Hc, Hc, Hc] bool by ``dil`` cells per axis (max pool,
    SAME padding) so a lookup at one cell covers all cells within ``dil``."""
    if dil <= 0:
        return coarse
    k = 2 * dil + 1
    return jax.lax.reduce_window(
        coarse, False, jax.lax.bitwise_or,
        window_dimensions=(1, k, k, k),
        window_strides=(1, 1, 1, 1),
        padding="SAME",
    )


def _cells_and_levels(pos, dts, C, H, bound):
    """Grid-cell flat indices for per-axis positions ``pos`` (list of 3
    arrays), with the reference's mip-level selection when C > 1
    (``raymarching.cu:42-54,374-376``).  Returns (flat_idx, level)."""
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

    cell = [
        jnp.clip(0.5 * (p / mip_bound + 1.0) * H, 0.0, H - 1).astype(jnp.int32)
        for p in pos
    ]
    flat_idx = (cell[0] * H + cell[1]) * H + cell[2]
    if level is not None:
        flat_idx = level * (H * H * H) + flat_idx
    return flat_idx, level


def _select_first(occ, idx_vals, budget):
    """Keep the first ``budget`` True positions per ray, in order.

    Selection by cumsum-rank + ONE scatter: True position i with rank
    cumsum(occ)[i]-1 < budget goes to output slot rank; everything else lands
    in a discarded scratch slot.  Replaces a ``lax.top_k`` over [N, T] (a
    sort network: 518 ms at [4096, 1024] on v5e) with a cheap int cumsum + a
    scatter — same output, in-order and deterministic.

    Returns (sel [N, budget] values from idx_vals, n_true [N]).
    """
    N = occ.shape[0]
    rank = jnp.cumsum(occ.astype(jnp.int32), axis=-1) - 1
    dst = jnp.where(occ & (rank < budget), rank, budget)  # budget = scratch
    sel = (
        jnp.full((N, budget + 1), 0, jnp.int32)
        .at[jnp.arange(N)[:, None], dst]
        .set(jnp.broadcast_to(idx_vals, occ.shape), mode="drop")
    )[:, :budget]
    n_true = jnp.sum(occ.astype(jnp.int32), axis=-1)
    return sel, n_true


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
    prefilter=None,
    group=4,
    coarse_factor=2,
    group_budget=None,
    t_cull=0.0,
):
    """March N rays through the occupancy grid with a fixed sample budget.

    Args:
      rays_o, rays_d: [N, 3] (dirs need not be re-normalised; t is metric
        along d as in the reference).
      occupancy: [C, H, H, H] bool — or float32 from
        ``ops.grid.render_grid`` (0 = unoccupied, >0 = the maintained cell
        density, already density_scale'd), which enables ``t_cull``.
      nears, fars: [N] from ``near_far_from_aabb``.
      budget: S — static per-ray sample budget after compaction.
      n_cand: candidate-grid length; default ``num_candidates(...)``.
      perturb_key: optional PRNG key; jitters t0 by U[0,1)*dt like the
        reference's ``noises`` (``raymarching.cu:351``).
      prefilter: coarse empty-space pre-filter.  None = auto (on whenever it
        shrinks the fine gather); True/False forces.  With the pre-filter,
        ``n_occupied`` counts occupied candidates only within the first
        ``group_budget`` coarse-occupied groups (capped at
        ``group_budget * group`` — still >= 4x the sample budget by default,
        plenty of signal for the trainer's budget adaptation).
      group: candidates per coarse-tested group.
      coarse_factor: fine-to-coarse pooling factor (128 -> 64 by default;
        factor 4 doubles coarse false-positives near surfaces — measured
        10.5% sample loss at group_budget 64 vs 1% at factor 2).
      group_budget: max coarse-occupied groups kept per ray (default
        ``max(64, budget // 2)`` — the surviving candidate set is 2x the
        sample budget).
      t_cull: transmittance cull threshold (0 = off).  Requires a float
        ``render_grid``: per-candidate optical depth ``cell_density * dt``
        is accumulated along the ray (ascending t in both march paths) and
        candidates whose PROXY entering transmittance drops below ``t_cull``
        are dropped before compaction.  Rationale: ``composite_rays`` gives
        samples entering at true T < T_thresh (1e-4) weight EXACTLY zero —
        T is monotone, so every later sample is dead too and their
        gradients are exactly zero — yet the field still pays full
        forward+backward for them (measured 46% of samples on the trained
        headline scene, scripts_dev/transmittance_probe.py).  The cell
        density is a decayed-max proxy for the field (overestimates ->
        premature cull is the bias direction), so set ``t_cull`` BELOW the
        composite's T_thresh (e.g. 1e-6) to buffer it.  The reference's
        inference kernel does the same early termination with exact sigmas
        (``raymarching.cu`` composite break at T < 1e-4); the train-path
        cull has no reference analogue and must stay off on
        exactness-contract decode paths.

    Returns dict(xyzs [N,S,3], dirs [N,S,3], deltas [N,S], ts [N,S],
                 mask [N,S] bool, n_occupied [N] int32 (survivors — what the
                 budget actually packs), n_occupied_raw [N] int32 (pre-cull
                 occupied count: the budget-PROVISIONING statistic; equals
                 n_occupied when t_cull is off),
                 n_groups_occ [N] int32 — occupied COARSE groups per ray,
                 counted over ALL groups (never capped by ``group_budget``);
                 on the unfiltered path, occupied fine groups).
    """
    if t_cull > 0 and jnp.issubdtype(occupancy.dtype, jnp.bool_):
        raise ValueError(
            "t_cull > 0 needs the float density render grid "
            "(ops.grid.render_grid), not the bool occupancy field")
    H = occupancy.shape[1]
    if n_cand is None:
        n_cand = num_candidates(bound, max_steps, dt_gamma)

    env = os.environ
    group_env = env.get("NGP_MARCH_GROUP")
    if group_env:
        group = int(group_env)
    if group_budget is None:
        # budget//2 groups hold up to 2x budget fine candidates; on surface
        # scenes the measured sample loss vs the full march is ~1% of samples
        # on ~2% of rays at coarse_factor 2 (the same truncate-the-farthest
        # class as the budget itself; scripts_dev probe in PERF.md).  Small
        # budgets clamp to >= 64 groups, which n_groups-clamps to exact on
        # test-scale shapes.
        gb_env = env.get("NGP_MARCH_GROUP_BUDGET")
        group_budget = int(gb_env) if gb_env else max(64, budget // 2)
    # n_groups here must agree with _march_rays_impl's ``n_cand // group``
    # (no clamp there): requiring ``n_cand >= group`` for the prefilter keeps
    # the two in sync — a sub-group candidate grid (n_cand < group) always
    # takes the unfiltered path, never a zero-group reshape.
    n_groups = max(n_cand // group, 1)
    group_budget = min(group_budget, n_groups)
    pf_env = env.get("NGP_MARCH_PREFILTER", "auto")
    if prefilter is None and pf_env != "auto":
        prefilter = pf_env == "1"
    if prefilter is None:
        # on when it shrinks the fine-gather population and the coarse grid
        # has enough resolution to discriminate (Hc >= 16)
        prefilter = (
            n_cand % group == 0
            and group_budget * group < n_cand
            and H % coarse_factor == 0
            and H // coarse_factor >= 16
        )
    prefilter = bool(prefilter and n_cand % group == 0 and n_cand >= group
                     and H % coarse_factor == 0 and H // coarse_factor >= 2)

    return _march_rays_impl(
        rays_o, rays_d, occupancy, nears, fars,
        bound=bound, dt_gamma=dt_gamma, max_steps=max_steps, n_cand=n_cand,
        budget=budget, grid_size=grid_size, perturb_key=perturb_key,
        prefilter=prefilter, group=group, coarse_factor=coarse_factor,
        group_budget=group_budget, t_cull=float(t_cull),
    )


@functools.partial(
    jax.jit,
    static_argnames=("bound", "dt_gamma", "max_steps", "n_cand", "budget",
                     "grid_size", "prefilter", "group", "coarse_factor",
                     "group_budget", "t_cull"),
)
def _march_rays_impl(
    rays_o,
    rays_d,
    occupancy,
    nears,
    fars,
    *,
    bound,
    dt_gamma,
    max_steps,
    n_cand,
    budget,
    grid_size,
    perturb_key,
    prefilter,
    group,
    coarse_factor,
    group_budget,
    t_cull,
):
    C, H = occupancy.shape[0], occupancy.shape[1]
    assert H == grid_size
    N = rays_o.shape[0]
    n_groups = n_cand // group

    dt_min, dt_max = dt_bounds(max_steps, C, grid_size)

    t0 = nears
    if perturb_key is not None:
        noise = jax.random.uniform(perturb_key, (N,), dtype=t0.dtype)
        t0 = t0 + jnp.clip(t0 * dt_gamma, dt_min, dt_max) * noise

    def gather_occ_at(cand_idx, ts_c, dts_c):
        """Fine-grid occupancy at candidate positions. cand_idx [N, K]."""
        pos = [
            jnp.clip(
                rays_o[:, a : a + 1] + ts_c * rays_d[:, a : a + 1],
                -bound, bound,
            )
            for a in range(3)
        ]
        flat_idx, _ = _cells_and_levels(pos, dts_c, C, H, bound)
        return occupancy.reshape(-1)[flat_idx]

    n_groups_occ = None  # set per path below
    if not prefilter:
        ts, dts = _candidate_ts(t0, n_cand, dt_min, dt_max, dt_gamma)
        cand = jnp.broadcast_to(
            jnp.arange(n_cand, dtype=jnp.int32)[None, :], (N, n_cand)
        )
        cand_extra_valid = True
    else:
        Hc = H // coarse_factor
        # Conservative dilation: within one group, candidates sit at most
        # group * dt(step) of metric distance from the tested midpoint, i.e.
        # at most ceil(span * Hc / (2 * mip_bound)) coarse cells away.  The
        # worst-case mip_bound is min(1, bound): mip level 0 normally has
        # mip_bound 1, but a scene with bound < 1 shrinks it to ``bound`` and
        # the coarse cells get metrically smaller with it.  Pooling already
        # absorbs sub-cell offsets; dilation absorbs cell-boundary crossings.
        span = group * (dt_min if dt_gamma == 0 else dt_max)
        dil = max(1, int(math.ceil(span * Hc / (2.0 * min(1.0, bound)))))
        coarse = dilate_occupancy(
            coarse_occupancy(occupancy, coarse_factor), dil
        )

        mid_off = group // 2
        if dt_gamma == 0:
            ts_mid = t0[:, None] + (
                jnp.arange(n_groups, dtype=t0.dtype) * group + mid_off
            )[None, :] * dt_min
            dts_mid = jnp.full_like(ts_mid, dt_min)
            ts_first = t0[:, None] + (
                jnp.arange(n_groups, dtype=t0.dtype) * group
            )[None, :] * dt_min
        else:
            ts_all, dts_all = _candidate_ts(t0, n_cand, dt_min, dt_max, dt_gamma)
            ts_mid = ts_all[:, mid_off::group]
            dts_mid = dts_all[:, mid_off::group]
            ts_first = ts_all[:, ::group]

        pos_mid = [
            jnp.clip(
                rays_o[:, a : a + 1] + ts_mid * rays_d[:, a : a + 1],
                -bound, bound,
            )
            for a in range(3)
        ]
        if C == 1:
            mb = jnp.float32(min(1.0, bound))
            cell = [
                jnp.clip(0.5 * (p / mb + 1.0) * Hc, 0.0, Hc - 1).astype(
                    jnp.int32
                )
                for p in pos_mid
            ]
            gidx = (cell[0] * Hc + cell[1]) * Hc + cell[2]
            group_occ = coarse.reshape(-1)[gidx]
        else:
            # the per-candidate mip level can drift +-1 from the midpoint's
            # within one group (e_pos/e_dt each cross at most one log2
            # boundary over the group span) -> check all three levels, each
            # in its own normalised coords
            mx = jnp.maximum(
                jnp.abs(pos_mid[0]),
                jnp.maximum(jnp.abs(pos_mid[1]), jnp.abs(pos_mid[2])),
            )
            e_pos = jnp.floor(jnp.log2(jnp.maximum(mx, 1e-30))) + 1.0
            e_dt = jnp.floor(
                jnp.log2(jnp.maximum(dts_mid * H * 0.5, 1e-30))
            ) + 1.0
            lmid = jnp.clip(
                jnp.maximum(e_pos, e_dt), 0, C - 1
            ).astype(jnp.int32)
            flat = coarse.reshape(-1)
            group_occ = jnp.zeros(ts_mid.shape, bool)
            for dl in (-1, 0, 1):
                lv = jnp.clip(lmid + dl, 0, C - 1)
                mb = jnp.minimum(jnp.exp2(lv.astype(jnp.float32)), bound)
                cell = [
                    jnp.clip(0.5 * (p / mb + 1.0) * Hc, 0.0, Hc - 1).astype(
                        jnp.int32
                    )
                    for p in pos_mid
                ]
                gidx = lv * (Hc * Hc * Hc) + (cell[0] * Hc + cell[1]) * Hc + cell[2]
                group_occ = group_occ | flat[gidx]

        group_occ = group_occ & (ts_first < fars[:, None])
        sel_g, n_g = _select_first(
            group_occ, jnp.arange(n_groups, dtype=jnp.int32)[None, :],
            group_budget,
        )
        # n_g counts ALL coarse-occupied groups (pre group_budget
        # truncation) — the honest statistic for the group-budget
        # adaptation; a statistic read INSIDE the truncated set would
        # saturate at group_budget and bias every downstream adaptation
        # (the 038 sweep's 50.5k "win" was exactly that failure)
        n_groups_occ = n_g
        gmask = jnp.arange(group_budget, dtype=jnp.int32)[None, :] < jnp.minimum(
            n_g, group_budget
        )[:, None]
        # expand groups -> candidate indices [N, group_budget * group]
        cand = (
            sel_g[:, :, None] * group
            + jnp.arange(group, dtype=jnp.int32)[None, None, :]
        ).reshape(N, group_budget * group)
        cand_extra_valid = jnp.repeat(gmask, group, axis=-1)

        if dt_gamma == 0:
            ts = t0[:, None] + cand.astype(t0.dtype) * dt_min
            dts = jnp.full_like(ts, dt_min)
        else:
            ts = jnp.take_along_axis(ts_all, cand, axis=-1)
            dts = jnp.take_along_axis(dts_all, cand, axis=-1)

    valid = (ts < fars[:, None]) & cand_extra_valid
    vals = gather_occ_at(cand, ts, dts)  # [N, K] bool, or float render grid
    if jnp.issubdtype(vals.dtype, jnp.bool_):
        occ = vals & valid
    else:
        occ = (vals > 0) & valid

    # RAW (pre-cull) occupied count: the march-budget adaptation must
    # provision from the geometry, not from the culled survivors — a
    # 1.5x-headroom bucket over the SURVIVOR mean truncates real
    # (non-zero-weight) tail samples once the cull bites (measured: the
    # r5/03 t_cull arm's budget dropped 128 -> 64 on the survivor statistic
    # at step ~420 and train loss rose from 0.0032 to 0.0067 while the
    # exact arm held; eval -1.6 dB).
    n_occ_raw = jnp.sum(occ.astype(jnp.int32), axis=-1)

    if n_groups_occ is None:
        # unfiltered path: group statistic from the FINE pre-cull occupancy
        # (any occupied candidate in each group-of-``group``).  This
        # undercounts the coarse test (fine ⊆ dilated-coarse), but the
        # unfiltered path has no group truncation to provision for — the
        # count only keeps the returned statistic well-defined everywhere.
        pad = (-occ.shape[1]) % group
        og = occ if pad == 0 else jnp.pad(occ, ((0, 0), (0, pad)))
        n_groups_occ = jnp.sum(
            og.reshape(N, -1, group).any(-1).astype(jnp.int32), axis=-1
        )

    if t_cull > 0 and not jnp.issubdtype(vals.dtype, jnp.bool_):
        # proxy entering transmittance from the maintained cell densities
        # (candidates are ascending in t on both paths; sub-threshold cells
        # are 0 in the render grid, which UNDERestimates tau -> keeps more
        # -> conservative)
        tau = jnp.where(occ, vals * dts, 0.0)
        cum = jnp.cumsum(tau, axis=-1)
        t_in = jnp.exp(tau - cum)
        occ = occ & (t_in >= t_cull)

    # keep the first `budget` occupied candidates per ray, in order (the
    # candidate sequence is ascending in both paths: groups are selected in
    # ascending order and expanded in order)
    pos_in_row = jnp.broadcast_to(
        jnp.arange(occ.shape[1], dtype=jnp.int32)[None, :], occ.shape
    )
    sel, n_occupied = _select_first(occ, pos_in_row, budget)
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
        "n_occupied_raw": n_occ_raw,
        "n_groups_occ": n_groups_occ,
    }
