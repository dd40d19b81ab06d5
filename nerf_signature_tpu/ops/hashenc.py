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

TPU-native design (vs the reference's per-level Python loop of embedding
lookups):
  * all levels live in ONE ``[L * 2**S, F]`` array,
  * the hot path is laid out **sample-minor**: every large intermediate is
    ``[L, M]`` so the minor (lane) dimension is the huge sample count — a
    ``[M, L, 8, 3]`` corner tensor would be padded 16-42x by TPU (8, 128)
    register tiling (measured: 12 GB for a 768 MB logical tensor),
  * the 8 corners are a STATIC Python loop accumulating
    ``out += corner_weight * gathered_feature`` — no materialised corner
    axis at all; 8 x F gathers of ``[L, M]`` each, perfectly tiled.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Same primes as the reference (`hash_encoding.py:16`); 3 are enough for xyz.
_PRIMES = (1, 2654435761, 805459861)

# Corner offsets in the reference's BOX_OFFSETS order (`hash_encoding.py:8`):
# corner index c = i*4 + j*2 + k for (i, j, k) in {0,1}^3.
_CORNERS = [(i, j, k) for i in (0, 1) for j in (0, 1) for k in (0, 1)]


def level_resolutions(n_levels, base_resolution, finest_resolution):
    """Per-level grid resolutions, matching ``hash_encoding.py:60,100``."""
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


def level_sides(resolutions, log2_hashmap_size, dense_coarse):
    """Per-level DENSE grid side (res + 2: floor cell can be ``res`` at
    x == 1, +1 for the high corner), or 0 where the level stays hashed.

    dense_coarse=True stores coarse levels densely like tinycudann (the
    reference's pure-torch encoder hashes every level): a level is dense
    when its full grid fits in the 2**S hashed budget.  Dense rows are
    collision-free AND spatially ordered — coherent rays hit neighbouring
    rows, which the gather engine rewards (measured ~2x at 4k-row tables
    even with RANDOM indices, scripts_dev gather-size probe)."""
    sides = []
    for r in resolutions:
        side = int(r) + 2
        sides.append(side if (dense_coarse and side**3 <= (1 << log2_hashmap_size))
                     else 0)
    return tuple(sides)


def level_row_counts(sides, log2_hashmap_size):
    """Rows per level: side**3 for dense levels, 2**S for hashed ones."""
    return np.array(
        [s**3 if s else (1 << log2_hashmap_size) for s in sides], np.int64
    )


def init_hash_table_sized(key, sides, n_features, log2_hashmap_size,
                          dtype=jnp.float32):
    """Multiresolution table with per-level dense/hashed row counts:
    ``[sum(level_row_counts), F]``, init U(-1e-4, 1e-4)."""
    size = int(level_row_counts(sides, log2_hashmap_size).sum())
    return jax.random.uniform(
        key, (size, n_features), dtype=dtype, minval=-1e-4, maxval=1e-4
    )


@functools.lru_cache(maxsize=None)
def _make_gather_rows(T, F, table_dtype, gather_dtype):
    """Row gather ``table.astype(gather_dtype)[idx]`` with an asymmetric
    custom VJP.

    Measured on v5e (scripts_dev/{gather,scatter}_bench.py at the headline
    67M-element shape): the fastest FORWARD is a row gather (412 ms vs
    1358 ms for per-feature scalar gathers) and it is bandwidth-bound —
    gathering bf16 rows is another 1.5x (272 ms).  XLA's native gradient of
    a row gather is a row scatter-add (4079 ms), 3x slower than per-feature
    scalar scatter-adds (1373 ms).  This custom_vjp pairs the winning layout
    of each direction: bf16 (or compute-dtype) row-gather forward — the cast
    of the table itself is a cheap elementwise pass over 2^S*L rows — and
    fp32 per-feature scalar-scatter backward (cotangents upcast first, so
    gradient accumulation into the fp32 master table is exact)."""

    @jax.custom_vjp
    def gather_rows(table, table_g, idx):
        # table: fp32 master (grad target); table_g: the SAME table pre-cast
        # to gather_dtype ONCE by the caller (hoisted out of the corner loop)
        del table
        return table_g[idx]

    def fwd(table, table_g, idx):
        del table
        return table_g[idx], idx

    def bwd(idx, ct):
        ct = ct.astype(table_dtype)
        cols = []
        for f_ in range(F):
            acc = jnp.zeros((T,), table_dtype)
            acc = acc.at[idx].add(ct[..., f_])
            cols.append(acc)
        return jnp.stack(cols, -1), None, None

    gather_rows.defvjp(fwd, bwd)
    return gather_rows


@functools.lru_cache(maxsize=None)
def _make_interp_stochastic(T, F, table_dtype, gather_dtype, n_corners,
                            level_stride=1):
    """Exact-forward / stochastic-backward corner interpolation.

    Forward: the exact weighted sum over all corners (same numbers as the
    deterministic path).  Backward (table gradient): scatter the cotangent at
    ONE corner per (level, sample), chosen with probability equal to its
    interpolation weight — an unbiased estimator of the true gradient
    (E[ct * 1{c chosen}] = ct * cw_c) with n_corners-times fewer scatter
    updates.  The scatter is the train-step wall (PERF.md: ~49 M updates/s
    floor), so this trades gradient variance for ~n_corners x backward
    speed.  Opt-in via ``NGPConfig.stochastic_hash_grad``.

    LIMITATION: gradients w.r.t. the input POSITIONS are zero on this path
    (the VJP returns zero cotangents for the interpolation weights — exact
    position grads would need re-gathering all corners in the backward,
    defeating the point).  This framework never differentiates through
    sample positions (rays carry no parameters), but pose-refinement /
    deformation-field / analytic-normal extensions must keep
    ``stochastic_hash_grad=False``."""

    @jax.custom_vjp
    def interp(table, table_g, idxs, cws, chosen_idx, phase_bits):
        del table, chosen_idx, phase_bits
        acc = None
        for c in range(n_corners):
            g = cws[c][..., None] * table_g[idxs[c]]
            acc = g if acc is None else acc + g
        return acc

    def fwd(table, table_g, idxs, cws, chosen_idx, phase_bits):
        out = interp(table, table_g, idxs, cws, chosen_idx, phase_bits)
        return out, (chosen_idx, phase_bits, idxs, cws)

    def fzero(x):
        # cotangent conventions: float0 for integer leaves, zeros for floats
        if jnp.issubdtype(x.dtype, jnp.integer):
            return np.zeros(x.shape, jax.dtypes.float0)
        return jnp.zeros_like(x)

    def bwd(res, ct):
        chosen_idx, phase_bits, idxs, cws = res
        ct = ct.astype(table_dtype)
        L = chosen_idx.shape[0]
        if level_stride > 1 and L % level_stride == 0:
            # Level subsampling ON TOP of corner subsampling: each sample
            # scatters only every `level_stride`-th level, from a pseudo-
            # random per-sample phase, with the cotangent scaled by the
            # stride (unbiased: each level kept with probability 1/stride).
            # Selection is GATHER-FREE — static strided slices per phase,
            # blended by an elementwise per-sample select — so the entire
            # saving (the scatter is the train step's largest term, ~44%,
            # PERF.md round 3) lands.  The phase comes from remixed
            # position-hash bits (``phase_bits`` = a salted hash of the
            # sample's position bits, independent of every level's
            # corner-choice bits), which vary per sample AND per step via
            # the marcher's t0 jitter — a cell-stable source like the chosen
            # row index would deterministically starve whole cells of
            # gradient.
            slice_i = [chosen_idx[p::level_stride] for p in range(level_stride)]
            slice_c = [ct[p::level_stride] for p in range(level_stride)]
            phase = ((phase_bits * jnp.uint32(2654435761)) >> jnp.uint32(13)
                     ) % jnp.uint32(level_stride)
            i_s = slice_i[0]
            c_s = slice_c[0]
            for p in range(1, level_stride):
                keep = (phase == jnp.uint32(p))[None, :]
                i_s = jnp.where(keep, slice_i[p], i_s)
                c_s = jnp.where(keep[..., None], slice_c[p], c_s)
            c_s = c_s * jnp.asarray(level_stride, table_dtype)
            scatter_idx, scatter_ct = i_s, c_s
        else:
            scatter_idx, scatter_ct = chosen_idx, ct
        cols = []
        for f_ in range(F):
            acc = jnp.zeros((T,), table_dtype)
            acc = acc.at[scatter_idx].add(scatter_ct[..., f_])
            cols.append(acc)
        g_table = jnp.stack(cols, -1)
        return (g_table, jnp.zeros((T, F), gather_dtype),
                tuple(fzero(i) for i in idxs),
                tuple(fzero(w) for w in cws), fzero(chosen_idx),
                fzero(phase_bits))

    interp.defvjp(fwd, bwd)
    return interp


def hash_coords(coords, log2_hashmap_size):
    """Spatial hash of integer corner coords (uint32), ref ``hash_encoding.py:11-22``.

    coords: [..., 3] uint32.  Returns uint32 indices in [0, 2**S).
    (Reference-parity helper; the hot path uses ``_hash3`` on unpacked axes.)
    """
    coords = coords.astype(jnp.uint32)
    return _hash3(coords[..., 0], coords[..., 1], coords[..., 2],
                  log2_hashmap_size)


def _hash3(cx, cy, cz, log2_hashmap_size):
    h = cx * jnp.uint32(_PRIMES[0])
    h = h ^ (cy * jnp.uint32(_PRIMES[1]))
    h = h ^ (cz * jnp.uint32(_PRIMES[2]))
    return h & jnp.uint32((1 << log2_hashmap_size) - 1)


@functools.partial(
    jax.jit,
    static_argnames=("log2_hashmap_size", "resolutions_key", "gather_dtype",
                     "stochastic_grad", "shared_table", "dense_sides",
                     "level_stride", "fwd_corners"),
)
def _hash_encode_impl(x, table, resolutions, log2_hashmap_size,
                      resolutions_key, gather_dtype=None,
                      stochastic_grad=False, shared_table=False,
                      dense_sides=None, level_stride=1, fwd_corners=8):
    del resolutions_key  # keys the jit cache on the level config
    L = resolutions.shape[0]
    F = table.shape[-1]
    M = x.shape[0]

    x = jnp.clip(x, 0.0, 1.0)  # ref clamps to the (0,1) bounding box
    # unpack axes immediately: [M] each (sample-minor layouts from here on)
    axes = [x[:, a] for a in range(3)]

    # [L, M]: scaled position per level
    res = resolutions[:, None].astype(x.dtype)
    scaled = [a[None, :] * res for a in axes]
    floor = [jnp.floor(s) for s in scaled]
    w = [(s - f).astype(table.dtype) for s, f in zip(scaled, floor)]
    cell = [f.astype(jnp.uint32) for f in floor]

    if shared_table and dense_sides is not None:
        raise ValueError("shared_table and dense_sides are mutually "
                         "exclusive addressing schemes")
    if shared_table:
        # one [2**S, F] table shared by every level (codebook message encoder
        # in 'all-levels' ablation mode): no per-level offset into the rows
        level_offset = jnp.zeros((1, 1), jnp.uint32)
    elif dense_sides is not None and any(dense_sides):
        counts = level_row_counts(dense_sides, log2_hashmap_size)
        offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
        level_offset = jnp.asarray(offs.astype(np.uint32))[:, None]
    else:
        level_offset = (
            jnp.arange(L, dtype=jnp.uint32) << jnp.uint32(log2_hashmap_size)
        )[:, None]
    if dense_sides is not None and any(dense_sides):
        # dense coarse levels: collision-free row-major linear index instead
        # of the spatial hash (see ``level_sides``).  Computed for every
        # level (cheap VPU fma) and selected per level; hashed levels keep
        # the hash index.
        sides_arr = jnp.asarray(
            np.array(dense_sides, np.uint32).reshape(L, 1)
        )
        dense_mask = jnp.asarray(
            np.array([s > 0 for s in dense_sides]).reshape(L, 1)
        )
    else:
        sides_arr = None

    # static corner loop: accumulate weight * gathered feature ROW.  One row
    # gather ``table[idx] -> [L, M, F]`` per corner beats per-feature scalar
    # gathers 3.3x on v5e (scripts_dev/gather_bench.py: 412 ms vs 1358 ms at
    # the headline 67M-element shape) — the gather engine fetches both
    # features of a row in one pass, and XLA fuses the weight multiply, so
    # the [L, M, F] intermediate is never materialised in tiled form.  The
    # BACKWARD uses per-feature scalar scatters instead (see
    # ``_make_gather_rows``).
    gd = gather_dtype or table.dtype.name
    table_g = table.astype(gd) if gd != table.dtype.name else table
    table_g = jax.lax.stop_gradient(table_g)  # grads flow via the master arg

    idxs, cws = [], []
    for (di, dj, dk) in _CORNERS:
        cx = cell[0] + jnp.uint32(di)
        cy = cell[1] + jnp.uint32(dj)
        cz = cell[2] + jnp.uint32(dk)
        idx = _hash3(cx, cy, cz, log2_hashmap_size)
        if sides_arr is not None:
            idx_dense = (cx * sides_arr + cy) * sides_arr + cz
            idx = jnp.where(dense_mask, idx_dense, idx)
        idxs.append((idx + level_offset).astype(jnp.int32))
        cws.append(
            (w[0] if di else 1.0 - w[0])
            * (w[1] if dj else 1.0 - w[1])
            * (w[2] if dk else 1.0 - w[2])
        )

    if stochastic_grad:
        # one scatter target per (level, sample): corner c chosen with
        # probability cw_c.  Pseudo-random u comes from hashing the sample's
        # own position bits (positions are jittered per step by the marcher's
        # perturb), so no PRNG key threading is needed.
        pos_bits = [
            jax.lax.bitcast_convert_type(s.astype(jnp.float32), jnp.uint32)
            for s in scaled
        ]
        u_bits = _hash3(pos_bits[0], pos_bits[1], pos_bits[2], 24)
        u = u_bits.astype(table.dtype) * (1.0 / (1 << 24))
        cum = jnp.zeros((L, M), table.dtype)
        done = jnp.zeros((L, M), bool)
        chosen_idx = idxs[-1]
        for c in range(8):
            cum = cum + cws[c].astype(table.dtype)
            newly = (u < cum) & ~done
            chosen_idx = jnp.where(newly, idxs[c], chosen_idx)
            done = done | newly
        # phase bits for the (optional) backward level subsampling: a
        # DISTINCTLY-SALTED hash of the same per-sample position bits, so the
        # keep-this-level decision is decorrelated from every level's corner
        # choice (u_bits[-1] would couple it to level L-1's corner and bias
        # that level's gradient); still varies per sample and per step (t0
        # jitter)
        phase_bits = _hash3(pos_bits[0][-1] ^ jnp.uint32(0x9E3779B9),
                            pos_bits[1][-1], pos_bits[2][-1], 24)
        eff_stride = level_stride if L % max(level_stride, 1) == 0 else 1
        if fwd_corners == 1:
            # Forward corner subsampling: gather ONLY the weight-sampled
            # corner the stochastic backward already chooses.  The output is
            # a one-sample importance estimate of the trilinear sum
            # (corner c picked w.p. cw_c, estimator = cw_c * row_c / cw_c =
            # row_c — an unbiased FEATURE estimate over the position-hash
            # bits), with 8x fewer forward gather rows: the train step's
            # LARGEST engine term (~67 ms of 8-corner row gathers at headline
            # shapes, PERF.md round 3).  The VJP is the exact gradient OF THE
            # ESTIMATOR (scatter the cotangent at the chosen row).  NB the
            # LOSS gradient is NOT unbiased: the sigma/color MLPs and the
            # exponential compositing are nonlinear in the feature, so
            # E[grad L(feat_hat)] != grad L(E[feat_hat]) — measured ~1 dB
            # equal-walltime cost (PERF.md round 4), which is why this stays
            # opt-in.  Train-step only — eval paths keep the exact 8-corner
            # interpolation (see NGPConfig.hash_fwd_corners).
            interp = _make_interp_stochastic(
                table.shape[0], F, table.dtype.name, gd, 1, eff_stride,
            )
            one = jnp.ones(chosen_idx.shape, table.dtype)
            acc = interp(table, table_g, (chosen_idx,), (one,), chosen_idx,
                         phase_bits)
        else:
            interp = _make_interp_stochastic(
                table.shape[0], F, table.dtype.name, gd, 8, eff_stride,
            )
            acc = interp(table, table_g, tuple(idxs), tuple(cws), chosen_idx,
                         phase_bits)
    else:
        gather_rows = _make_gather_rows(table.shape[0], F, table.dtype.name, gd)
        acc = jnp.zeros((L, M, F), table.dtype)
        for c in range(8):
            acc = acc + cws[c][..., None] * gather_rows(table, table_g, idxs[c])

    # [L, M, F] -> [M, L, F] -> [M, L*F] (level-major like torch's concat)
    return jnp.transpose(acc, (1, 0, 2)).reshape(M, L * F)


def hash_encode(x, table, resolutions, log2_hashmap_size, gather_dtype=None,
                stochastic_grad=False, shared_table=False, dense_sides=None,
                level_stride=1, fwd_corners=8):
    """Encode positions x in [0, 1]^3 -> [N, L*F] features.

    x: [N, 3] float; table: [L * 2**S, F]; resolutions: numpy array [L].
    gather_dtype: optional dtype name the table rows are cast to before the
    gather ("bfloat16" halves gather bandwidth, 1.5x on v5e; None = exact
    table-dtype gathers).  Gradients accumulate in the table dtype either way.
    stochastic_grad: exact forward, one-corner unbiased-stochastic backward
    (8x fewer table-gradient scatter updates; see ``_make_interp_stochastic``).
    NB: position gradients are ZERO on the stochastic path — keep it off if
    you differentiate w.r.t. x.
    fwd_corners: 8 = exact trilinear forward (default); 1 = forward corner
    subsampling — gather only the weight-sampled corner (unbiased one-sample
    estimate of the interpolation, 8x fewer forward gather rows).  Requires
    stochastic_grad.  Train-step only; eval must stay at 8.
    shared_table: table is ONE [2**S, F] level-shared table instead of
    [L * 2**S, F] (message-encoder 'all-levels' ablation).
    dense_sides: optional per-level tuple from ``level_sides`` — nonzero
    entries mark DENSE levels (side**3 rows, row-major linear index); the
    table then has ``sum(level_row_counts)`` rows.
    """
    if fwd_corners not in (1, 8):
        raise ValueError("fwd_corners must be 1 or 8")
    if fwd_corners == 1 and not stochastic_grad:
        raise ValueError("fwd_corners=1 requires stochastic_grad=True (the "
                         "weight-sampled corner choice lives on that path)")
    res = jnp.asarray(resolutions, dtype=jnp.float32)
    return _hash_encode_impl(
        x, table, res, log2_hashmap_size,
        tuple(np.asarray(resolutions).tolist()), gather_dtype=gather_dtype,
        stochastic_grad=stochastic_grad, shared_table=shared_table,
        dense_sides=dense_sides, level_stride=level_stride,
        fwd_corners=fwd_corners,
    )


# ---------------------------------------------------------------------------
# 2D variant (background-sphere model: input is (theta, phi) in [-1, 1])
# ---------------------------------------------------------------------------

_CORNERS_2D = [(i, j) for i in (0, 1) for j in (0, 1)]


def _hash2(cx, cy, log2_hashmap_size):
    h = cx * jnp.uint32(_PRIMES[0])
    h = h ^ (cy * jnp.uint32(_PRIMES[1]))
    return h & jnp.uint32((1 << log2_hashmap_size) - 1)


@functools.partial(
    jax.jit,
    static_argnames=("log2_hashmap_size", "resolutions_key", "gather_dtype"),
)
def _hash_encode_2d_impl(x, table, resolutions, log2_hashmap_size,
                         resolutions_key, gather_dtype=None):
    del resolutions_key
    L = resolutions.shape[0]
    F = table.shape[-1]
    M = x.shape[0]

    x = jnp.clip(x, 0.0, 1.0)
    axes = [x[:, a] for a in range(2)]
    res = resolutions[:, None].astype(x.dtype)
    scaled = [a[None, :] * res for a in axes]
    floor = [jnp.floor(s) for s in scaled]
    w = [(s - f).astype(table.dtype) for s, f in zip(scaled, floor)]
    cell = [f.astype(jnp.uint32) for f in floor]

    level_offset = (
        jnp.arange(L, dtype=jnp.uint32) << jnp.uint32(log2_hashmap_size)
    )[:, None]

    gd = gather_dtype or table.dtype.name
    gather_rows = _make_gather_rows(table.shape[0], F, table.dtype.name, gd)
    table_g = table.astype(gd) if gd != table.dtype.name else table
    table_g = jax.lax.stop_gradient(table_g)
    acc = jnp.zeros((L, M, F), table.dtype)
    for (di, dj) in _CORNERS_2D:
        idx = _hash2(
            cell[0] + jnp.uint32(di), cell[1] + jnp.uint32(dj),
            log2_hashmap_size,
        )
        idx = (idx + level_offset).astype(jnp.int32)
        cw = (w[0] if di else 1.0 - w[0]) * (w[1] if dj else 1.0 - w[1])
        acc = acc + cw[..., None] * gather_rows(table, table_g, idx)

    return jnp.transpose(acc, (1, 0, 2)).reshape(M, L * F)


def hash_encode_2d(x, table, resolutions, log2_hashmap_size,
                   gather_dtype=None):
    """Encode 2D coords x in [0, 1]^2 -> [N, L*F] features (same hash family
    as the 3D encoder, 4-corner bilinear interpolation)."""
    res = jnp.asarray(resolutions, dtype=jnp.float32)
    return _hash_encode_2d_impl(
        x, table, res, log2_hashmap_size,
        tuple(np.asarray(resolutions).tolist()), gather_dtype=gather_dtype,
    )
