"""Transmittance cull (``t_cull``): exactness contracts and bias bounds.

The cull drops samples whose PROXY entering transmittance — accumulated
from the occupancy grid's maintained cell densities along the candidate
sequence — falls below ``t_cull``.  Samples entering at TRUE T < T_thresh
carry weight exactly zero in ``composite_rays`` (T is monotone, so the
whole suffix is dead and its gradients are exactly zero), so with the proxy
equal to the true density and ``t_cull <= T_thresh`` the cull changes the
rendered image not at all; these tests pin that, the float-grid == bool
-grid no-cull identity, the prefix-subset property of the culled sample
selection, and the exactness-path guard (bool grid + t_cull raises).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_signature_tpu.ops.grid import OccupancyGrid, render_grid
from nerf_signature_tpu.ops.intersect import near_far_from_aabb
from nerf_signature_tpu.ops.marching import march_rays
from nerf_signature_tpu.render.renderer import RenderConfig, render_rays_occ


def _rand_rays(rng, n, bound):
    o = rng.normal(size=(n, 3))
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * (bound * 2.0)
    target = rng.uniform(-bound * 0.5, bound * 0.5, size=(n, 3))
    d = target - o
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


def _ball_grid(H=64, density=100.0, bound=1.0):
    """OccupancyGrid with a centred dense ball (C == 1)."""
    ax = (np.arange(H) + 0.5) / H * 2.0 - 1.0
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    inside = (X * X + Y * Y + Z * Z) < 0.45**2
    dens = np.where(inside, density, 0.0).astype(np.float32)
    return OccupancyGrid(
        density=jnp.asarray(dens.reshape(1, -1)),
        occupancy=jnp.asarray(inside[None]),
        mean_density=jnp.float32(dens.mean()),
        iter_density=jnp.int32(16),
    )


def _march(grid_arr, o, d, bound, **kw):
    aabb = jnp.array([-bound] * 3 + [bound] * 3, jnp.float32)
    nears, fars = near_far_from_aabb(o, d, aabb, 0.05)
    return march_rays(o, d, grid_arr, nears, fars, bound=bound,
                      grid_size=grid_arr.shape[1], **kw)


def test_render_grid_dtypes():
    g = _ball_grid()
    assert render_grid(g, 0.0) is g.occupancy
    f = render_grid(g, 1e-6)
    assert f.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(f > 0), np.asarray(g.occupancy))
    occ = np.asarray(g.occupancy)
    np.testing.assert_allclose(
        np.asarray(f)[occ],
        np.asarray(g.density).reshape(occ.shape)[occ],
    )


def test_bool_grid_with_t_cull_raises():
    g = _ball_grid()
    o, d = _rand_rays(np.random.default_rng(0), 4, 1.0)
    with pytest.raises(ValueError):
        _march(g.occupancy, o, d, 1.0, t_cull=1e-6)


@pytest.mark.parametrize("prefilter", [False, None])
def test_float_grid_no_cull_matches_bool(prefilter):
    """t_cull == 0 on the float render grid selects identically to bool."""
    g = _ball_grid(density=3.0)
    o, d = _rand_rays(np.random.default_rng(1), 32, 1.0)
    kw = dict(max_steps=256, budget=64, prefilter=prefilter)
    a = _march(g.occupancy, o, d, 1.0, **kw)
    b = _march(render_grid(g, 1e-6), o, d, 1.0, t_cull=0.0, **kw)
    for k in ("mask", "ts", "deltas", "n_occupied"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


@pytest.mark.parametrize("prefilter", [False, None])
def test_cull_is_prefix_of_uncull_and_thresholded(prefilter):
    """Culled selection == the uncull selection filtered by proxy T.

    Budget is large enough that neither march truncates, so the uncull
    selection is ALL occupied candidates and the proxy transmittance can be
    recomputed from its output alone.
    """
    g = _ball_grid(H=64, density=200.0)  # tau ~2.7/step: saturates fast
    o, d = _rand_rays(np.random.default_rng(2), 24, 1.0)
    t_cull = 1e-6
    kw = dict(max_steps=256, budget=256, prefilter=prefilter)
    full = _march(render_grid(g, t_cull), o, d, 1.0, t_cull=0.0, **kw)
    cull = _march(render_grid(g, t_cull), o, d, 1.0, t_cull=t_cull, **kw)

    fm = np.asarray(full["mask"])
    assert fm.sum(1).max() < 256, "budget must not truncate for this test"
    # proxy entering T from the full selection (density is constant inside
    # the ball, so cell lookup == the grid value at each selected sample)
    tau = np.where(fm, 200.0 * np.asarray(full["deltas"]), 0.0)
    t_in = np.exp(tau - np.cumsum(tau, axis=1))
    keep = fm & (t_in >= t_cull)

    cm = np.asarray(cull["mask"])
    assert cm.sum() == keep.sum()
    assert cm.sum() < fm.sum(), "the dense ball must actually cull"
    # kept samples are the same t values, packed to the front per ray
    for i in range(fm.shape[0]):
        np.testing.assert_allclose(
            np.asarray(cull["ts"])[i, cm[i]],
            np.asarray(full["ts"])[i, keep[i]],
            rtol=0, atol=0,
        )
    np.testing.assert_array_equal(
        np.asarray(cull["n_occupied"]), keep.sum(1).astype(np.int32)
    )


def test_cull_render_matches_exact_when_proxy_is_true_density():
    """End-to-end: with the field density equal to the grid density and
    t_cull <= composite T_thresh, the culled render equals the exact one —
    the culled samples all had weight exactly zero."""
    density = 200.0
    g = _ball_grid(H=64, density=density)
    occ_np = np.asarray(g.occupancy)[0]
    H = occ_np.shape[0]

    def field(x, d):
        # piecewise-constant field that matches the grid cells exactly
        idx = jnp.clip(((x + 1.0) * 0.5 * H).astype(jnp.int32), 0, H - 1)
        flat = idx[:, 0] * H * H + idx[:, 1] * H + idx[:, 2]
        inside = jnp.asarray(occ_np.reshape(-1))[flat]
        sigma = jnp.where(inside, density, 0.0)
        rgb = jnp.broadcast_to(
            jnp.array([0.8, 0.2, 0.1], jnp.float32), (x.shape[0], 3)
        )
        return sigma, rgb

    o, d = _rand_rays(np.random.default_rng(3), 32, 1.0)
    rc = RenderConfig(bound=1.0, grid_size=64, max_steps=256, min_near=0.05)
    exact = render_rays_occ(field, g.occupancy, o, d, rc, budget=256)
    rc_cull = dataclasses.replace(rc, t_cull=1e-6)
    culled = render_rays_occ(
        field, render_grid(g, 1e-6), o, d, rc_cull, budget=256
    )
    np.testing.assert_allclose(
        np.asarray(exact["image"]), np.asarray(culled["image"]),
        rtol=0, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(exact["weights_sum"]), np.asarray(culled["weights_sum"]),
        rtol=0, atol=1e-5,
    )
    # and the cull actually removed work
    assert (np.asarray(culled["n_occupied"]).sum()
            < np.asarray(exact["n_occupied"]).sum())


def test_low_optical_depth_scene_never_culls():
    """A thin scene never reaches the cull threshold: byte-identical render."""
    g = _ball_grid(H=64, density=0.05)
    o, d = _rand_rays(np.random.default_rng(4), 16, 1.0)
    kw = dict(max_steps=256, budget=128)
    a = _march(render_grid(g, 1e-6), o, d, 1.0, t_cull=0.0, **kw)
    b = _march(render_grid(g, 1e-6), o, d, 1.0, t_cull=1e-6, **kw)
    for k in ("mask", "ts", "deltas", "n_occupied"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


# ---- provisioning statistics + the fog gate (round 5) ----------------------
# The r5/03 matched-step A/B measured t_cull 1e-6 from scratch at -1.6 dB:
# the budget adaptation, fed the culled SURVIVOR count, lowered the march
# budget a bucket below where the exact arm settles and truncated real tail
# samples (train loss rose 0.0032 -> 0.0067 after the move).  Provisioning
# must follow geometry (the RAW pre-cull count); the cull only creates
# padding for compaction to squeeze.  The fog gate additionally keeps the
# cull off while the grid's full-update phase lags the fast-falling field.


def test_raw_count_is_precull_and_survivors_are_culled():
    g = _ball_grid(density=300.0)
    rng = np.random.default_rng(7)
    o, d = _rand_rays(rng, 128, 1.0)
    kw = dict(max_steps=256, budget=64)
    exact = _march(render_grid(g, 1e-3), o, d, 1.0, t_cull=0.0, **kw)
    cull = _march(render_grid(g, 1e-3), o, d, 1.0, t_cull=1e-3, **kw)
    # raw provisioning statistic is cull-invariant
    np.testing.assert_array_equal(np.asarray(cull["n_occupied_raw"]),
                                  np.asarray(exact["n_occupied_raw"]))
    np.testing.assert_array_equal(np.asarray(exact["n_occupied"]),
                                  np.asarray(exact["n_occupied_raw"]))
    # the cull actually bit somewhere, and survivors never exceed raw
    surv = np.asarray(cull["n_occupied"])
    raw = np.asarray(cull["n_occupied_raw"])
    assert (surv <= raw).all() and (surv < raw).any()


def test_trainer_fog_gate_disables_cull_until_grid_converges():
    import types

    from nerf_signature_tpu.train.trainer import Trainer

    t = Trainer.__new__(Trainer)
    rc = RenderConfig(bound=1.0, t_cull=1e-5)
    t.model = types.SimpleNamespace(
        rc=rc, occ=types.SimpleNamespace(iter_density=3))
    assert t._rc_train().t_cull == 0.0
    t.model.occ = types.SimpleNamespace(iter_density=16)
    assert t._rc_train().t_cull == 1e-5
    # no cull configured: rc passes through untouched (no replace cost)
    t.model.rc = RenderConfig(bound=1.0, t_cull=0.0)
    t.model.occ = types.SimpleNamespace(iter_density=0)
    assert t._rc_train() is t.model.rc


def test_cli_default_is_exact():
    """Pin the product default: ``--t_cull 0`` (EXACT).  The r5 1e-5
    default lasted one campaign: the 600-it quality gate passed (+0.01 dB)
    but the 1200-it draw-C run regressed ~8 dB when the decayed-max proxy
    latched a transient trunc-exp density spike (PERF.md r5 post-mortem).
    The cull stays opt-in until a long-horizon gate revalidates it on the
    live-density proxy.  A silent default drift would invalidate every
    BENCH_r0N-vs-default comparison, so the value is asserted, not assumed.
    """
    import argparse

    from nerf_signature_tpu.utils.config import add_common_args

    parser = argparse.ArgumentParser()
    add_common_args(parser)
    opt = parser.parse_args(["data"])
    assert opt.t_cull == 0.0
    assert opt.group_budget == -1 and opt.compact_frac == -1


def test_stale_spike_in_decayed_max_does_not_poison_live_proxy():
    """Regression for the r5 draw-C failure: a transient density spike
    sticks in the decayed-max ``density`` (0.95-decay needs ~760 updates to
    recover e^54 -> e^15) and, under the OLD proxy, collapsed the proxy
    transmittance behind one stale cell — culling real samples for hundreds
    of steps (mean_occ 30 -> 8/ray, eval -8 dB).  The proxy now reads
    ``density_live`` (most-recent requery, no max): after one maintenance
    update at the recovered field, the march must keep the samples behind
    the spiked cell."""
    import jax.numpy as jnp

    from nerf_signature_tpu.ops.grid import (
        init_occupancy_grid, update_occupancy_grid,
    )

    H, bound = 32, 1.0
    # cell index layout is ((x*H)+y)*H+z; the slab below occupies x-cells
    # ~6-9 at the centre row — spike the slab-ENTRY cell (first occupied
    # cell the +x ray meets), the worst case for behind-the-spike culling
    spike_cell = ((6 * H) + H // 2) * H + H // 2

    # moderate true field: a thin occupied slab at x ~ -0.5 (cell H//4)
    def density_fn(x):
        return jnp.where(jnp.abs(x[:, 0] + 0.5) < 0.1, 2.0, 0.0)

    g = init_occupancy_grid(bound, H)
    key = jax.random.PRNGKey(0)
    for i in range(3):
        g = update_occupancy_grid(
            g, jax.random.fold_in(key, i), density_fn, bound=bound,
            grid_size=H, density_thresh=0.01, full=True)
    # inject the stale spike into the decayed-max only (the live array has
    # the recovered value from the updates above)
    g = g._replace(density=g.density.at[0, spike_cell].set(float(np.exp(54))))

    o = jnp.asarray([[-1.0, 0.0, 0.0]], jnp.float32)
    d = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    out = _march(render_grid(g, 1e-5), o, d, bound, t_cull=1e-5,
                 prefilter=False)
    n_live = int(np.asarray(out["n_occupied"])[0])
    n_raw = int(np.asarray(out["n_occupied_raw"])[0])
    # the slab is ~0.2 world units thick; sigma*dt through it stays far
    # above exp(-tau) = 1e-5 total, so NOTHING may be culled
    assert n_raw > 0
    assert n_live == n_raw, (n_live, n_raw)

    # control: the OLD behavior (density_live == decayed-max with the
    # spike) reproduces the failure — everything behind the spike culled
    g_old = g._replace(density_live=g.density)
    out_old = _march(render_grid(g_old, 1e-5), o, d, bound, t_cull=1e-5,
                     prefilter=False)
    assert int(np.asarray(out_old["n_occupied"])[0]) < n_raw
