"""March-budget adaptation must be target-seeking and path-independent.

The round-2 rule (raise at p95 > b, lower only at p95 < b/4) was
path-dependent: the pre-prune fog phase drives p95 past 600 and the budget
to 1024, and a converged p95 of ~250 then parks it at 512 — 4x the per-step
cost of the 256 bucket the same scene settles to when approached from
below.  The round-3 rule targets the smallest power of two >= 1.5 * mean (the
reference's own mean_count statistic with headroom) and moves one bucket
per 2 consecutive agreeing checks, both directions.
"""

import types

import numpy as np

from nerf_signature_tpu.train.trainer import Trainer


def _trainer_stub(budget, max_steps=1024):
    t = Trainer.__new__(Trainer)
    t.model = types.SimpleNamespace(train_budget=budget)
    t.opt = types.SimpleNamespace(max_steps=max_steps)
    t._budget_hysteresis = 0
    t.log = lambda *a, **k: None
    return t


def _feed(t, p95, times=1):
    for _ in range(times):
        t._adapt_budget(np.full((64,), p95, np.float32))


def test_fog_spike_then_converged_settles_back():
    t = _trainer_stub(128)
    _feed(t, 700.0, times=2)          # fog phase (mean 700 -> target 1024+)
    assert t.model.train_budget == 256
    _feed(t, 700.0, times=4)
    assert t.model.train_budget == 1024
    _feed(t, 55.0, times=8)           # converged multiobj: mean 55 -> 128
    assert t.model.train_budget == 128
    _feed(t, 55.0, times=8)           # stable — no oscillation
    assert t.model.train_budget == 128


def test_hysteresis_damps_oscillation():
    t = _trainer_stub(256)
    # alternating readings straddling the bucket: never 2 consecutive
    for _ in range(6):
        _feed(t, 300.0)               # target 512 (+1)
        _feed(t, 160.0)               # target 256 (0 -> resets)
    assert t.model.train_budget == 256


def test_bounds():
    t = _trainer_stub(1024, max_steps=1024)
    _feed(t, 5000.0, times=4)
    assert t.model.train_budget == 1024  # capped at max_steps
    t = _trainer_stub(32)
    _feed(t, 1.0, times=4)
    assert t.model.train_budget == 32    # floor


def test_raise_from_default_to_saturating_scene():
    # the LLFF case: budget 128, converged MEAN ~273 -> settle at 512
    t = _trainer_stub(128)
    _feed(t, 273.0, times=4)
    assert t.model.train_budget == 512
    _feed(t, 273.0, times=8)
    assert t.model.train_budget == 512


# ---- compaction adaptation: recompile-churn control (round 5) -------------
# Each compaction/budget move recompiles the step (~100 s through the
# remote-compile relay); the r5/03 log measured 12 recompiles in 240 steps
# under the plain 1/16-grid rule during the early-training occupancy
# descent.  Two rules bound the churn: a 2/16 dead-band on LOWERS (lowering
# only buys speed; raises keep full resolution — they protect against
# truncation), and a budget move re-fits compaction IMMEDIATELY (fill is
# relative to the budget, so every budget move otherwise triggers a second
# recompile at the next check).

import dataclasses


def _ctrainer_stub(budget, frac):
    from nerf_signature_tpu.render.renderer import RenderConfig

    t = Trainer.__new__(Trainer)
    t.model = types.SimpleNamespace(
        train_budget=budget,
        rc=RenderConfig(bound=1.0, compact_frac=frac),
    )
    t.opt = types.SimpleNamespace(max_steps=1024, compact_frac=-1)
    t._budget_hysteresis = 0
    t._compact_pending = None
    t.log = lambda *a, **k: None
    return t


def _feed_compact(t, mean_occ, times=2):
    for _ in range(times):
        t._adapt_compaction(mean_occ)


def test_compact_lower_deadband_skips_one_step_moves():
    # fill 64/128 -> target ceil(1.3*0.5*16)/16 = 0.6875; from 0.75 that is
    # a 1/16 lower: dead-band holds the current fraction (no recompile)
    t = _ctrainer_stub(128, 0.75)
    _feed_compact(t, 64.0, times=4)
    assert t.model.rc.compact_frac == 0.75
    # a 2/16 lower passes: fill 48/128 -> target 0.5 (from 0.75)
    _feed_compact(t, 48.0, times=2)
    assert t.model.rc.compact_frac == 0.5


def test_compact_raise_keeps_full_resolution():
    # raises are truncation-protective: a single 1/16 raise still applies
    t = _ctrainer_stub(128, 0.5)
    _feed_compact(t, 56.0, times=2)   # fill 0.4375 -> target 0.625
    assert t.model.rc.compact_frac == 0.625


def test_budget_move_refits_compaction_in_same_event():
    # budget 256 -> 128 halves the denominator; the SAME event must re-fit
    # the fraction (one recompile, not two)
    t = _ctrainer_stub(256, 0.375)
    for _ in range(2):
        t._adapt_budget(np.full((64,), 55.0, np.float32))
    assert t.model.train_budget == 128
    # fill 55/128 = 0.43 -> target 0.5625, applied immediately (no pending)
    assert t.model.rc.compact_frac == 0.5625
    assert t._compact_pending is None


def test_compact_descent_churn_is_bounded():
    # monotone fill descent 0.9 -> 0.1 on a 128 budget: the dead-band must
    # cut the move count to <= half the 1/16 grid walk
    t = _ctrainer_stub(128, 1.0)
    moves = []
    real_log = t.log
    t.log = lambda msg, *a, **k: moves.append(msg)
    for occ in np.linspace(0.9 * 128, 0.1 * 128, 30):
        _feed_compact(t, float(occ), times=1)
    # target walks ~13 1/16-buckets over this descent; the dead-band must
    # at least halve the one-recompile-per-bucket walk
    assert len([m for m in moves if "compact" in m]) <= 6
    t.log = real_log


# ---- group-budget adaptation (round 5) -------------------------------------

def _gtrainer_stub(budget, group_budget=0):
    from nerf_signature_tpu.render.renderer import RenderConfig

    t = Trainer.__new__(Trainer)
    t.model = types.SimpleNamespace(
        train_budget=budget,
        rc=RenderConfig(bound=1.0, max_steps=1024, dt_gamma=0.0,
                        group_budget=group_budget),
    )
    t.opt = types.SimpleNamespace(max_steps=1024, group_budget=-1)
    t._group_hysteresis = 0
    t.log = lambda *a, **k: None
    return t


def test_group_budget_lowers_from_formula_default_to_measured():
    # budget 32 -> formula default 64 groups; measured mean 10 occupied
    # groups -> target 16: settles there, not below
    t = _gtrainer_stub(32)
    for _ in range(8):
        t._adapt_group_budget(10.0)
    assert t.model.rc.group_budget == 16
    for _ in range(4):
        t._adapt_group_budget(10.0)
    assert t.model.rc.group_budget == 16


def test_group_budget_raises_on_occupancy_growth():
    t = _gtrainer_stub(32, group_budget=16)
    for _ in range(4):
        t._adapt_group_budget(40.0)   # target 64
    assert t.model.rc.group_budget == 64


def test_group_budget_fixed_flag_disables_adaptation():
    t = _gtrainer_stub(32, group_budget=8)
    t.opt.group_budget = 8
    for _ in range(4):
        t._adapt_group_budget(100.0)
    assert t.model.rc.group_budget == 8
