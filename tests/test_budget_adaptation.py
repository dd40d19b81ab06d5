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
