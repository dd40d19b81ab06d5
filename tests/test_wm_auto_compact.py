"""--compact_frac -1 in the wm stage: resolved ONCE at startup from a probe
render (occupancy is frozen — the clean trainer's adaptive loop has nothing
to adapt to)."""

import types

import jax.numpy as jnp
import numpy as np

from nerf_signature_tpu.api import WatermarkModel
from nerf_signature_tpu.models.ngp import NGPConfig
from nerf_signature_tpu.models.watermark import WatermarkConfig
from nerf_signature_tpu.train.trainer_wtmk import WatermarkTrainer


def _tiny_trainer(compact_frac):
    cfg = NGPConfig(bound=1.0, n_levels=4, log2_hashmap_size=10,
                    finest_resolution=64, compute_dtype=jnp.float32)
    wcfg = WatermarkConfig(ngp=cfg, message_dim=2, msg_resolution=64,
                           msg_log2_hashmap_size=10)
    model = WatermarkModel(wcfg, grid_size=16, max_steps=64,
                           train_budget=16, infer_budget=16)
    opt = types.SimpleNamespace(
        seed=0, iters=4, lr=1e-2, lambda_w=0.5, lambda_i=1.0,
        loss_w="bce", distortion="none", message_dim=2, devices=0,
        num_rays=16, compact_frac=compact_frac,
    )
    return WatermarkTrainer("ac", opt, model, workspace=None,
                            use_checkpoint="scratch", mute=True)


class _Loader:
    poses = np.eye(4, dtype=np.float32)[None]
    intrinsics = np.array([8.0, 8.0, 4.0, 4.0])
    H = W = 8


def _probe_with(tr, mean_occ):
    """Stub the probe render to report a fixed per-ray occupied count."""
    def fake_render(*a, **k):
        tr.model._last_n_occupied = np.full((64,), mean_occ, np.float32)
        return {}

    tr.model.render = fake_render
    tr.resolve_auto_compaction(_Loader())


def test_sparse_occupancy_enables_compaction():
    tr = _tiny_trainer(compact_frac=-1)
    _probe_with(tr, mean_occ=4.0)  # fill 4/16 -> ceil(5.2)/16 = 0.375
    assert tr.model.rc.compact_frac == 0.375


def test_very_sparse_tracks_fill_grid():
    tr = _tiny_trainer(compact_frac=-1)
    _probe_with(tr, mean_occ=2.0)  # fill 2/16 -> ceil(2.6)/16 = 0.1875
    assert tr.model.rc.compact_frac == 0.1875


def test_dense_occupancy_stays_uncompacted():
    tr = _tiny_trainer(compact_frac=-1)
    _probe_with(tr, mean_occ=16.0)  # full budget -> target 1.0 -> off
    assert tr.model.rc.compact_frac == 0.0


def test_noop_without_auto_flag():
    tr = _tiny_trainer(compact_frac=0.0)
    called = []
    tr.model.render = lambda *a, **k: called.append(1)
    tr.resolve_auto_compaction(_Loader())
    assert not called and tr.model.rc.compact_frac == 0.0


def test_probe_runs_end_to_end():
    """Unstubbed probe: a real tiny render resolves without error and sets a
    valid bucket."""
    tr = _tiny_trainer(compact_frac=-1)
    tr.resolve_auto_compaction(_Loader())
    assert tr.model.rc.compact_frac == 0.0 or (0.0625 <= tr.model.rc.compact_frac <= 1.0 and (tr.model.rc.compact_frac * 16) % 1 == 0)


def test_group_budget_resolved_once_from_probe():
    tr = _tiny_trainer(compact_frac=-1)
    tr.opt.group_budget = -1

    def fake_render(*a, **k):
        tr.model._last_n_occupied = np.full((64,), 4.0, np.float32)
        tr.model._last_n_groups_occ = np.full((64,), 9.0, np.float32)
        return {}

    tr.model.render = fake_render
    tr.resolve_auto_compaction(_Loader())
    # 1.5 * 9 = 13.5 -> pow2 16 (floor 16), capped by n_cand // 4
    assert tr.model.rc.group_budget == 16


def test_group_budget_untouched_without_auto_flag():
    tr = _tiny_trainer(compact_frac=-1)
    tr.opt.group_budget = 0
    _probe_with(tr, mean_occ=4.0)
    assert tr.model.rc.group_budget == 0
