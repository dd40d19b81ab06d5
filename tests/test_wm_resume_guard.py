"""Crash-resume guard: a wm stage relaunched with its ORIGINAL flags points
--ckpt at the CLEAN backbone even when the workspace already holds wm-stage
progress.  The trainer must resume from the workspace's newest wm checkpoint
instead of silently retraining the watermark from step 0 (observed live: a
relay wedge at the 600-iter mark restarted the embed from scratch).

An explicit --ckpt INSIDE the workspace (a deliberate rewind to a specific
epoch) keeps the old behaviour: that exact checkpoint is loaded, model-only.

Ref semantics being completed: ``nerf/utils_wtmk_disen.py:508-526`` resolves
checkpoints but has no notion of crash-resume (the reference has no watchdog;
its path branch always loads model-only)."""

import types

import jax
import jax.numpy as jnp
import numpy as np

from nerf_signature_tpu.api import WatermarkModel
from nerf_signature_tpu.models.ngp import NGPConfig
from nerf_signature_tpu.models.watermark import WatermarkConfig
from nerf_signature_tpu.train.checkpoint import save_checkpoint
from nerf_signature_tpu.train.trainer_wtmk import WatermarkTrainer


def _opt():
    return types.SimpleNamespace(
        seed=0, iters=2, lr=1e-2, lambda_w=0.02, lambda_i=1.0,
        loss_w="bce", distortion="none", message_dim=2, devices=1,
        num_rays=8,
    )


def _model():
    cfg = NGPConfig(bound=1.0, n_levels=2, log2_hashmap_size=10,
                    finest_resolution=32, compute_dtype=jnp.float32)
    wcfg = WatermarkConfig(ngp=cfg, message_dim=2, msg_resolution=32,
                           msg_log2_hashmap_size=10)
    m = WatermarkModel(wcfg, grid_size=16, max_steps=32,
                       train_budget=8, infer_budget=8, density_thresh=1e-4)
    # occupied grid + biased density so _ensure_occupancy never trips
    m.occ = m.occ._replace(
        occupancy=jnp.ones_like(m.occ.occupancy))
    params = jax.tree_util.tree_map(np.asarray, m.backbone)
    params["sigma_net"][0] = np.abs(params["sigma_net"][0]) + 0.5
    params["hash_table"] = np.abs(params["hash_table"]) + 0.1
    m.backbone = jax.tree_util.tree_map(jnp.asarray, params)
    return m


def _seed_workspace(tmp_path):
    """Clean backbone ckpt outside the workspace + a wm ckpt with progress
    inside it; returns (clean_path, workspace)."""
    clean_path = str(tmp_path / "clean" / "ngp_ep0012.ckpt")
    (tmp_path / "clean").mkdir()
    m = _model()
    save_checkpoint(clean_path,
                    {"params": jax.tree_util.tree_map(np.asarray, m.backbone)})

    ws = str(tmp_path / "ws_wm")
    tr = WatermarkTrainer("ngp", _opt(), m, workspace=ws,
                          use_checkpoint="scratch", mute=True)
    tr.epoch, tr.global_step = 3, 24
    tr.save_checkpoint(full=True)
    return clean_path, ws


def test_explicit_clean_ckpt_resumes_workspace_progress(tmp_path):
    clean_path, ws = _seed_workspace(tmp_path)
    tr2 = WatermarkTrainer("ngp", _opt(), _model(), workspace=ws,
                           use_checkpoint=clean_path, mute=True)
    assert tr2._wm_state_loaded
    assert tr2.global_step == 24  # resumed, not restarted


def test_explicit_rewind_inside_workspace_is_honoured(tmp_path):
    clean_path, ws = _seed_workspace(tmp_path)
    import glob as _glob
    wm_ckpt = _glob.glob(f"{ws}/checkpoints/ngp_ep*.ckpt")[0]
    tr2 = WatermarkTrainer("ngp", _opt(), _model(), workspace=ws,
                           use_checkpoint=wm_ckpt, mute=True)
    # model-only load of the named checkpoint: weights restored, step reset
    assert tr2._wm_state_loaded
    assert tr2.global_step == 0


def test_stale_clean_ckpt_in_workspace_is_rejected_without_side_effects(
        tmp_path):
    """A CLEAN-stage checkpoint parked in the wm workspace (both stages name
    ckpts ngp_ep*.ckpt) must not poison the resume: the guard used to apply
    its epoch/global_step/opt_state BEFORE rejecting it, leaving global_step
    at the clean run's value so the wm stage silently trained ~0 steps
    (ADVICE r2)."""
    clean_path = str(tmp_path / "clean" / "ngp_ep0012.ckpt")
    (tmp_path / "clean").mkdir()
    m = _model()
    save_checkpoint(clean_path,
                    {"params": jax.tree_util.tree_map(np.asarray, m.backbone)})
    ws = str(tmp_path / "ws_stale")
    stale_dir = tmp_path / "ws_stale" / "checkpoints"
    stale_dir.mkdir(parents=True)
    # clean-format checkpoint WITH progress markers, as a clean stage run
    # in this workspace would have left behind
    save_checkpoint(
        str(stale_dir / "ngp_ep0099.ckpt"),
        {"params": jax.tree_util.tree_map(np.asarray, m.backbone),
         "epoch": 99, "global_step": 792},
    )
    tr = WatermarkTrainer("ngp", _opt(), _model(), workspace=ws,
                          use_checkpoint=clean_path, mute=True)
    assert not tr._wm_state_loaded
    assert tr.global_step == 0  # NOT 792
    assert tr.epoch == 0


def test_no_workspace_progress_loads_backbone(tmp_path):
    clean_path = str(tmp_path / "clean" / "ngp_ep0012.ckpt")
    (tmp_path / "clean").mkdir()
    m = _model()
    save_checkpoint(clean_path,
                    {"params": jax.tree_util.tree_map(np.asarray, m.backbone)})
    ws = str(tmp_path / "ws_fresh")
    tr = WatermarkTrainer("ngp", _opt(), _model(), workspace=ws,
                          use_checkpoint=clean_path, mute=True)
    assert not tr._wm_state_loaded
    assert tr.global_step == 0
