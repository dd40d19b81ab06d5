"""Loading a grid-less (best-format) checkpoint into the wm stage must
rebuild the occupancy grid from the frozen backbone, not train against an
empty grid.

Regression for a live failure: the "best" checkpoint intentionally drops the
density grid (ref ``utils.py:1067-1069``); the wm stage never runs grid
maintenance (ref behaviour — frozen grid), so loading one left occupancy all
-False.  Every render was then pure background, the message gradient was
structurally zero, and a 32-bit campaign silently converged to a collapsed
decoder (bit-acc 0.5, lossw = ln 2, msg tables bit-identical to init)."""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_signature_tpu.api import WatermarkModel
from nerf_signature_tpu.models.ngp import NGPConfig
from nerf_signature_tpu.models.watermark import WatermarkConfig
from nerf_signature_tpu.train.checkpoint import save_checkpoint
from nerf_signature_tpu.train.trainer_wtmk import WatermarkTrainer


def _tiny(tmp_path, density_thresh):
    cfg = NGPConfig(bound=1.0, n_levels=2, log2_hashmap_size=10,
                    finest_resolution=32, compute_dtype=jnp.float32)
    wcfg = WatermarkConfig(ngp=cfg, message_dim=2, msg_resolution=32,
                           msg_log2_hashmap_size=10)
    model = WatermarkModel(wcfg, grid_size=16, max_steps=32,
                           train_budget=8, infer_budget=8,
                           density_thresh=density_thresh)
    opt = types.SimpleNamespace(
        seed=0, iters=2, lr=1e-2, lambda_w=0.02, lambda_i=1.0,
        loss_w="bce", distortion="none", message_dim=2, devices=1,
        num_rays=8,
    )
    tr = WatermarkTrainer("occ_rebuild", opt, model, workspace=None,
                          use_checkpoint="scratch", mute=True)
    # a clean-stage BEST checkpoint: params only, occupancy dropped.
    # Bias the sigma net so raw densities are large -> grid rebuild finds
    # occupied cells at a sane threshold.
    params = jax.tree_util.tree_map(np.asarray, model.backbone)
    params["sigma_net"][0] = np.abs(params["sigma_net"][0]) + 0.5
    params["hash_table"] = np.abs(params["hash_table"]) + 0.1
    path = str(tmp_path / "clean_best.ckpt")
    save_checkpoint(path, {"params": params})
    return tr, path


def test_gridless_ckpt_rebuilds_occupancy(tmp_path):
    tr, path = _tiny(tmp_path, density_thresh=1e-4)
    assert not bool(jnp.any(tr.model.occ.occupancy))
    tr.load_checkpoint(path, model_only=True)
    assert bool(jnp.any(tr.model.occ.occupancy))  # rebuilt from density


def test_gridless_ckpt_empty_rebuild_raises(tmp_path):
    # a backbone whose density is ~0 everywhere (sigma logit driven hard
    # negative) rebuilds an EMPTY grid -> must FAIL LOUDLY, never train
    # against nothing
    tr, path = _tiny(tmp_path, density_thresh=1e-4)
    params = jax.tree_util.tree_map(np.asarray, tr.model.backbone)
    w0, w1 = params["sigma_net"]
    w0 = np.abs(w0)              # relu activations strictly positive
    w1 = w1.copy()
    w1[:, 0] = -20.0             # sigma = trunc_exp(very negative) ~ 0
    params["sigma_net"] = [w0, w1]
    params["hash_table"] = np.abs(params["hash_table"]) + 0.1
    from nerf_signature_tpu.train.checkpoint import save_checkpoint as _save
    path2 = str(tmp_path / "flat.ckpt")
    _save(path2, {"params": params})
    with pytest.raises(RuntimeError, match="empty grid"):
        tr.load_checkpoint(path2, model_only=True)


def test_clean_trainer_gridless_ckpt_rebuilds(tmp_path):
    """Same hazard on the clean side: --test with a best-format ckpt."""
    from nerf_signature_tpu.api import NGPModel
    from nerf_signature_tpu.train.trainer import Trainer

    cfg = NGPConfig(bound=1.0, n_levels=2, log2_hashmap_size=10,
                    finest_resolution=32, compute_dtype=jnp.float32)
    model = NGPModel(cfg, grid_size=16, max_steps=32, train_budget=8,
                     infer_budget=8, density_thresh=1e-4)
    opt = types.SimpleNamespace(seed=0, iters=2, lr=1e-2, num_rays=8,
                                devices=1)
    tr = Trainer("occ_rebuild_clean", opt, model, workspace=None,
                 use_checkpoint="scratch", mute=True)
    params = jax.tree_util.tree_map(np.asarray, model.params)
    params["sigma_net"][0] = np.abs(params["sigma_net"][0]) + 0.5
    params["hash_table"] = np.abs(params["hash_table"]) + 0.1
    path = str(tmp_path / "clean_best2.ckpt")
    save_checkpoint(path, {"params": params})
    assert not bool(jnp.any(tr.model.occ.occupancy))
    tr.load_checkpoint(path, model_only=True)
    assert bool(jnp.any(tr.model.occ.occupancy))


def test_blank_key_image_raises():
    """Defense in depth at the provider: a constant key image means the
    key-pose render produced nothing — JPEG-ratio block selection would
    silently degenerate to the first k grid cells."""
    from nerf_signature_tpu.data.provider_wtmk import select_key_blocks

    with pytest.raises(ValueError, match="key image"):
        select_key_blocks(np.ones((64, 64, 3), np.float32), 4, 4, 4)
    # textured images and the random-selection ablation are unaffected
    rng = np.random.default_rng(0)
    select_key_blocks(rng.uniform(0, 1, (64, 64, 3)).astype(np.float32),
                      4, 4, 4)
    select_key_blocks(np.ones((64, 64, 3), np.float32), 4, 4, 4,
                      selection="random")


def test_ckpt_with_grid_untouched(tmp_path):
    tr, path = _tiny(tmp_path, density_thresh=1e-4)
    occ = tr.model.occ._replace(
        occupancy=tr.model.occ.occupancy.at[0, 3, 3, 3].set(True)
    )
    tr.model.occ = occ
    before = np.asarray(occ.occupancy).copy()
    tr.load_checkpoint(path, model_only=True)  # params-only ckpt, grid kept
    assert (np.asarray(tr.model.occ.occupancy) == before).all()
