"""Patch-mode perceptual loss wiring (ref nerf/utils.py:374-377,528):
with LPIPS weights resolved and patch_size >= 32, the clean train step adds
the in-graph 1e-3 * LPIPS term; without weights it logs a skip and trains
plain MSE."""

import types

import jax
import jax.numpy as jnp
import numpy as np

from nerf_signature_tpu.api import NGPModel
from nerf_signature_tpu.data.rays import get_rays, rand_poses
from nerf_signature_tpu.models.ngp import NGPConfig
from nerf_signature_tpu.train.trainer import Trainer
from nerf_signature_tpu.utils.lpips import lpips_params_from_state_dict
from tests.test_lpips import _random_state_dict

TINY = NGPConfig(bound=1.0, n_levels=4, log2_hashmap_size=10,
                 finest_resolution=64, compute_dtype=jnp.float32)


def _model():
    m = NGPModel(TINY, cuda_ray=True, grid_size=16, max_steps=64,
                 train_budget=16, infer_budget=16, min_near=0.05)
    m.occ = m.occ._replace(occupancy=m.occ.occupancy.at[:].set(True))
    return m


def _patch_batch(ps=32):
    rng = np.random.default_rng(0)
    poses = rand_poses(rng, 1, radius=1.5)
    rays = get_rays(poses, (40.0, 40.0, ps, ps), 2 * ps, 2 * ps,
                    ps * ps, rng=rng, patch_size=ps)
    return {
        "H": 2 * ps, "W": 2 * ps,
        "rays_o": rays["rays_o"], "rays_d": rays["rays_d"],
        "images": rng.uniform(0, 1, (1, ps * ps, 3)).astype(np.float32),
    }


def _opt(ps):
    return types.SimpleNamespace(seed=0, iters=8, lr=1e-2,
                                 num_rays=ps * ps, devices=1,
                                 patch_size=ps, clip_text="")


def test_patch_loss_active_with_weights():
    tr = Trainer("t", _opt(32), _model(), workspace=None,
                 use_checkpoint="scratch", mute=True)
    tr._lpips_params = lpips_params_from_state_dict(_random_state_dict())
    loss_lp = tr.train_step_data(_patch_batch(32))[0]
    assert np.isfinite(float(loss_lp))

    # same batch through a no-lpips trainer: loss must differ (extra term)
    tr2 = Trainer("t", _opt(32), _model(), workspace=None,
                  use_checkpoint="scratch", mute=True)
    assert tr2._lpips_params is None  # no weights in this image
    loss_mse = tr2.train_step_data(_patch_batch(32))[0]
    assert float(loss_lp) != float(loss_mse)


def test_small_patches_skip_lpips_cleanly():
    logs = []
    tr = Trainer("t", _opt(16), _model(), workspace=None,
                 use_checkpoint="scratch", mute=True)
    # even if weights had resolved, patch 16 would collapse the stack:
    # the constructor already nulled the params
    assert tr._lpips_params is None
    loss = tr.train_step_data(_patch_batch(16))[0]
    assert np.isfinite(float(loss))
