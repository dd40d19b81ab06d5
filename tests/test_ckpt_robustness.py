"""Checkpoint robustness: atomic saves and fallback past corrupt files.

Round-2 incident: a training process killed mid-save left a truncated
pickle as the newest checkpoint, and ``--ckpt latest`` died on it."""

import os
import types

import jax.numpy as jnp
import numpy as np

from nerf_signature_tpu.api import NGPModel
from nerf_signature_tpu.models.ngp import NGPConfig
from nerf_signature_tpu.train.checkpoint import (
    checkpoint_candidates,
    save_checkpoint,
)
from nerf_signature_tpu.train.trainer import Trainer

TINY = NGPConfig(bound=1.0, n_levels=4, log2_hashmap_size=10,
                 finest_resolution=64, compute_dtype=jnp.float32)


def _opt():
    return types.SimpleNamespace(seed=0, iters=8, lr=1e-2, num_rays=64,
                                 devices=1, clip_text="")


def test_save_is_atomic_no_tmp_left(tmp_path):
    path = str(tmp_path / "a.ckpt")
    save_checkpoint(path, {"x": np.ones(3)})
    assert os.path.exists(path)
    assert not os.path.exists(path + ".tmp")


def test_latest_falls_back_past_corrupt(tmp_path):
    ws = str(tmp_path / "ws")
    m = NGPModel(TINY, cuda_ray=True, grid_size=16, max_steps=64,
                 train_budget=16, infer_budget=16, min_near=0.05)
    tr = Trainer("t", _opt(), m, workspace=ws, use_checkpoint="scratch",
                 mute=True)
    tr.epoch = 1
    good = tr.save_checkpoint(full=True)
    # newer, truncated checkpoint (simulates a kill mid-save on an older
    # non-atomic build)
    bad = os.path.join(tr.ckpt_path, "t_ep0002.ckpt")
    with open(good, "rb") as f:
        data = f.read()
    with open(bad, "wb") as f:
        f.write(data[: len(data) // 2])

    assert checkpoint_candidates(tr.ckpt_path, "t")[0] == bad

    m2 = NGPModel(TINY, cuda_ray=True, grid_size=16, max_steps=64,
                  train_budget=16, infer_budget=16, min_near=0.05)
    tr2 = Trainer("t", _opt(), m2, workspace=ws, use_checkpoint="latest",
                  mute=True)
    # fell back to the good epoch-1 checkpoint
    assert tr2.epoch == 1
    np.testing.assert_allclose(
        np.asarray(m2.params["hash_table"]),
        np.asarray(m.params["hash_table"]),
    )
