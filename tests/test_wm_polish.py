"""Post-lock content polish (--wm_polish_iters) switch semantics."""

import types

import jax.numpy as jnp
import numpy as np

from nerf_signature_tpu.api import WatermarkModel
from nerf_signature_tpu.models.ngp import NGPConfig
from nerf_signature_tpu.models.watermark import WatermarkConfig
from nerf_signature_tpu.train.trainer_wtmk import WatermarkTrainer


def _tiny_trainer(**opt_kw):
    cfg = NGPConfig(bound=1.0, n_levels=4, log2_hashmap_size=10,
                    finest_resolution=64, compute_dtype=jnp.float32)
    wcfg = WatermarkConfig(ngp=cfg, message_dim=2, msg_resolution=64,
                           msg_log2_hashmap_size=10)
    model = WatermarkModel(wcfg, grid_size=16, max_steps=64,
                           train_budget=16, infer_budget=16)
    opt = types.SimpleNamespace(
        seed=0, iters=6, lr=1e-2, lambda_w=0.5, lambda_i=1.0,
        loss_w="bce", distortion="none", message_dim=2, devices=0,
        num_rays=16, **opt_kw,
    )
    tr = WatermarkTrainer("polish", opt, model, workspace=None,
                          use_checkpoint="scratch", mute=True)
    return tr


class _FakeLoader:
    """Infinite-ish loader of inert batches; train_step_data is stubbed."""

    def __init__(self, n=100):
        self.n = n
        self.poses = None

    def __len__(self):
        return self.n

    def __iter__(self):
        for _ in range(self.n):
            yield {}


def test_polish_switches_lambda_and_extends_steps():
    tr = _tiny_trainer(wm_polish_iters=4, wm_polish_lambda_w=1e-4)
    seen = []

    def fake_step(data, message):
        seen.append(tr.lambda_w)
        return (np.float32(0.1),) * 3 + (np.zeros(2),)

    tr.train_step_data = fake_step
    tr.train(_FakeLoader(), max_epochs=1)
    # 6 main iters at lambda_w=0.5, then 4 polish iters at 1e-4
    assert len(seen) == 10
    assert seen[:6] == [0.5] * 6
    assert seen[6:] == [1e-4] * 4
    assert tr._polishing


def test_no_polish_by_default():
    tr = _tiny_trainer()
    seen = []

    def fake_step(data, message):
        seen.append(tr.lambda_w)
        return (np.float32(0.1),) * 3 + (np.zeros(2),)

    tr.train_step_data = fake_step
    tr.train(_FakeLoader(), max_epochs=1)
    assert len(seen) == 6
    assert all(v == 0.5 for v in seen)
    assert not tr._polishing
