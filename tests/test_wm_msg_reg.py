"""--lambda_msg_reg: amplitude regulariser on the message-table source.

The wm-stage quality equilibrium depends on the frozen backbone's
sensitivity to the injected codebook features (PERF.md round-2
reproducibility note); ``--lambda_msg_reg`` bounds the perturbation at its
source by penalising ``mean(effective_table(message)**2)``.  Covers: the
term changes the objective by exactly the closed-form amount, its gradient
reaches only the message-selected tables, the scan loop accepts it, and the
flag is rejected for variants without msg tables.
"""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_signature_tpu.api import WatermarkModel
from nerf_signature_tpu.models.message import msg_effective_table
from nerf_signature_tpu.models.ngp import NGPConfig
from nerf_signature_tpu.models.watermark import WatermarkConfig
from nerf_signature_tpu.train.trainer_wtmk import WatermarkTrainer


def _tiny_trainer(lambda_msg_reg=0.0, num_rays=16):
    cfg = NGPConfig(bound=1.0, n_levels=4, log2_hashmap_size=10,
                    finest_resolution=64, compute_dtype=jnp.float32)
    wcfg = WatermarkConfig(ngp=cfg, message_dim=2, msg_resolution=64,
                           msg_log2_hashmap_size=10)
    model = WatermarkModel(wcfg, grid_size=16, max_steps=64,
                           train_budget=16, infer_budget=16)
    model.occ = model.occ._replace(
        occupancy=model.occ.occupancy.at[:].set(True)
    )
    opt = types.SimpleNamespace(
        seed=0, iters=4, lr=1e-2, lambda_w=0.5, lambda_i=1.0,
        loss_w="bce", distortion="none", message_dim=2, devices=0,
        num_rays=num_rays, lambda_msg_reg=lambda_msg_reg,
    )
    return WatermarkTrainer("msgreg", opt, model, workspace=None,
                            use_checkpoint="scratch", mute=True)


def _batch(n=16):
    rng = np.random.default_rng(3)
    D, bh, bw = 2, 4, 4
    return {
        "watermark": {
            "rays_o_block": np.zeros((D, bh, bw, 3), np.float32) - 2.0,
            "rays_d_block": np.tile(np.array([1, 0, 0], np.float32),
                                    (D, bh, bw, 1)),
        },
        "content": {
            "rays_o": np.zeros((n, 3), np.float32) - 2.0,
            "rays_d": np.tile(np.array([1, 0, 0], np.float32), (n, 1)),
            "images": rng.random((n, 3)).astype(np.float32),
        },
    }


def test_msg_reg_adds_exactly_the_closed_form_term():
    data = _batch()
    msg = np.array([0, 1], np.int32)
    base = _tiny_trainer(lambda_msg_reg=0.0)
    reg = _tiny_trainer(lambda_msg_reg=100.0)
    # make the penalty visible above float noise: inflate the tables of BOTH
    # trainers identically (same seed => same init)
    for t in (base, reg):
        t.model.trainable["msg_tables"] = (
            t.model.trainable["msg_tables"] * 0 + 0.05
        )
    l0 = float(base.train_step_data(data, msg)[0])
    l1 = float(reg.train_step_data(data, msg)[0])
    eff = msg_effective_table(reg.model.trainable["msg_tables"] * 0 + 0.05,
                              jnp.asarray(msg))
    want = 100.0 * float(jnp.mean(jnp.square(eff)))
    assert want > 1e-3
    assert abs((l1 - l0) - want) < 1e-4 * max(1.0, want)


def test_msg_reg_gradient_hits_only_selected_tables():
    tr = _tiny_trainer(lambda_msg_reg=1.0)
    msg = jnp.asarray([0, 1], jnp.int32)

    def reg_only(tables):
        eff = msg_effective_table(tables, msg)
        return jnp.mean(jnp.square(eff))

    tables = tr.model.trainable["msg_tables"] * 0 + 0.01
    g = np.asarray(jax.grad(reg_only)(tables))
    # bit 0 = 0 selects table [0, 0]; bit 1 = 1 selects table [1, 1]
    assert np.abs(g[0, 0]).max() > 0 and np.abs(g[1, 1]).max() > 0
    assert np.abs(g[0, 1]).max() == 0 and np.abs(g[1, 0]).max() == 0


def test_msg_reg_scan_loop_runs():
    from nerf_signature_tpu.train.trainer_wtmk import _wm_device_loop

    tr = _tiny_trainer(lambda_msg_reg=1.0)
    m = tr.model
    data = _batch()
    H = W = 8
    P = 2
    poses = np.tile(np.eye(4, dtype=np.float32), (P, 1, 1))
    poses[:, 0, 3] = -2.0
    state = tr.optimizer.init(m.trainable)
    out = _wm_device_loop(
        m.backbone, m.trainable, state, m.occ.occupancy,
        jnp.asarray(data["watermark"]["rays_o_block"]),
        jnp.asarray(data["watermark"]["rays_d_block"]),
        jnp.asarray(poses), jnp.full((P, H * W, 3), 0.5),
        jnp.asarray([8.0, 8.0, 4.0, 4.0], jnp.float32),
        jax.random.PRNGKey(0), jnp.float32(0.5), jnp.float32(1.0),
        m.wcfg, m.rc, 16, 16, tr.optimizer.update, "none", "bce",
        2, 16, H, W, lambda_msg_reg=jnp.float32(1.0),
    )
    losses = np.asarray(out[2])
    assert losses.shape == (2,) and np.all(np.isfinite(losses))


def test_msg_reg_rejected_without_msg_tables():
    # the CopyRNeRF baseline injects the message through a color-space MLP
    # (trainable has msg_mlp, no msg_tables) — the flag must be rejected
    cfg = NGPConfig(bound=1.0, n_levels=4, log2_hashmap_size=10,
                    finest_resolution=64, compute_dtype=jnp.float32)
    wcfg = WatermarkConfig(ngp=cfg, message_dim=2, msg_resolution=64,
                           msg_log2_hashmap_size=10, copyrnerf=True)
    model = WatermarkModel(wcfg, grid_size=16, max_steps=64,
                           train_budget=16, infer_budget=16)
    assert "msg_tables" not in model.trainable
    opt = types.SimpleNamespace(
        seed=0, iters=4, lr=1e-2, lambda_w=0.5, lambda_i=1.0,
        loss_w="bce", distortion="none", message_dim=2, devices=0,
        num_rays=16, lambda_msg_reg=1.0,
    )
    with pytest.raises(ValueError):
        WatermarkTrainer("msgreg_bad", opt, model, workspace=None,
                         use_checkpoint="scratch", mute=True)
