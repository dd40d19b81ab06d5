"""Tests for watermark variants: whole-image extraction mode and the
single-view (running-stats BN) HiDDeN decoder."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_signature_tpu.models.hidden import (
    HiddenDecoderSingleConfig,
    hidden_decoder_single_apply,
    init_hidden_decoder_single,
)
from nerf_signature_tpu.models.ngp import NGPConfig
from nerf_signature_tpu.models.watermark import WatermarkConfig


class TestWholeImageConfig:
    def test_decoder_outputs_all_bits(self):
        cfg = WatermarkConfig(
            ngp=NGPConfig(n_levels=4, log2_hashmap_size=8),
            message_dim=8, whole_image=True,
        )
        assert cfg.decoder.num_bits == 8
        cfg_blocks = WatermarkConfig(
            ngp=NGPConfig(n_levels=4, log2_hashmap_size=8), message_dim=8,
        )
        assert cfg_blocks.decoder.num_bits == 1


class TestSingleViewDecoder:
    def test_shapes_and_state(self):
        cfg = HiddenDecoderSingleConfig(num_blocks=2, num_bits=4, channels=8)
        params, state = init_hidden_decoder_single(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (3, 10, 10, 3))
        logits, new_state = hidden_decoder_single_apply(params, state, cfg, x,
                                                       train=True)
        assert logits.shape == (3, 4)
        # running stats moved away from init
        assert float(jnp.abs(new_state["bn"][0]["mean"]).sum()) > 0

    def test_eval_uses_running_stats(self):
        cfg = HiddenDecoderSingleConfig(num_blocks=2, num_bits=2, channels=4)
        params, state = init_hidden_decoder_single(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 3))
        # eval twice -> deterministic, state unchanged
        l1, s1 = hidden_decoder_single_apply(params, state, cfg, x, train=False)
        l2, s2 = hidden_decoder_single_apply(params, state, cfg, x, train=False)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2))
        for a, b in zip(s1["bn"], state["bn"]):
            np.testing.assert_allclose(np.asarray(a["mean"]),
                                       np.asarray(b["mean"]))


class TestFinetuneDecoder:
    def test_msg_tables_frozen_decoder_trains(self):
        """--finetune_decoder freezes the msg encoder too (ref
        network_wtmk_tcnn.py:90-95,179-184): only the decoder updates."""
        import types

        from nerf_signature_tpu.api import WatermarkModel
        from nerf_signature_tpu.models.ngp import NGPConfig
        from nerf_signature_tpu.models.watermark import WatermarkConfig
        from nerf_signature_tpu.train.trainer_wtmk import WatermarkTrainer

        D, bh, bw = 2, 4, 4
        wcfg = WatermarkConfig(
            ngp=NGPConfig(bound=1.0, n_levels=4, log2_hashmap_size=10,
                          finest_resolution=64, compute_dtype=jnp.float32),
            message_dim=D, msg_resolution=64, msg_log2_hashmap_size=10,
            finetune_decoder=True,
        )
        model = WatermarkModel(wcfg, grid_size=16, max_steps=32,
                               train_budget=8, infer_budget=8)
        model.occ = model.occ._replace(
            occupancy=model.occ.occupancy.at[:].set(True)
        )
        opt = types.SimpleNamespace(
            seed=0, iters=4, lr=1e-2, lambda_w=1.0, lambda_i=1.0,
            loss_w="bce", distortion="none", message_dim=D, devices=0,
            num_rays=32,
        )
        tr = WatermarkTrainer("ftd", opt, model, workspace=None,
                              use_checkpoint="scratch", mute=True)
        rng = np.random.default_rng(0)
        o = np.asarray(rng.normal(0, 0.1, (32, 3)) - [2.0, 0, 0], np.float32)
        d = np.asarray(rng.normal([1, 0, 0], 0.05, (32, 3)), np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        data = {
            "watermark": {
                "rays_o_block": np.zeros((D, bh, bw, 3), np.float32) - 2.0,
                "rays_d_block": np.tile(np.array([1, 0, 0], np.float32),
                                        (D, bh, bw, 1)),
            },
            "content": {"rays_o": o, "rays_d": d,
                        "images": np.full((32, 3), 0.5, np.float32)},
        }
        tables_before = np.asarray(model.trainable["msg_tables"])
        dec_before = jax.tree_util.tree_map(
            np.asarray, model.trainable["decoder"]
        )
        tr.train_step_data(data, tr.random_message())
        np.testing.assert_array_equal(
            tables_before, np.asarray(model.trainable["msg_tables"])
        )
        changed = any(
            not np.array_equal(a, np.asarray(b))
            for a, b in zip(jax.tree_util.tree_leaves(dec_before),
                            jax.tree_util.tree_leaves(
                                model.trainable["decoder"]))
        )
        assert changed
