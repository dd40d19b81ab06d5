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


class TestHashSelectAblation:
    """Message-injection ablation (ref network_wtmk_tcnn_ablation_hash*:
    hash_select 1=finest/2=coarsest/3=middle/0=all-levels)."""

    def _cfg(self, hash_select):
        return WatermarkConfig(
            ngp=NGPConfig(n_levels=4, log2_hashmap_size=8,
                          finest_resolution=128,
                          compute_dtype=jnp.float32),
            message_dim=4, msg_resolution=128, msg_log2_hashmap_size=8,
            hash_select=hash_select,
        )

    def test_injection_slices(self):
        from nerf_signature_tpu.models.watermark import (
            _encode_with_message, init_watermark_params,
        )

        x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3), minval=-1,
                               maxval=1)
        m0 = jnp.zeros((4,), jnp.int32)
        m1 = m0.at[2].set(1)
        # expected perturbed feature columns per mode (n_levels=4, F=2)
        expected = {1: [6, 7], 2: [0, 1], 3: [2, 3],
                    0: list(range(8))}
        for sel, cols in expected.items():
            cfg = self._cfg(sel)
            p = init_watermark_params(jax.random.PRNGKey(0), cfg)
            f0 = _encode_with_message(p["backbone"], p["trainable"], cfg, x, m0)
            f1 = _encode_with_message(p["backbone"], p["trainable"], cfg, x, m1)
            diff = np.abs(np.asarray(f1 - f0)).max(axis=0)
            changed = set(np.nonzero(diff > 0)[0].tolist())
            assert changed, f"hash_select={sel}: bit flip had no effect"
            assert changed <= set(cols), (
                f"hash_select={sel}: changed {changed}, allowed {cols}"
            )
            # no-message encode must equal the clean backbone encode
            fnone = _encode_with_message(p["backbone"], p["trainable"], cfg,
                                         x, None)
            assert fnone.shape == f0.shape

    def test_all_levels_msg_table_shape_and_grad(self):
        """hash_select=0 keeps the [D, 2, 2**S, F] codebook (level-shared)
        and gradients reach exactly the selected tables."""
        from nerf_signature_tpu.models.watermark import (
            _encode_with_message, init_watermark_params,
        )

        cfg = self._cfg(0)
        p = init_watermark_params(jax.random.PRNGKey(0), cfg)
        assert p["trainable"]["msg_tables"].shape == (4, 2, 256, 2)
        x = jax.random.uniform(jax.random.PRNGKey(1), (8, 3))
        msg = jnp.array([0, 1, 1, 0], jnp.int32)

        def loss(tables):
            tr = dict(p["trainable"], msg_tables=tables)
            f = _encode_with_message(p["backbone"], tr, cfg, x, msg)
            return jnp.sum(f**2)

        g = jax.grad(loss)(p["trainable"]["msg_tables"])
        g = np.asarray(g)
        per_table = np.abs(g).sum(axis=(2, 3))  # [D, 2]
        for i, b in enumerate([0, 1, 1, 0]):
            assert per_table[i, b] > 0
            assert per_table[i, 1 - b] == 0


class TestCopyRNeRF:
    """CopyRNeRF color-space baseline (models/copyrnerf.py)."""

    def _cfg(self):
        return WatermarkConfig(
            ngp=NGPConfig(n_levels=4, log2_hashmap_size=8,
                          finest_resolution=128, compute_dtype=jnp.float32),
            message_dim=4, copyrnerf=True,
        )

    def test_params_and_decoder_shape(self):
        from nerf_signature_tpu.models.watermark import init_watermark_params

        cfg = self._cfg()
        assert cfg.decoder.num_bits == 4  # whole-image extraction
        p = init_watermark_params(jax.random.PRNGKey(0), cfg)
        assert "msg_mlp" in p["trainable"]
        assert "msg_tables" not in p["trainable"]

    def test_message_changes_color_not_sigma(self):
        from nerf_signature_tpu.models.watermark import (
            init_watermark_params, wtmk_field,
        )

        cfg = self._cfg()
        p = init_watermark_params(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-1,
                               maxval=1)
        d = jax.random.normal(jax.random.PRNGKey(2), (32, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        s_none, c_none = wtmk_field(p["backbone"], p["trainable"], cfg, x, d,
                                    None)
        msg = jnp.array([1, 0, 1, 1], jnp.int32)
        s_msg, c_msg = wtmk_field(p["backbone"], p["trainable"], cfg, x, d,
                                  msg)
        np.testing.assert_allclose(np.asarray(s_none), np.asarray(s_msg),
                                   rtol=1e-6)
        assert np.abs(np.asarray(c_msg - c_none)).max() > 0
        # flipping a bit changes the color too
        s2, c2 = wtmk_field(p["backbone"], p["trainable"], cfg, x, d,
                            msg.at[0].set(0))
        assert np.abs(np.asarray(c2 - c_msg)).max() > 0

    def test_grad_flows_to_msg_mlp(self):
        from nerf_signature_tpu.models.watermark import (
            init_watermark_params, wtmk_field,
        )

        cfg = self._cfg()
        p = init_watermark_params(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (8, 3))
        d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (8, 1))
        msg = jnp.array([1, 0, 1, 0], jnp.int32)

        def loss(tr):
            _, rgb = wtmk_field(p["backbone"], tr, cfg, x, d, msg)
            return jnp.sum(rgb.astype(jnp.float32) ** 2)

        g = jax.grad(loss)(p["trainable"])
        gmax = max(
            float(jnp.abs(l).max())
            for l in jax.tree_util.tree_leaves(g["msg_mlp"])
        )
        assert gmax > 0


class TestBatchedBitacc:
    def test_vmapped_decode_matches_sequential(self):
        """Message-batched ownership verification must produce the SAME
        logits as the per-message path (vmap keeps decoder batch stats per
        message)."""
        from nerf_signature_tpu.api import WatermarkModel
        from nerf_signature_tpu.train.trainer_wtmk import (
            _wtmk_decode_blocks, _wtmk_decode_blocks_batched,
        )

        D, bh, bw = 3, 4, 4
        wcfg = WatermarkConfig(
            ngp=NGPConfig(n_levels=4, log2_hashmap_size=10,
                          finest_resolution=64, compute_dtype=jnp.float32),
            message_dim=D, msg_resolution=64, msg_log2_hashmap_size=10,
        )
        m = WatermarkModel(wcfg=wcfg, grid_size=16, max_steps=32,
                           train_budget=8, infer_budget=8)
        m.occ = m.occ._replace(occupancy=m.occ.occupancy.at[:].set(True))
        ro_b = jnp.zeros((D, bh, bw, 3)) - 2.0
        rd_b = jnp.tile(jnp.asarray([1.0, 0.0, 0.0]), (D, bh, bw, 1))

        rng = np.random.default_rng(0)
        messages = jnp.asarray(rng.integers(0, 2, (4, D)).astype(np.int32))
        keys = jax.random.split(jax.random.PRNGKey(7), 4)

        batched = _wtmk_decode_blocks_batched(
            m.backbone, m.trainable, m.occ.occupancy, ro_b, rd_b,
            messages, keys, m.wcfg, m.rc, 8, "noise",
        )
        for b in range(4):
            _, seq = _wtmk_decode_blocks(
                m.backbone, m.trainable, m.occ.occupancy, ro_b, rd_b,
                messages[b], keys[b], m.wcfg, m.rc, 8, "noise",
            )
            np.testing.assert_allclose(
                np.asarray(batched[b]), np.asarray(seq), rtol=2e-4, atol=1e-5,
            )


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
