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
