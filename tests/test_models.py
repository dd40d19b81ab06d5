"""Unit tests for the model layer: MLPs, NGP field, codebook message encoder,
HiDDeN decoder, distortions."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_signature_tpu.models import (
    HiddenDecoderConfig,
    NGPConfig,
    WatermarkConfig,
    hidden_decoder_apply,
    init_hidden_decoder,
    init_mlp,
    init_msg_tables,
    init_ngp_params,
    init_watermark_params,
    mlp_apply,
    msg_effective_table,
    msg_encode,
    ngp_density,
    ngp_field,
    normalize_img,
    wtmk_field,
)
from nerf_signature_tpu.ops.hashenc import hash_encode
from nerf_signature_tpu.utils.image import distortion_layer

TINY = NGPConfig(
    bound=1.0, n_levels=4, log2_hashmap_size=10, base_resolution=4,
    finest_resolution=32, compute_dtype=jnp.float32,
)


class TestMLP:
    def test_shapes_and_bias_free(self):
        params = init_mlp(jax.random.PRNGKey(0), [8, 16, 4])
        assert [p.shape for p in params] == [(8, 16), (16, 4)]
        x = jnp.zeros((5, 8))
        out = mlp_apply(params, x)
        # bias-free: zero input -> zero output
        np.testing.assert_allclose(out, 0.0)

    def test_bf16_compute_returns_f32(self):
        params = init_mlp(jax.random.PRNGKey(0), [8, 16, 4])
        out = mlp_apply(params, jnp.ones((3, 8)), compute_dtype=jnp.bfloat16)
        assert out.dtype == jnp.float32


class TestNGP:
    def test_field_shapes(self):
        params = init_ngp_params(jax.random.PRNGKey(0), TINY)
        x = jax.random.uniform(jax.random.PRNGKey(1), (7, 3), minval=-1, maxval=1)
        d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (7, 1))
        sigma, rgb = ngp_field(params, TINY, x, d)
        assert sigma.shape == (7,)
        assert rgb.shape == (7, 3)
        assert bool(jnp.all(sigma >= 0))
        assert bool(jnp.all((rgb >= 0) & (rgb <= 1)))

    def test_density_matches_field(self):
        params = init_ngp_params(jax.random.PRNGKey(0), TINY)
        x = jax.random.uniform(jax.random.PRNGKey(1), (5, 3), minval=-1, maxval=1)
        d = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (5, 1))
        sigma_f, _ = ngp_field(params, TINY, x, d)
        sigma_d = ngp_density(params, TINY, x)["sigma"]
        np.testing.assert_allclose(sigma_f, sigma_d, rtol=1e-6)


class TestMessageEncoder:
    def test_effective_table_equals_per_bit_loop(self):
        """The fused effective-table reduction must equal the reference's
        per-bit table-select + interp + sum (hash_encoding_wtmk_bit.py:99-116).
        """
        D, S = 4, 8
        key = jax.random.PRNGKey(0)
        tables = init_msg_tables(key, D, 2, S)
        message = jnp.array([1, 0, 1, 1], jnp.int32)
        x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3))
        res = 16

        fused = msg_encode(tables, message, x, resolution=res,
                           log2_hashmap_size=S)

        # reference-style loop
        acc = jnp.zeros((16, 2))
        for i in range(D):
            t_i = tables[i, int(message[i])]
            acc = acc + hash_encode(x, t_i, np.array([float(res)]), S)
        np.testing.assert_allclose(fused, acc, rtol=1e-5, atol=1e-7)

    def test_gradients_only_on_selected_tables(self):
        D, S = 3, 6
        tables = init_msg_tables(jax.random.PRNGKey(0), D, 2, S)
        message = jnp.array([0, 1, 0], jnp.int32)
        x = jax.random.uniform(jax.random.PRNGKey(1), (8, 3))

        g = jax.grad(
            lambda t: jnp.sum(msg_encode(t, message, x, resolution=8,
                                         log2_hashmap_size=S) ** 2)
        )(tables)
        g = np.asarray(g)
        for i, b in enumerate([0, 1, 0]):
            assert np.abs(g[i, b]).sum() > 0      # selected table gets grads
            assert np.abs(g[i, 1 - b]).sum() == 0  # unselected does not

    def test_message_changes_output(self):
        D, S = 4, 8
        tables = init_msg_tables(jax.random.PRNGKey(0), D, 2, S)
        x = jax.random.uniform(jax.random.PRNGKey(1), (8, 3))
        m0 = jnp.zeros(D, jnp.int32)
        m1 = jnp.ones(D, jnp.int32)
        out0 = msg_encode(tables, m0, x, resolution=8, log2_hashmap_size=S)
        out1 = msg_encode(tables, m1, x, resolution=8, log2_hashmap_size=S)
        assert float(jnp.abs(out0 - out1).max()) > 0


class TestWatermarkField:
    def test_message_perturbs_only_via_last_features(self):
        wcfg = WatermarkConfig(ngp=TINY, message_dim=4,
                               msg_resolution=32, msg_log2_hashmap_size=10)
        p = init_watermark_params(jax.random.PRNGKey(0), wcfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (6, 3), minval=-1, maxval=1)
        d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (6, 1))
        msg = jnp.array([1, 0, 1, 0], jnp.int32)
        s_clean, rgb_clean = wtmk_field(p["backbone"], p["trainable"], wcfg,
                                        x, d, None)
        s_msg, rgb_msg = wtmk_field(p["backbone"], p["trainable"], wcfg,
                                    x, d, msg)
        # message features are tiny at init (U(-1e-4, 1e-4)) -> outputs close
        # but not identical
        assert float(jnp.abs(s_clean - s_msg).max()) > 0
        np.testing.assert_allclose(s_clean, s_msg, rtol=0.1, atol=1e-2)


class TestHiddenDecoder:
    def test_shapes(self):
        cfg = HiddenDecoderConfig(num_blocks=3, num_bits=1, input_ch=3,
                                  channels=8)
        params = init_hidden_decoder(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (5, 12, 12, 3))
        out = hidden_decoder_apply(params, cfg, normalize_img(x))
        assert out.shape == (5, 1)

    def test_batch_stat_norm_is_input_dependent(self):
        # track_running_stats=False semantics: output for the same image
        # differs when batch statistics change
        cfg = HiddenDecoderConfig(num_blocks=2, num_bits=1, input_ch=3,
                                  channels=4)
        params = init_hidden_decoder(jax.random.PRNGKey(0), cfg)
        a = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 8, 3))
        b = jax.random.uniform(jax.random.PRNGKey(2), (1, 8, 8, 3))
        out_solo = hidden_decoder_apply(params, cfg, a)
        out_batch = hidden_decoder_apply(
            params, cfg, jnp.concatenate([a, b], 0)
        )[:1]
        assert float(jnp.abs(out_solo - out_batch).max()) > 1e-6


class TestDistortions:
    def test_all_kinds_run_and_keep_shape(self):
        key = jax.random.PRNGKey(0)
        imgs = jax.random.uniform(key, (3, 16, 16, 3))
        for kind in ["none", "noise", "rotation", "scaling", "blurring",
                     "brightness", "crop"]:
            out = distortion_layer(key, imgs, kind)
            assert out.shape == imgs.shape, kind
            assert bool(jnp.all(jnp.isfinite(out))), kind

    def test_rotation_identity_at_zero(self):
        from nerf_signature_tpu.utils.image import rotate
        imgs = jax.random.uniform(jax.random.PRNGKey(0), (1, 8, 8, 3))
        out = rotate(imgs, jnp.zeros(1))
        np.testing.assert_allclose(out, imgs, atol=1e-5)

    def test_distortions_differentiable(self):
        key = jax.random.PRNGKey(0)
        imgs = jax.random.uniform(key, (2, 12, 12, 3))
        for kind in ["noise", "rotation", "scaling", "blurring",
                     "brightness", "crop"]:
            g = jax.grad(
                lambda im: jnp.sum(distortion_layer(key, im, kind) ** 2)
            )(imgs)
            assert bool(jnp.all(jnp.isfinite(g))), kind
            assert float(jnp.abs(g).sum()) > 0, kind
