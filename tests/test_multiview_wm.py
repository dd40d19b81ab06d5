"""Multi-view (n_views > 1) watermark extraction tests."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_signature_tpu.models.ngp import NGPConfig
from nerf_signature_tpu.models.watermark import (
    WatermarkConfig,
    init_watermark_params,
)
from nerf_signature_tpu.ops.grid import init_occupancy_grid
from nerf_signature_tpu.render.renderer import RenderConfig
from nerf_signature_tpu.train.trainer_wtmk import (
    _distort_and_normalize,
    _render_blocks,
)

TINY = NGPConfig(bound=1.0, n_levels=4, log2_hashmap_size=10,
                 finest_resolution=64, compute_dtype=jnp.float32)


class TestMultiViewBlocks:
    def test_render_blocks_multiview_shape(self):
        wcfg = WatermarkConfig(ngp=TINY, message_dim=2, n_views=3,
                               msg_resolution=64, msg_log2_hashmap_size=10)
        assert wcfg.decoder.input_ch == 9
        p = init_watermark_params(jax.random.PRNGKey(0), wcfg)
        occ = init_occupancy_grid(1.0, 8)
        occupancy = occ.occupancy.at[:].set(True)
        rc = RenderConfig(bound=1.0, grid_size=8, max_steps=32)

        D, V, bh, bw = 2, 3, 4, 4
        rng = np.random.default_rng(0)
        ro = np.zeros((D, V, bh, bw, 3), np.float32) - 2.0
        rd = np.tile(np.array([1, 0, 0], np.float32), (D, V, bh, bw, 1))
        msg = jnp.array([0, 1], jnp.int32)
        blocks = _render_blocks(
            p["backbone"], p["trainable"], occupancy,
            jnp.asarray(ro), jnp.asarray(rd), msg, wcfg, rc, budget=8,
        )
        assert blocks.shape == (D, bh, bw, V * 3)

    def test_distort_normalize_multiview(self):
        key = jax.random.PRNGKey(0)
        blocks = jax.random.uniform(key, (2, 8, 8, 9))  # V=3
        for kind in ("none", "noise", "brightness"):
            out = _distort_and_normalize(key, blocks, kind)
            assert out.shape == blocks.shape

    def test_single_view_normalization_matches(self):
        from nerf_signature_tpu.models.hidden import normalize_img
        key = jax.random.PRNGKey(0)
        blocks = jax.random.uniform(key, (2, 8, 8, 3))
        out = _distort_and_normalize(key, blocks, "none")
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(normalize_img(blocks)), rtol=1e-6
        )
