"""Background-sphere model (bg_radius > 0).

The reference renderer calls ``self.background(sph, d)``
(``nerf/renderer.py:232-235``) but the active networks never define it and
``get_params`` references a nonexistent ``bg_net``
(``nerf/network_hash.py:164``) — ``bg_radius > 0`` crashes upstream.  Here it
is a working feature; these tests pin it down.
"""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_signature_tpu.api import NGPModel
from nerf_signature_tpu.models.ngp import (
    NGPConfig,
    init_ngp_params,
    ngp_background,
)
from nerf_signature_tpu.ops.hashenc import hash_encode_2d, init_hash_table

TINY_BG = dict(n_levels=4, log2_hashmap_size=10, finest_resolution=64,
               compute_dtype=jnp.float32, bg_radius=8.0,
               bg_log2_hashmap_size=10, bg_n_levels=2,
               bg_finest_resolution=64)


class TestHashEncode2D:
    def test_shapes_and_interp(self):
        key = jax.random.PRNGKey(0)
        table = init_hash_table(key, 2, 2, 8)
        x = jax.random.uniform(key, (17, 2))
        out = hash_encode_2d(x, table, (4.0, 16.0), 8)
        assert out.shape == (17, 4)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_continuity(self):
        # bilinear interp: nearby inputs -> nearby outputs
        key = jax.random.PRNGKey(1)
        table = init_hash_table(key, 2, 2, 8)
        x = jnp.array([[0.3, 0.7]])
        a = hash_encode_2d(x, table, (4.0, 16.0), 8)
        b = hash_encode_2d(x + 1e-5, table, (4.0, 16.0), 8)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestBackgroundModel:
    def test_params_gated_on_radius(self):
        cfg_off = NGPConfig(bound=1.0)
        p_off = init_ngp_params(jax.random.PRNGKey(0), cfg_off)
        assert "bg_net" not in p_off and "bg_table" not in p_off
        cfg_on = NGPConfig(bound=1.0, **TINY_BG)
        p_on = init_ngp_params(jax.random.PRNGKey(0), cfg_on)
        assert "bg_net" in p_on and "bg_table" in p_on

    def test_background_forward(self):
        cfg = NGPConfig(bound=1.0, **TINY_BG)
        p = init_ngp_params(jax.random.PRNGKey(0), cfg)
        o = jnp.zeros((5, 3))
        d = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (5, 1))
        rgb = ngp_background(p, cfg, o, d)
        assert rgb.shape == (5, 3)
        assert np.all((np.asarray(rgb) >= 0) & (np.asarray(rgb) <= 1))

    def test_render_uses_bg_model_for_misses(self):
        # rays that miss all occupied cells composite onto the bg model, not
        # the constant bg_color (ref run_cuda bg mixing, renderer.py:271-275)
        m = NGPModel(bound=1.0, grid_size=16, cuda_ray=True, bg_radius=8.0,
                     max_steps=32, infer_budget=8,
                     cfg=NGPConfig(bound=1.0, **TINY_BG))
        o = jnp.tile(jnp.array([0.0, 0.0, -2.0]), (4, 1))
        d = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (4, 1))
        out = m.render(np.asarray(o), np.asarray(d))
        img = np.asarray(out["image"])
        # empty grid -> weights_sum 0 -> image == bg model output, which is
        # sigmoid(MLP) of random init: not the white 1.0 constant
        assert not np.allclose(img, 1.0)
        p = init_ngp_params(jax.random.PRNGKey(0), m.cfg)
        expect = np.asarray(ngp_background(m.params, m.cfg, o, d))
        np.testing.assert_allclose(img, expect, atol=1e-5)

    def test_bg_grads_flow(self):
        from nerf_signature_tpu.ops.grid import init_occupancy_grid
        from nerf_signature_tpu.render.renderer import (
            RenderConfig,
            render_rays_occ,
        )
        from nerf_signature_tpu.models.ngp import ngp_field

        cfg = NGPConfig(bound=1.0, **TINY_BG)
        p = init_ngp_params(jax.random.PRNGKey(0), cfg)
        occ = init_occupancy_grid(1.0, 16)
        rc = RenderConfig(bound=1.0, grid_size=16, max_steps=32)
        o = jnp.tile(jnp.array([0.0, 0.0, -2.0]), (4, 1))
        d = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (4, 1))

        def loss(p):
            field = lambda x, dd: ngp_field(p, cfg, x, dd)
            bg_fn = lambda oo, dd: ngp_background(p, cfg, oo, dd)
            out = render_rays_occ(field, occ.occupancy, o, d, rc, budget=8,
                                  bg_fn=bg_fn)
            return jnp.mean(out["image"] ** 2)

        g = jax.grad(loss)(p)
        assert float(jnp.abs(g["bg_net"][0]).sum()) > 0
        assert float(jnp.abs(g["bg_table"]).sum()) > 0


class TestWatermarkBgConsistency:
    def test_wm_block_render_uses_backbone_bg(self):
        """Regression: the wm train/decode renders must composite misses onto
        the frozen backbone's bg model (like the pseudo-GT path), not onto
        constant white."""
        from nerf_signature_tpu.models.watermark import (
            WatermarkConfig,
            init_watermark_params,
        )
        from nerf_signature_tpu.ops.grid import init_occupancy_grid
        from nerf_signature_tpu.render.renderer import RenderConfig
        from nerf_signature_tpu.train.trainer_wtmk import _render_blocks

        cfg = NGPConfig(bound=1.0, **TINY_BG)
        wcfg = WatermarkConfig(ngp=cfg, message_dim=2, msg_resolution=64,
                               msg_log2_hashmap_size=10)
        p = init_watermark_params(jax.random.PRNGKey(0), wcfg)
        occ = init_occupancy_grid(1.0, 8)  # all empty -> every ray misses
        rc = RenderConfig(bound=1.0, grid_size=8, max_steps=32)
        D, bh, bw = 2, 4, 4
        ro = jnp.zeros((D, bh, bw, 3)) - 2.0
        rd = jnp.tile(jnp.array([1.0, 0, 0]), (D, bh, bw, 1))
        msg = jnp.array([0, 1], jnp.int32)
        blocks = _render_blocks(p["backbone"], p["trainable"], occ.occupancy,
                                ro, rd, msg, wcfg, rc, budget=8)
        expect = ngp_background(p["backbone"], cfg,
                                ro.reshape(-1, 3), rd.reshape(-1, 3))
        np.testing.assert_allclose(
            np.asarray(blocks).reshape(-1, 3), np.asarray(expect), atol=1e-5
        )
        assert not np.allclose(np.asarray(blocks), 1.0)
