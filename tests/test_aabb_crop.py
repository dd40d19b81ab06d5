"""Inference aabb-crop (the reference GUI's aabb_infer sliders,
``nerf/gui.py:355-427``): ``model.set_aabb_crop`` tightens the render
paths' near/far clip without touching training."""

import jax.numpy as jnp
import numpy as np

from nerf_signature_tpu.api import NGPModel
from nerf_signature_tpu.models.ngp import NGPConfig


def _tiny_model():
    cfg = NGPConfig(bound=1.0, n_levels=4, log2_hashmap_size=10,
                    finest_resolution=64, compute_dtype=jnp.float32)
    m = NGPModel(cfg, grid_size=16, max_steps=64, train_budget=16,
                 infer_budget=16, min_near=0.05)
    m.occ = m.occ._replace(occupancy=m.occ.occupancy.at[:].set(True))
    return m


def _rays(n=64):
    rng = np.random.default_rng(0)
    ro = np.asarray(rng.normal(0, 0.05, (n, 3)), np.float32)
    ro[:, 0] -= 2.0
    rd = np.asarray(rng.normal([1.0, 0, 0], 0.02, (n, 3)), np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    return jnp.asarray(ro), jnp.asarray(rd)


def test_crop_excluding_content_renders_background():
    m = _tiny_model()
    ro, rd = _rays()
    full = m.render(ro, rd, bg_color=np.ones((1, 3), np.float32))
    assert float(jnp.max(full["weights_sum"])) > 0.01  # content hit

    # crop box far from every ray's path -> pure background
    m.set_aabb_crop([0.8, 0.8, 0.8, 1.0, 1.0, 1.0])
    cropped = m.render(ro, rd, bg_color=np.ones((1, 3), np.float32))
    np.testing.assert_allclose(np.asarray(cropped["weights_sum"]), 0.0,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(cropped["image"]), 1.0, atol=1e-5)


def test_full_crop_matches_uncropped():
    m = _tiny_model()
    ro, rd = _rays()
    base = m.render(ro, rd, bg_color=np.ones((1, 3), np.float32))
    m.set_aabb_crop([-1, -1, -1, 1, 1, 1])
    same = m.render(ro, rd, bg_color=np.ones((1, 3), np.float32))
    np.testing.assert_allclose(np.asarray(same["image"]),
                               np.asarray(base["image"]), atol=1e-5)
    m.set_aabb_crop(None)
    assert m.aabb_infer is None


def test_crop_clamps_to_bound_and_orders_corners():
    m = _tiny_model()
    m.set_aabb_crop([-5, 0.5, 0, 5, -0.5, 0.2])  # out of range + inverted y
    box = np.asarray(m.aabb_infer)
    assert box[0] == -1.0 and box[3] == 1.0      # clamped to bound
    assert box[4] > box[1]                       # hi >= lo enforced
