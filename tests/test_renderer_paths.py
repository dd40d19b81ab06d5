"""Cross-validation of the two render paths (fixed-step `run` vs
occupancy-grid `run_cuda` equivalents) on an analytic density field."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_signature_tpu.ops.grid import OccupancyGrid
from nerf_signature_tpu.render.renderer import (
    RenderConfig,
    render_rays_fixed,
    render_rays_occ,
)


def _ball_density(x):
    """Analytic solid ball: sigma=60 inside radius 0.4."""
    r = jnp.linalg.norm(x, axis=-1)
    return jnp.where(r < 0.4, 60.0, 0.0)


def _density_fn(x):
    return {"sigma": _ball_density(x),
            "geo_feat": jnp.zeros((x.shape[0], 4))}


def _color_fn(x, d, geo):
    # position-dependent color
    return jnp.stack([
        0.5 + 0.5 * jnp.sin(3 * x[:, 0]),
        jnp.full(x.shape[0], 0.4),
        jnp.full(x.shape[0], 0.6),
    ], axis=-1)


def _field_fn(x, d):
    return _ball_density(x), _color_fn(x, d, None)


def _rays(n=64):
    rng = np.random.default_rng(0)
    o = rng.normal(0, 1, (n, 3))
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2.0
    d = rng.normal(0, 0.2, (n, 3)) - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


class TestPathConsistency:
    def test_fixed_vs_occ_agree(self):
        H = 32
        r = (np.arange(H) + 0.5) / H * 2 - 1
        x, y, z = np.meshgrid(r, r, r, indexing="ij")
        ball = (x**2 + y**2 + z**2) < 0.45**2  # slightly dilated occupancy
        occupancy = jnp.asarray(ball[None])

        rays_o, rays_d = _rays(64)
        rc_occ = RenderConfig(bound=1.0, grid_size=H, max_steps=512)
        rc_fix = RenderConfig(bound=1.0, grid_size=H, num_steps=256,
                              upsample_steps=0)

        out_occ = render_rays_occ(
            _field_fn, occupancy, rays_o, rays_d, rc_occ, budget=256,
            bg_color=1.0,
        )
        out_fix = render_rays_fixed(
            _density_fn, _color_fn, rays_o, rays_d, rc_fix, bg_color=1.0,
        )
        img_o = np.asarray(out_occ["image"])
        img_f = np.asarray(out_fix["image"])
        # both paths must produce very similar images (different sampling
        # grids -> small differences at the silhouette)
        assert np.mean(np.abs(img_o - img_f)) < 0.02
        np.testing.assert_allclose(
            np.asarray(out_occ["weights_sum"]),
            np.asarray(out_fix["weights_sum"]), atol=0.08,
        )

    def test_fixed_upsampling_runs(self):
        rays_o, rays_d = _rays(16)
        rc = RenderConfig(bound=1.0, num_steps=32, upsample_steps=32)
        out = render_rays_fixed(
            _density_fn, _color_fn, rays_o, rays_d, rc, bg_color=1.0,
            upsample_key=jax.random.PRNGKey(0),
        )
        assert out["image"].shape == (16, 3)
        assert bool(jnp.all(jnp.isfinite(out["image"])))
