"""On-device training loop tests (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_signature_tpu.models.ngp import NGPConfig, init_ngp_params
from nerf_signature_tpu.ops.grid import init_occupancy_grid
from nerf_signature_tpu.render.renderer import RenderConfig
from nerf_signature_tpu.train.device_loop import device_train_loop, rays_from_pixels
from nerf_signature_tpu.train.trainer import make_optimizer
from nerf_signature_tpu.data.rays import get_rays, rand_poses

TINY = NGPConfig(bound=1.0, n_levels=4, log2_hashmap_size=10,
                 finest_resolution=64, compute_dtype=jnp.float32)


class TestRaysFromPixels:
    def test_matches_host_get_rays(self):
        rng = np.random.default_rng(0)
        pose = rand_poses(rng, 1, radius=1.5)[0]
        H = W = 16
        intr = (20.0, 20.0, 8.0, 8.0)
        host = get_rays(pose[None], intr, H, W, -1)
        pix = jnp.asarray([0, 5, 100, 255])
        o, d = rays_from_pixels(jnp.asarray(pose), intr, pix, H, W)
        np.testing.assert_allclose(
            np.asarray(o), host["rays_o"][0][np.asarray(pix)], rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(d), host["rays_d"][0][np.asarray(pix)], rtol=1e-4,
            atol=1e-6,
        )


class TestDeviceLoop:
    def test_runs_and_learns(self):
        rc = RenderConfig(bound=1.0, grid_size=16, max_steps=64)
        params = init_ngp_params(jax.random.PRNGKey(0), TINY)
        optimizer = make_optimizer(2e-2, 64)
        opt_state = optimizer.init(params)
        ema = jax.tree_util.tree_map(jnp.copy, params)
        occ = init_occupancy_grid(1.0, 16)

        rng = np.random.default_rng(0)
        H = W = 24
        poses = jnp.asarray(rand_poses(rng, 4, radius=1.5))
        intr = jnp.asarray([30.0, 30.0, 12.0, 12.0])
        # constant gray target
        images = jnp.full((4, H * W, 3), 0.5)

        out = device_train_loop(
            params, ema, opt_state, occ, poses, images, intr,
            jax.random.PRNGKey(1), 0, TINY, rc, 16, optimizer.update,
            False, 0.95, 32, 64, H, W, update_interval=8,
        )
        params2, ema2, opt2, occ2, losses, mean_occ = out
        losses = np.asarray(losses)
        assert losses.shape == (32,)
        assert np.isfinite(losses).all()
        # grid was updated inside the loop (steps 0, 8, 16, 24)
        assert int(occ2.iter_density) == 4
        # learning happened
        assert losses[-4:].mean() < losses[:4].mean()
