"""Multi-device tests on the 8-virtual-CPU-device mesh (conftest sets
xla_force_host_platform_device_count=8)."""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_signature_tpu.api import NGPModel
from nerf_signature_tpu.models.ngp import NGPConfig
from nerf_signature_tpu.parallel.mesh import (
    make_mesh,
    make_sharded_train_step,
    replicate,
    shard_rays,
)
from nerf_signature_tpu.render.renderer import RenderConfig
from nerf_signature_tpu.train.trainer import Trainer, make_optimizer

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

TINY = NGPConfig(bound=1.0, n_levels=4, log2_hashmap_size=10,
                 finest_resolution=64, compute_dtype=jnp.float32)


def _rays(n, rng):
    o = np.asarray(rng.normal(0, 0.1, (n, 3)) - [2.0, 0, 0], np.float32)
    d = np.asarray(rng.normal([1.0, 0, 0], 0.05, (n, 3)), np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


class TestShardedStep:
    def test_matches_single_device(self):
        """The 8-way sharded step must produce the same loss/params as the
        unsharded computation (same program, different partitioning)."""
        from nerf_signature_tpu.models.ngp import init_ngp_params
        from nerf_signature_tpu.ops.grid import init_occupancy_grid

        rc = RenderConfig(bound=1.0, grid_size=16, max_steps=64)
        mesh = make_mesh(8)
        optimizer = make_optimizer(1e-2, 100)
        params = init_ngp_params(jax.random.PRNGKey(0), TINY)
        opt_state = optimizer.init(params)
        occ = init_occupancy_grid(1.0, 16)
        occupancy = occ.occupancy.at[:].set(True)

        rng = np.random.default_rng(0)
        n = 64
        o, d = _rays(n, rng)
        gt = np.full((n, 3), 0.5, np.float32)
        key = jax.random.PRNGKey(1)

        # single-device reference of the identical math (computed FIRST:
        # the sharded step donates its param buffers)
        from nerf_signature_tpu.models.ngp import ngp_field
        from nerf_signature_tpu.render.renderer import render_rays_occ

        def loss_fn(p):
            field = lambda x, dd: ngp_field(p, TINY, x, dd)
            out = render_rays_occ(field, occupancy, jnp.asarray(o),
                                  jnp.asarray(d), rc, budget=16,
                                  bg_color=1.0, perturb_key=key)
            return jnp.mean((out["image"] - gt) ** 2)

        loss_ref = float(loss_fn(params))

        step = make_sharded_train_step(mesh, TINY, rc, 16, optimizer)
        p_r = replicate(mesh, jax.tree_util.tree_map(jnp.copy, params))
        os_r = replicate(mesh, opt_state)
        occ_r = replicate(mesh, occupancy)
        ro, rd, g = shard_rays(mesh, (jnp.asarray(o), jnp.asarray(d),
                                      jnp.asarray(gt)))
        p1, _, loss_sharded = step(p_r, os_r, occ_r, ro, rd, g, key)
        np.testing.assert_allclose(float(loss_sharded), float(loss_ref),
                                   rtol=1e-4)

        # updated params replicated across devices & finite
        leaf = jax.tree_util.tree_leaves(p1)[0]
        assert bool(jnp.all(jnp.isfinite(leaf)))

    def test_trainer_with_devices_flag(self, tmp_path):
        """Trainer end-to-end with opt.devices=8 on the virtual mesh."""
        model = NGPModel(TINY, grid_size=16, max_steps=64, train_budget=16,
                         infer_budget=16)
        opt = types.SimpleNamespace(
            lr=1e-2, iters=4, max_steps=64, update_extra_interval=16,
            max_ray_batch=512, devices=8, num_rays=64, color_space="srgb",
        )
        tr = Trainer("par", opt, model, workspace=None,
                     use_checkpoint="scratch", mute=True)
        rng = np.random.default_rng(0)

        class Loader:
            error_map = None

            def __iter__(self):
                for _ in range(4):
                    o, d = _rays(64, rng)
                    yield {
                        "rays_o": o, "rays_d": d,
                        "images": np.full((1, 64, 3), 0.5, np.float32),
                    }

        avg = tr.train_one_epoch(Loader())
        assert np.isfinite(avg)
        assert tr.global_step == 4


class TestWatermarkTrainerMultiDevice:
    def test_wm_train_step_8way(self):
        from nerf_signature_tpu.api import WatermarkModel
        from nerf_signature_tpu.models.watermark import WatermarkConfig
        from nerf_signature_tpu.train.trainer_wtmk import WatermarkTrainer

        D, bh, bw = 2, 4, 4
        wcfg = WatermarkConfig(ngp=TINY, message_dim=D,
                               msg_resolution=64, msg_log2_hashmap_size=10)
        model = WatermarkModel(wcfg, grid_size=16, max_steps=32,
                               train_budget=8, infer_budget=8)
        model.occ = model.occ._replace(
            occupancy=model.occ.occupancy.at[:].set(True)
        )
        opt = types.SimpleNamespace(
            seed=0, iters=4, lr=1e-2, lambda_w=0.02, lambda_i=1.0,
            loss_w="bce", distortion="none", message_dim=D,
            devices=8, num_rays=64,
        )
        tr = WatermarkTrainer("wm_par", opt, model, workspace=None,
                              use_checkpoint="scratch", mute=True)
        assert tr.mesh is not None

        rng = np.random.default_rng(0)
        o, d = _rays(64, rng)
        ro_b = np.zeros((D, bh, bw, 3), np.float32) - 2.0
        rd_b = np.tile(np.array([1, 0, 0], np.float32), (D, bh, bw, 1))
        data = {
            "watermark": {"rays_o_block": ro_b, "rays_d_block": rd_b},
            "content": {
                "rays_o": o, "rays_d": d,
                "images": np.full((64, 3), 0.5, np.float32),
            },
        }
        before = jax.tree_util.tree_map(np.asarray, model.trainable)
        msg = tr.random_message()
        loss, lossw, lossi, decoded = tr.train_step_data(data, msg)
        assert np.isfinite(float(loss))
        assert np.isfinite(float(lossw)) and np.isfinite(float(lossi))
        # trainable params actually updated under the sharded step
        changed = any(
            not np.array_equal(a, np.asarray(b))
            for a, b in zip(
                jax.tree_util.tree_leaves(before),
                jax.tree_util.tree_leaves(model.trainable),
            )
        )
        assert changed
