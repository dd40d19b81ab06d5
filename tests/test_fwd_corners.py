"""Forward corner subsampling (``fwd_corners=1``).

The train-step-only population-reduction lever against the step's largest
engine term, the 8-corner forward row gathers (PERF.md rounds 3-4): instead
of the exact trilinear sum, gather ONLY the weight-sampled corner per
(level, sample) — corner c is picked with probability equal to its trilinear
weight cw_c, so the one-row output is an unbiased one-sample importance
estimate of the interpolation (E[row_chosen] = sum_c cw_c * row_c) with 8x
fewer forward gather rows.  Eval/render paths must always stay at the exact
8-corner interpolation; the trainers scope the reduced config to the
optimisation step only (``Trainer.cfg_train``).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_signature_tpu.ops.hashenc import hash_encode, init_hash_table

RES = (4.0, 8.0)
S = 6


class TestFwdCornersEstimator:
    def test_requires_stochastic_grad(self):
        key = jax.random.PRNGKey(0)
        table = init_hash_table(key, 2, 2, S)
        x = jax.random.uniform(key, (16, 3))
        with pytest.raises(ValueError, match="stochastic_grad"):
            hash_encode(x, table, RES, S, fwd_corners=1)
        with pytest.raises(ValueError, match="fwd_corners"):
            hash_encode(x, table, RES, S, stochastic_grad=True, fwd_corners=4)

    def test_forward_unbiased_aggregate(self):
        """Mean one-corner output over uniform samples converges to the mean
        exact trilinear output (estimator unbiased over the position-hash
        draw)."""
        key = jax.random.PRNGKey(1)
        k1, k2 = jax.random.split(key)
        table = init_hash_table(k1, 2, 2, S)
        # widen the table values so the corner rows genuinely differ
        table = table * 1e4
        x = jax.random.uniform(k2, (200_000, 3))
        exact = np.asarray(hash_encode(x, table, RES, S)).mean(0)
        sub = np.asarray(
            hash_encode(x, table, RES, S, stochastic_grad=True,
                        fwd_corners=1)
        ).mean(0)
        scale = np.abs(exact).mean() + 1e-9
        np.testing.assert_allclose(sub / scale, exact / scale, atol=2e-2)

    def test_forward_rows_come_from_the_cell(self):
        """Every one-corner output equals SOME corner row of the sample's
        cell (the estimator gathers real rows, no blending)."""
        key = jax.random.PRNGKey(2)
        table = init_hash_table(key, 1, 2, S) * 1e4
        x = jax.random.uniform(key, (512, 3))
        res1 = (4.0,)
        sub = np.asarray(hash_encode(x, table, res1, S,
                                     stochastic_grad=True, fwd_corners=1))
        tab = np.asarray(table)
        # brute-force: for each sample, one of the 8 corner rows must match
        from nerf_signature_tpu.ops.hashenc import _CORNERS, _hash3

        cell = np.floor(np.asarray(x) * 4.0).astype(np.uint32)
        ok = np.zeros(len(sub), bool)
        for (di, dj, dk) in _CORNERS:
            idx = np.asarray(_hash3(
                jnp.asarray(cell[:, 0] + di, jnp.uint32),
                jnp.asarray(cell[:, 1] + dj, jnp.uint32),
                jnp.asarray(cell[:, 2] + dk, jnp.uint32), S))
            ok |= np.all(np.isclose(sub, tab[idx], atol=1e-4), axis=1)
        assert ok.all()

    def test_gradient_unbiased_aggregate(self):
        key = jax.random.PRNGKey(3)
        k1, k2 = jax.random.split(key)
        table = init_hash_table(k1, 2, 2, S)
        x = jax.random.uniform(k2, (50_000, 3))

        def loss(t, fc):
            return jnp.sum(hash_encode(x, t, RES, S, stochastic_grad=True,
                                       fwd_corners=fc))

        g_exact = np.asarray(jax.grad(
            lambda t: jnp.sum(hash_encode(x, t, RES, S)))(table))
        g_sub = np.asarray(jax.grad(lambda t: loss(t, 1))(table))
        a, b = g_exact.ravel(), g_sub.ravel()
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
        assert cos > 0.98, cos
        # one unit of cotangent mass lands per (level, sample) either way
        np.testing.assert_allclose(a.sum(), b.sum(), rtol=1e-3)

    def test_composes_with_level_stride(self):
        key = jax.random.PRNGKey(4)
        table = init_hash_table(key, 2, 2, S)
        x = jax.random.uniform(key, (4096, 3))
        out = hash_encode(x, table, RES, S, stochastic_grad=True,
                          fwd_corners=1, level_stride=2)
        assert out.shape == (4096, 4)
        g = np.asarray(jax.grad(
            lambda t: jnp.sum(hash_encode(x, t, RES, S, stochastic_grad=True,
                                          fwd_corners=1, level_stride=2))
        )(table))
        per_level = np.abs(g).reshape(2, -1).sum(axis=1)
        assert (per_level > 0).all(), per_level


class TestTrainerScoping:
    def _opt(self, tmp_path, **kw):
        import argparse

        from nerf_signature_tpu.utils.config import add_common_args

        parser = argparse.ArgumentParser()
        add_common_args(parser)
        argv = ["data", "--workspace", str(tmp_path), "--cpu", "--cuda_ray"]
        for k, v in kw.items():
            if v is True:
                argv.append(f"--{k}")
            else:
                argv += [f"--{k}", str(v)]
        return parser.parse_args(argv)

    def _model(self, opt):
        from nerf_signature_tpu.api import NGPModel
        from nerf_signature_tpu.models.ngp import NGPConfig

        cfg = NGPConfig(bound=1.0,
                        stochastic_hash_grad=opt.stochastic_hash_grad)
        return NGPModel(cfg, grid_size=opt.grid_size,
                        max_steps=opt.max_steps,
                        train_budget=opt.train_budget)

    def test_cli_flag_parses(self, tmp_path):
        opt = self._opt(tmp_path, hash_fwd_corners=1,
                        stochastic_hash_grad=True)
        assert opt.hash_fwd_corners == 1

    def test_trainer_scopes_to_step_only(self, tmp_path):
        """Trainer.cfg_train carries fwd_corners=1; model.cfg (every
        eval/render path) stays exact 8."""
        from nerf_signature_tpu.train.trainer import Trainer

        opt = self._opt(tmp_path, hash_fwd_corners=1,
                        stochastic_hash_grad=True, grid_size=32,
                        train_budget=32, max_steps=64, iters=10, num_rays=64)
        model = self._model(opt)
        tr = Trainer("ngp", opt, model, workspace=str(tmp_path))
        assert tr.cfg_train.hash_fwd_corners == 1
        assert model.cfg.hash_fwd_corners == 8

    def test_trainer_rejects_without_stochastic(self, tmp_path):
        from nerf_signature_tpu.train.trainer import Trainer

        opt = self._opt(tmp_path, hash_fwd_corners=1, grid_size=32,
                        train_budget=32, max_steps=64, iters=10, num_rays=64)
        model = self._model(opt)
        with pytest.raises(ValueError, match="stochastic"):
            Trainer("ngp", opt, model, workspace=str(tmp_path))

    def test_wm_trainer_scopes_to_step_only(self):
        """WatermarkTrainer.wcfg_train carries fwd_corners=1 while
        model.wcfg (decode/eval paths) stays exact; a train step runs."""
        import types

        from nerf_signature_tpu.api import WatermarkModel
        from nerf_signature_tpu.models.ngp import NGPConfig
        from nerf_signature_tpu.models.watermark import WatermarkConfig
        from nerf_signature_tpu.train.trainer_wtmk import WatermarkTrainer

        def build(stochastic, fwd):
            cfg = NGPConfig(bound=1.0, n_levels=4, log2_hashmap_size=10,
                            finest_resolution=64,
                            compute_dtype=jnp.float32,
                            stochastic_hash_grad=stochastic)
            wcfg = WatermarkConfig(ngp=cfg, message_dim=2, msg_resolution=64,
                                   msg_log2_hashmap_size=10)
            model = WatermarkModel(wcfg, grid_size=16, max_steps=64,
                                   train_budget=16, infer_budget=16)
            model.occ = model.occ._replace(
                occupancy=model.occ.occupancy.at[:].set(True))
            opt = types.SimpleNamespace(
                seed=0, iters=4, lr=1e-2, lambda_w=0.5, lambda_i=1.0,
                loss_w="bce", distortion="none", message_dim=2, devices=0,
                num_rays=16, hash_fwd_corners=fwd)
            return model, WatermarkTrainer(
                "fwd", opt, model, workspace=None,
                use_checkpoint="scratch", mute=True)

        model, tr = build(True, 1)
        assert tr.wcfg_train.ngp.hash_fwd_corners == 1
        assert model.wcfg.ngp.hash_fwd_corners == 8

        # EFFECT check (not just config fields): the wm field must actually
        # consult the knob — one-corner encodes differ from exact trilinear
        # once the table rows are non-tiny
        from nerf_signature_tpu.models.watermark import _encode_with_message

        bb = dict(model.backbone,
                  hash_table=model.backbone["hash_table"] * 1e4)
        x = jnp.asarray(np.random.default_rng(0).uniform(
            -0.9, 0.9, (256, 3)).astype(np.float32))
        f_sub = _encode_with_message(bb, model.trainable, tr.wcfg_train, x,
                                     None)
        f_exact = _encode_with_message(bb, model.trainable, model.wcfg, x,
                                       None)
        assert not np.allclose(np.asarray(f_sub), np.asarray(f_exact)), \
            "fwd_corners=1 did not reach the wm field's hash encode"

        rng = np.random.default_rng(3)
        D, bh, bw = 2, 4, 4
        data = {
            "watermark": {
                "rays_o_block": np.zeros((D, bh, bw, 3), np.float32) - 2.0,
                "rays_d_block": np.tile(np.array([1, 0, 0], np.float32),
                                        (D, bh, bw, 1)),
            },
            "content": {
                "rays_o": np.zeros((16, 3), np.float32) - 2.0,
                "rays_d": np.tile(np.array([1, 0, 0], np.float32), (16, 1)),
                "images": rng.random((16, 3)).astype(np.float32),
            },
        }
        loss, lossw, lossi, _ = tr.train_step_data(
            data, np.array([0, 1], np.int32))
        assert np.isfinite(float(loss))

        with pytest.raises(ValueError, match="stochastic"):
            build(False, 1)

    def test_device_loop_trains_with_fwd_corners(self):
        """A few on-device steps with the subsampled forward: finite losses,
        the hash table moves, occupancy maintenance (exact-field queries)
        still runs."""
        from nerf_signature_tpu.data.rays import get_rays, rand_poses
        from nerf_signature_tpu.models.ngp import NGPConfig, init_ngp_params
        from nerf_signature_tpu.ops.grid import init_occupancy_grid
        from nerf_signature_tpu.render.renderer import RenderConfig
        from nerf_signature_tpu.train.device_loop import device_train_loop
        from nerf_signature_tpu.train.trainer import make_optimizer

        cfg = NGPConfig(bound=1.0, stochastic_hash_grad=True,
                        hash_fwd_corners=1)
        rc = RenderConfig(bound=1.0, grid_size=32, max_steps=64)
        params = init_ngp_params(jax.random.PRNGKey(0), cfg)
        optimizer = make_optimizer(1e-2, 100)
        opt_state = optimizer.init(params)
        ema = jax.tree_util.tree_map(jnp.copy, params)
        occ = init_occupancy_grid(1.0, rc.grid_size)

        H = W = 32
        rng = np.random.default_rng(0)
        poses = rand_poses(rng, 2, radius=1.8)
        intr = np.array([W / 1.2, W / 1.2, W / 2, H / 2], np.float32)
        rays = get_rays(poses, intr, H, W, -1)
        o = np.asarray(rays["rays_o"])
        imgs = np.concatenate(
            [np.full((2, H * W, 3), 0.5, np.float32),
             np.ones((2, H * W, 1), np.float32)], -1)

        t0 = np.asarray(params["hash_table"])  # the loop donates params
        out = device_train_loop(
            params, ema, opt_state, occ, jnp.asarray(poses),
            jnp.asarray(imgs), jnp.asarray(intr), jax.random.PRNGKey(1), 0,
            cfg, rc, 32, optimizer.update, True, 0.95, 4, 64, H, W,
            update_interval=2,
        )
        losses = np.asarray(out[4])
        assert np.isfinite(losses).all()
        assert float(jnp.abs(out[0]["hash_table"] - jnp.asarray(t0)).sum()) > 0
