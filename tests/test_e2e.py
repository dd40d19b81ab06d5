"""End-to-end integration: tiny Blender-format dataset on disk -> clean NGP
training (provider + trainer) -> watermark stage (self-distillation provider,
codebook embed, HiDDeN extract, bit accuracy).  SURVEY.md §4's "fake-scene
convergence on CPU" tests."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_signature_tpu.api import NGPModel, WatermarkModel
from nerf_signature_tpu.data.provider import NeRFDataset
from nerf_signature_tpu.data.provider_wtmk import NeRFDatasetDisen
from nerf_signature_tpu.data.rays import get_rays, rand_poses
from nerf_signature_tpu.models.ngp import NGPConfig
from nerf_signature_tpu.models.watermark import WatermarkConfig
from nerf_signature_tpu.train.metrics import BitAccMeter, PSNRMeter
from nerf_signature_tpu.train.trainer import Trainer
from nerf_signature_tpu.train.trainer_wtmk import WatermarkTrainer

H = W = 48
FOCAL_ANGLE = 0.8  # camera_angle_x


def _ball_gt(rays_o, rays_d):
    """Analytic scene: solid colored ball radius 0.4 at origin + alpha."""
    b = np.sum(rays_o * rays_d, -1)
    c = np.sum(rays_o * rays_o, -1) - 0.4**2
    disc = b * b - c
    hit = disc > 0
    rgba = np.zeros((*rays_o.shape[:-1], 4), np.float32)
    # color varies with hit position for texture
    t = -b - np.sqrt(np.maximum(disc, 0))
    p = rays_o + t[..., None] * rays_d
    rgba[..., 0] = np.where(hit, 0.6 + 0.4 * np.sin(8 * p[..., 0]), 0)
    rgba[..., 1] = np.where(hit, 0.5 + 0.5 * np.cos(7 * p[..., 1]), 0)
    rgba[..., 2] = np.where(hit, 0.3, 0)
    rgba[..., 3] = hit.astype(np.float32)
    return np.clip(rgba, 0, 1)


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("ball_scene")
    rng = np.random.default_rng(0)
    for split, n in [("train", 8), ("val", 1), ("test", 2)]:
        frames = []
        poses = rand_poses(rng, n, radius=1.8)
        for i, pose in enumerate(poses):
            # provider converts nerf->ngp; invert that here so get_rays(ngp(pose))
            # reproduces this exact pose with scale=1
            inv = np.eye(4, dtype=np.float32)
            inv[0] = [pose[2, 0], -pose[2, 1], -pose[2, 2], pose[2, 3]]
            inv[1] = [pose[0, 0], -pose[0, 1], -pose[0, 2], pose[0, 3]]
            inv[2] = [pose[1, 0], -pose[1, 1], -pose[1, 2], pose[1, 3]]
            fl = W / (2 * np.tan(FOCAL_ANGLE / 2))
            rays = get_rays(pose[None], (fl, fl, W / 2, H / 2), H, W, -1)
            rgba = _ball_gt(rays["rays_o"][0], rays["rays_d"][0])
            rgba = rgba.reshape(H, W, 4)
            img8 = (rgba * 255).astype(np.uint8)
            fname = f"r_{split}_{i}.png"
            cv2.imwrite(str(root / fname), cv2.cvtColor(img8, cv2.COLOR_RGBA2BGRA))
            frames.append({
                "file_path": fname,
                "transform_matrix": inv.tolist(),
            })
        with open(root / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": FOCAL_ANGLE, "frames": frames}, f)
    return str(root)


def _make_opt(path, tmpdir, **kw):
    import types

    d = dict(
        path=path, seed=0, iters=200, lr=2e-2, num_rays=512, cuda_ray=True,
        max_steps=256, num_steps=64, upsample_steps=0,
        update_extra_interval=16, max_ray_batch=2048, patch_size=1,
        fp16=False, color_space="srgb", preload=False, bound=1.0, scale=1.0,
        offset=[0, 0, 0], dt_gamma=0.0, min_near=0.05, density_thresh=0.01,
        bg_radius=-1, error_map=False, rand_pose=-1, workspace=tmpdir,
        lambda_w=0.02, lambda_i=1.0, loss_w="bce", distortion="none",
        message_dim=4, n_views=1, num_rows=4, num_cols=4, downscale=1,
    )
    d.update(kw)
    return types.SimpleNamespace(**d)


@pytest.fixture(scope="module")
def trained_clean(dataset_dir, tmp_path_factory):
    ws = str(tmp_path_factory.mktemp("ws_clean"))
    opt = _make_opt(dataset_dir, ws)
    cfg = NGPConfig(bound=1.0, n_levels=8, log2_hashmap_size=14,
                    finest_resolution=128, compute_dtype=jnp.float32)
    model = NGPModel(cfg, grid_size=32, max_steps=256, train_budget=64,
                     infer_budget=96, min_near=0.05, density_thresh=0.01)
    trainer = Trainer("e2e", opt, model, workspace=ws,
                      use_checkpoint="scratch", eval_interval=1000,
                      mute=True)
    loader = NeRFDataset(opt, type="train").dataloader()
    trainer.train(loader, None, max_epochs=25)
    return model, trainer, opt, loader


class TestCleanEndToEnd:
    def test_loss_decreases(self, trained_clean):
        _, trainer, _, _ = trained_clean
        losses = trainer.stats["loss"]
        assert losses[-1] < losses[0] * 0.5

    def test_psnr_on_val(self, trained_clean, dataset_dir):
        model, trainer, opt, _ = trained_clean
        val = NeRFDataset(opt, type="val").dataloader()
        meter = PSNRMeter()
        for data in val:
            images = np.asarray(data["images"])
            B, h, w, C = images.shape
            gt = images[..., :3] * images[..., 3:] + (1 - images[..., 3:])
            out = model.render(jnp.asarray(data["rays_o"]),
                               jnp.asarray(data["rays_d"]),
                               staged=True, max_ray_batch=2048)
            pred = np.asarray(out["image"]).reshape(B, h, w, 3)
            meter.update(pred, gt)
        psnr = meter.measure()
        assert psnr > 16.0, f"PSNR too low: {psnr}"

    def test_checkpoint_roundtrip(self, trained_clean, tmp_path):
        model, trainer, opt, _ = trained_clean
        path = trainer.save_checkpoint(full=True)
        params_before = jax.tree_util.tree_map(np.asarray, model.params)
        # perturb then restore
        model.params = jax.tree_util.tree_map(lambda x: x * 0, model.params)
        trainer.load_checkpoint(path)
        for a, b in zip(
            jax.tree_util.tree_leaves(params_before),
            jax.tree_util.tree_leaves(model.params),
        ):
            np.testing.assert_array_equal(a, np.asarray(b))


class TestWatermarkEndToEnd:
    @pytest.fixture(scope="class")
    def wtmk_setup(self, trained_clean, dataset_dir, tmp_path_factory):
        clean_model, _, _, _ = trained_clean
        ws = str(tmp_path_factory.mktemp("ws_wm"))
        opt = _make_opt(dataset_dir, ws, iters=60, lr=1e-2, num_rays=256)
        wcfg = WatermarkConfig(
            ngp=NGPConfig(bound=1.0, n_levels=8, log2_hashmap_size=14,
                          finest_resolution=128,
                          compute_dtype=jnp.float32),
            message_dim=4, n_views=1,
            msg_resolution=128, msg_log2_hashmap_size=14,
        )
        model = WatermarkModel(wcfg, grid_size=32, max_steps=256,
                               train_budget=64, infer_budget=96,
                               min_near=0.05)
        model.backbone = clean_model.params  # cross-stage ingestion
        model.occ = clean_model.occ
        trainer = WatermarkTrainer("e2e_wm", opt, model, workspace=ws,
                                   use_checkpoint="scratch", mute=True)
        keyposes = os.path.join(ws, "key_poses.npy")
        keyblocks = os.path.join(ws, "key_blocks.npy")
        loader = NeRFDatasetDisen(
            opt, keyposes_dir=None, keyposes_save_dir=keyposes,
            keyblocks_dir=None, keyblocks_save_dir=keyblocks,
            pretrained_model=model, type="train", n_views=1, n_test=8,
            message_dim=4, num_rows=4, num_cols=4,
        ).dataloader()
        return model, trainer, loader, opt, (keyposes, keyblocks)

    def test_key_material_persisted(self, wtmk_setup):
        _, _, loader, _, (keyposes, keyblocks) = wtmk_setup
        assert os.path.exists(keyposes) and os.path.exists(keyblocks)
        assert loader.rays_o_block.shape[0] == 4  # message_dim blocks
        assert loader.images_block.shape == loader.rays_o_block.shape

    def test_training_reduces_watermark_loss(self, wtmk_setup):
        model, trainer, loader, opt, _ = wtmk_setup
        trainer.train(loader, None, None, max_epochs=8)
        lossw = trainer.stats["lossw"]
        assert np.isfinite(lossw).all()
        assert lossw[-1] < lossw[0], f"lossw did not decrease: {lossw}"

    def test_bitacc_protocol(self, wtmk_setup, dataset_dir, tmp_path_factory):
        model, trainer, _, opt, (keyposes, keyblocks) = wtmk_setup
        bit_loader = NeRFDatasetDisen(
            opt, keyposes_dir=keyposes, keyposes_save_dir=None,
            keyblocks_dir=keyblocks, keyblocks_save_dir=None,
            pretrained_model=model, type="test", n_views=1, n_test=6,
            message_dim=4, num_rows=4, num_cols=4,
        ).dataloader()
        acc = trainer.test_bitacc(bit_loader)
        assert 0.0 <= acc <= 1.0
        assert trainer.metrics_message[0].N == 6
