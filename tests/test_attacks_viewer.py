"""Tests for attack ops, the attack registry, the viewer camera, and CLIP
loss gating."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_signature_tpu.utils.attacks import (
    ATTACKS,
    adjust_brightness,
    adjust_contrast,
    center_crop,
    clamp_pixel,
    jpeg_compress,
    project_linf,
    psnr,
    resize_attack,
    round_pixel,
)
from nerf_signature_tpu.viewer import OrbitCamera


def _img(b=2, h=16, w=16):
    return jax.random.uniform(jax.random.PRNGKey(0), (b, h, w, 3))


class TestAttackOps:
    def test_round_pixel_quantises(self):
        x = _img()
        y = round_pixel(x)
        lattice = jnp.round(np.asarray(y) * 255) / 255
        np.testing.assert_allclose(y, lattice, atol=1e-6)
        # straight-through gradient
        g = jax.grad(lambda im: jnp.sum(round_pixel(im)))(x)
        np.testing.assert_allclose(np.asarray(g), 1.0)

    def test_project_linf(self):
        x, y = _img(), _img() * 0 + 0.5
        z = project_linf(x, y, radius=2.0)
        assert float(jnp.abs(z - y).max()) <= 2.0 / 255 + 1e-6

    def test_psnr_identity(self):
        x = _img()
        assert float(psnr(x, x)) > 100

    def test_center_crop_zeroes_border(self):
        x = jnp.ones((1, 16, 16, 3))
        y = center_crop(x, 0.25)
        assert float(y[0, 0, 0, 0]) == 0.0
        assert float(y[0, 8, 8, 0]) == 1.0
        # kept area ~ 25%
        frac = float(jnp.mean(y))
        assert 0.15 < frac < 0.35

    def test_contrast_brightness(self):
        x = _img()
        assert float(jnp.std(adjust_contrast(x, 0.5))) < float(jnp.std(x))
        assert float(jnp.mean(adjust_brightness(x, 0.5))) < float(jnp.mean(x))

    def test_resize_attack_lowpasses(self):
        x = _img(1, 16, 16)
        y = resize_attack(x, 0.25)
        assert y.shape == x.shape
        assert float(jnp.abs(y - x).mean()) > 0

    def test_registry_runs_all(self):
        x = _img()
        key = jax.random.PRNGKey(1)
        for name, fn in ATTACKS.items():
            out = fn(key, x)
            assert out.shape == x.shape, name
            assert bool(jnp.all(jnp.isfinite(out))), name


class TestOrbitCamera:
    def test_pose_orthonormal(self):
        cam = OrbitCamera(64, 64, r=2.0)
        cam.orbit(30, 10)
        cam.pan(5, 5)
        cam.scale(1)
        R = cam.pose[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)

    def test_radius_scale(self):
        cam = OrbitCamera(64, 64, r=2.0)
        cam.scale(1)
        assert cam.radius < 2.0

    def test_intrinsics(self):
        cam = OrbitCamera(100, 80, fovy=60.0)
        fx, fy, cx, cy = cam.intrinsics
        assert cx == 50 and cy == 40
        np.testing.assert_allclose(fy, 40 / np.tan(np.radians(30)), rtol=1e-6)


class TestCLIPLossGating:
    def test_unavailable_is_explicit_not_silent(self):
        import pytest

        from nerf_signature_tpu.utils.clip_loss import CLIPLoss

        loss = CLIPLoss(model_name="nonexistent/model")
        assert not loss.available
        assert "unavailable" in loss.error
        with pytest.raises(RuntimeError, match="unavailable"):
            loss(np.zeros((1, 8, 8, 3), np.float32))


class TestViewerServer:
    def test_http_viewer_roundtrip(self):
        import json
        import time
        import types
        import urllib.request

        from nerf_signature_tpu.api import NGPModel
        from nerf_signature_tpu.models.ngp import NGPConfig
        from nerf_signature_tpu.train.trainer import Trainer
        from nerf_signature_tpu.viewer_server import ViewerServer

        cfg = NGPConfig(bound=1.0, n_levels=4, log2_hashmap_size=10,
                        finest_resolution=64, compute_dtype=jnp.float32)
        model = NGPModel(cfg, grid_size=16, max_steps=32, infer_budget=8)
        opt = types.SimpleNamespace(lr=1e-2, iters=10, devices=0, num_rays=64)
        tr = Trainer("v", opt, model, workspace=None,
                     use_checkpoint="scratch", mute=True)
        srv = ViewerServer(tr, None, W=48, H=48, port=7181)
        srv.serve(blocking=False)
        try:
            frame = None
            for _ in range(120):
                try:
                    r = urllib.request.urlopen(
                        "http://127.0.0.1:7181/frame", timeout=5)
                    frame = r.read()
                    break
                except Exception:
                    time.sleep(0.5)
            assert frame and frame[:2] == b"\xff\xd8"  # JPEG magic
            page = urllib.request.urlopen(
                "http://127.0.0.1:7181/", timeout=5).read()
            assert b"tpu-ngp-signature" in page
            rot_before = srv.viewer.cam.rot.copy()
            req = urllib.request.Request(
                "http://127.0.0.1:7181/ctl",
                data=json.dumps({"orbit": [30, 10]}).encode(), method="POST")
            assert urllib.request.urlopen(req, timeout=5).status == 204
            assert not np.allclose(srv.viewer.cam.rot, rot_before)

            # panel controls: mode/bg/dt_gamma/max_steps (ref gui.py sliders)
            req = urllib.request.Request(
                "http://127.0.0.1:7181/ctl",
                data=json.dumps({"mode": "depth", "bg": 0.0,
                                 "dt_gamma": 1 / 256, "max_steps": 64}
                                ).encode(),
                method="POST")
            assert urllib.request.urlopen(req, timeout=5).status == 204
            assert srv.viewer.mode == "depth"
            assert srv.viewer.bg_color == 0.0
            assert srv.viewer.model.rc.dt_gamma == 1 / 256
            assert srv.viewer.model.rc.max_steps == 64
            # depth mode renders a frame too
            time.sleep(1.0)
            r = urllib.request.urlopen(
                "http://127.0.0.1:7181/frame", timeout=10)
            assert r.read()[:2] == b"\xff\xd8"
        finally:
            srv.stop()


class TestViewerGridMaintenance:
    def test_gui_training_updates_occupancy(self, tmp_path):
        """Regression: the GUI loop must maintain the occupancy grid itself
        (it drives train_step_data directly, bypassing Trainer.train) —
        otherwise from-scratch --gui training is a frozen no-op."""
        import types

        from nerf_signature_tpu.api import NGPModel
        from nerf_signature_tpu.models.ngp import NGPConfig
        from nerf_signature_tpu.train.trainer import Trainer
        from nerf_signature_tpu.viewer import Viewer

        cfg = NGPConfig(bound=1.0, n_levels=4, log2_hashmap_size=10,
                        finest_resolution=64, compute_dtype=jnp.float32)
        model = NGPModel(cfg, grid_size=16, max_steps=32, train_budget=8,
                         infer_budget=8, density_thresh=1e-9)
        opt = types.SimpleNamespace(lr=1e-2, iters=50, devices=0, num_rays=32,
                                    update_extra_interval=4)
        tr = Trainer("v", opt, model, workspace=None,
                     use_checkpoint="scratch", mute=True)
        rng = np.random.default_rng(0)

        class Loader:
            error_map = None
            poses = None  # no frustum culling in this synthetic test
            intrinsics = None

            def __iter__(self):
                for _ in range(8):
                    o = np.asarray(rng.normal(0, 0.1, (32, 3)) - [2.0, 0, 0],
                                   np.float32)
                    d = np.asarray(rng.normal([1, 0, 0], 0.05, (32, 3)),
                                   np.float32)
                    d /= np.linalg.norm(d, axis=-1, keepdims=True)
                    yield {"rays_o": o, "rays_d": d,
                           "images": np.full((32, 3), 0.5, np.float32)}

        v = Viewer(tr, Loader(), W=16, H=16)
        v.train_steps_per_frame = 8
        assert int(np.asarray(model.occ.occupancy).sum()) == 0
        v.train_steps()
        # grid maintenance ran: iter_density advanced (occupancy itself may
        # stay sparse at random init, but the update must have happened)
        assert int(model.occ.iter_density) > 0


class TestProgressiveSupersampling:
    def _mk_viewer(self, max_spp):
        import types

        from nerf_signature_tpu.api import NGPModel
        from nerf_signature_tpu.models.ngp import NGPConfig
        from nerf_signature_tpu.train.trainer import Trainer
        from nerf_signature_tpu.viewer import Viewer

        cfg = NGPConfig(bound=1.0, n_levels=4, log2_hashmap_size=10,
                        finest_resolution=64, compute_dtype=jnp.float32)
        model = NGPModel(cfg, grid_size=16, max_steps=16, infer_budget=8)
        opt = types.SimpleNamespace(lr=1e-2, iters=10, devices=0, num_rays=32)
        tr = Trainer("v", opt, model, workspace=None,
                     use_checkpoint="scratch", mute=True)
        return Viewer(tr, None, W=16, H=16, max_spp=max_spp)

    def test_static_camera_accumulates_to_max_spp(self):
        """spp climbs per call at a fixed pose, then frames become free
        (ref nerf/gui.py progressive spp accumulation)."""
        v = self._mk_viewer(max_spp=3)
        img1, dt1 = v.render_view(downscale=1)
        assert v.spp == 1 and dt1 > 0
        img2, _ = v.render_view(downscale=1)
        assert v.spp == 2
        img3, _ = v.render_view(downscale=1)
        assert v.spp == 3
        # converged: further calls return the accumulator without rendering
        img4, dt4 = v.render_view(downscale=1)
        assert v.spp == 3 and dt4 == 0.0
        assert np.array_equal(img3, img4)
        assert img1.shape == img2.shape == (16, 16, 3)

    def test_camera_move_resets_accumulator(self):
        v = self._mk_viewer(max_spp=4)
        v.render_view(downscale=1)
        v.render_view(downscale=1)
        assert v.spp == 2
        v.cam.orbit(40, 0)
        v.render_view(downscale=1)
        assert v.spp == 1  # new pose restarted the accumulation

    def test_reset_accum_invalidates(self):
        v = self._mk_viewer(max_spp=4)
        v.render_view(downscale=1)
        v.reset_accum()
        assert v.spp == 0 and v._accum is None

    def test_jittered_rays_differ_from_centered(self):
        from nerf_signature_tpu.data.rays import get_rays

        pose = np.eye(4, dtype=np.float32)[None]
        intr = np.array([20.0, 20.0, 8.0, 8.0])
        centered = get_rays(pose, intr, 16, 16, -1)
        jit = get_rays(pose, intr, 16, 16, -1,
                       jitter_rng=np.random.default_rng(0))
        assert not np.allclose(centered["rays_d"], jit["rays_d"])
        # jitter stays inside the pixel: direction tangents within one pixel
        # of the centered ones
        dd = np.abs(centered["rays_d"] - jit["rays_d"]).max()
        assert dd < (1.0 / 20.0) * 2  # < 2 pixel widths of tangent delta
