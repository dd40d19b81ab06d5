"""LLFF -> transforms.json converter tests (scripts/llff2nerf.py)."""

import importlib.util
import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

_spec = importlib.util.spec_from_file_location(
    "llff2nerf",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "llff2nerf.py"),
)
llff2nerf = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(llff2nerf)


def _nerf_to_llff_pose(c2w, H, W, focal):
    """Inverse of the converter's column fix, for round-trip testing:
    NeRF [right, up, back] -> LLFF [down, right, back]."""
    r = c2w[:3, :3]
    m = np.stack([-r[:, 1], r[:, 0], r[:, 2], c2w[:3, 3]], axis=1)
    hwf = np.array([[H], [W], [focal]], np.float64)
    return np.concatenate([m, hwf], axis=1)  # [3, 5]


class TestLLFFConvert:
    def test_round_trip(self, tmp_path):
        rng = np.random.default_rng(0)
        H, W, focal = 32.0, 48.0, 40.0
        n = 3
        c2ws = []
        rows = []
        for _ in range(n):
            # random orthonormal rotation + translation
            q = rng.normal(size=(3, 3))
            r, _ = np.linalg.qr(q)
            if np.linalg.det(r) < 0:
                r[:, 0] *= -1
            c2w = np.eye(4)
            c2w[:3, :3] = r
            c2w[:3, 3] = rng.normal(size=3)
            c2ws.append(c2w)
            rows.append(
                np.concatenate([
                    _nerf_to_llff_pose(c2w, H, W, focal).reshape(-1),
                    [1.0, 10.0],
                ])
            )
        np.save(tmp_path / "poses_bounds.npy", np.stack(rows))
        os.makedirs(tmp_path / "images")
        for i in range(n):
            cv2.imwrite(
                str(tmp_path / "images" / f"img_{i:03d}.png"),
                np.zeros((int(H), int(W), 3), np.uint8),
            )

        llff2nerf.convert(str(tmp_path))
        with open(tmp_path / "transforms.json") as f:
            t = json.load(f)
        assert len(t["frames"]) == n
        np.testing.assert_allclose(t["fl_x"], focal)
        np.testing.assert_allclose(
            t["camera_angle_x"], 2 * np.arctan(W / (2 * focal)), rtol=1e-6
        )
        for frame, c2w in zip(t["frames"], c2ws):
            np.testing.assert_allclose(
                np.array(frame["transform_matrix"]), c2w, atol=1e-8
            )

    def test_provider_reads_converted_scene(self, tmp_path):
        """The colmap-mode provider must load the converter's output."""
        from types import SimpleNamespace

        from nerf_signature_tpu.data.provider import NeRFDataset

        rng = np.random.default_rng(1)
        H, W, focal = 16.0, 16.0, 20.0
        rows = []
        for _ in range(3):
            c2w = np.eye(4)
            c2w[:3, 3] = rng.normal(size=3)
            rows.append(np.concatenate([
                _nerf_to_llff_pose(c2w, H, W, focal).reshape(-1), [1.0, 5.0],
            ]))
        np.save(tmp_path / "poses_bounds.npy", np.stack(rows))
        os.makedirs(tmp_path / "images")
        for i in range(3):
            cv2.imwrite(str(tmp_path / "images" / f"i{i}.png"),
                        np.full((16, 16, 3), 128, np.uint8))
        llff2nerf.convert(str(tmp_path))

        opt = SimpleNamespace(
            path=str(tmp_path), preload=False, scale=0.33, offset=[0, 0, 0],
            bound=1.0, fp16=False, num_rays=32, rand_pose=-1, patch_size=1,
            error_map=False, seed=0,
        )
        ds = NeRFDataset(opt, type="train")
        assert ds.mode == "colmap"
        assert len(ds.poses) == 2  # colmap split: all-but-first
        batch = ds.collate(0)
        assert batch["rays_o"].shape[-1] == 3
