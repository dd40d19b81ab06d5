"""Colmap-format provider auto-detection and multi-cascade (bound > 1)
rendering — neither was covered before.

Reference behaviours pinned: auto-detect colmap vs blender by
``transforms.json`` vs ``transforms_train.json`` (``nerf/provider.py:115-120``),
colmap train/val split = all-but-first / first frame (``:186-190``), colmap
test = slerp between two random poses (``:166-182``), intrinsics fallback
from ``camera_angle_x`` (``:259-274``); cascade count ``1 + ceil(log2 bound)``
and per-sample mip selection (``raymarching.cu:42-54``).
"""

import json
import os
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_signature_tpu.data.provider import NeRFDataset
from nerf_signature_tpu.ops.grid import init_occupancy_grid, num_cascades
from nerf_signature_tpu.ops.marching import march_rays
from nerf_signature_tpu.render.renderer import RenderConfig, render_rays_occ


def _make_colmap_scene(root):
    import cv2

    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    rng = np.random.default_rng(0)
    frames = []
    for i in range(4):
        theta = 2 * np.pi * i / 4
        pos = np.array([2.0 * np.cos(theta), 0.3, 2.0 * np.sin(theta)])
        # right-handed OpenGL lookAt: z = away from target, x = up x z
        z = pos / np.linalg.norm(pos)
        up = np.array([0.0, 1.0, 0.0])
        x = np.cross(up, z); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        c2w = np.eye(4)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x, y, z, pos
        img = (rng.uniform(0, 255, (32, 32, 3))).astype(np.uint8)
        name = f"images/{i:03d}.png"
        cv2.imwrite(os.path.join(root, name), img)
        frames.append({"file_path": name,
                       "transform_matrix": c2w.tolist()})
    with open(os.path.join(root, "transforms.json"), "w") as f:
        json.dump({"camera_angle_x": 0.9, "frames": frames}, f)


def _opt(path):
    return types.SimpleNamespace(
        path=path, seed=0, num_rays=64, scale=0.33, offset=[0, 0, 0],
        bound=2.0, rand_pose=-1, patch_size=1, error_map=False,
        color_space="srgb", preload=False, fp16=False, downscale=1,
    )


class TestColmapProvider:
    @pytest.fixture(scope="class")
    def scene(self, tmp_path_factory):
        root = str(tmp_path_factory.mktemp("colmap_scene"))
        _make_colmap_scene(root)
        return root

    def test_autodetect_and_splits(self, scene):
        train = NeRFDataset(_opt(scene), type="train")
        val = NeRFDataset(_opt(scene), type="val")
        # colmap split: train = all but first, val = first frame
        assert train.mode == "colmap"
        assert len(train.poses) == 3
        assert len(val.poses) == 1
        assert train.has_gt

    def test_intrinsics_from_camera_angle(self, scene):
        ds = NeRFDataset(_opt(scene), type="train")
        fl = 0.5 * 32 / np.tan(0.45)
        np.testing.assert_allclose(ds.intrinsics[0], fl, rtol=1e-5)

    def test_slerp_test_split(self, scene):
        ds = NeRFDataset(_opt(scene), type="test", n_test=5)
        assert len(ds.poses) >= 5
        assert not ds.has_gt  # slerp-interpolated poses have no GT images

    def test_train_batch(self, scene):
        loader = NeRFDataset(_opt(scene), type="train").dataloader()
        data = next(iter(loader))
        assert data["rays_o"].shape[-2:] == (64, 3)
        assert data["images"].shape[-2] == 64


class TestMultiCascade:
    def test_num_cascades(self):
        assert num_cascades(1.0) == 1
        assert num_cascades(2.0) == 2
        assert num_cascades(4.0) == 3

    def test_march_selects_outer_cascade(self):
        # a ray that only traverses the [-2, 2] shell outside [-1, 1] must
        # produce samples gated by cascade-1 occupancy, not cascade-0
        G = 16
        occ = init_occupancy_grid(2.0, G)
        C = occ.occupancy.shape[0]
        assert C == 2
        # occupy ONLY the outer cascade
        occupancy = occ.occupancy.at[1].set(True)
        o = jnp.array([[-1.9, 0.0, 1.5]])   # |z| 1.5 -> outside cascade 0
        d = jnp.array([[1.0, 0.0, 0.0]])
        m = march_rays(o, d, occupancy, jnp.array([0.05]), jnp.array([3.8]),
                       bound=2.0, max_steps=128, budget=32, grid_size=G)
        assert int(m["n_occupied"][0]) > 0
        xyz = np.asarray(m["xyzs"][0])[np.asarray(m["mask"][0])]
        assert np.all(np.max(np.abs(xyz), axis=-1) > 1.0)

        # inner-only occupancy must produce NO samples for that shell ray
        occupancy2 = occ.occupancy.at[0].set(True)
        m2 = march_rays(o, d, occupancy2, jnp.array([0.05]), jnp.array([3.8]),
                        bound=2.0, max_steps=128, budget=32, grid_size=G)
        assert int(m2["n_occupied"][0]) == 0

    def test_render_bound2_finite(self):
        from nerf_signature_tpu.models.ngp import (
            NGPConfig,
            init_ngp_params,
            ngp_field,
        )

        cfg = NGPConfig(bound=2.0, n_levels=4, log2_hashmap_size=10,
                        finest_resolution=64, compute_dtype=jnp.float32)
        p = init_ngp_params(jax.random.PRNGKey(0), cfg)
        occ = init_occupancy_grid(2.0, 16)
        occupancy = occ.occupancy.at[:].set(True)
        rc = RenderConfig(bound=2.0, grid_size=16, max_steps=64)
        rng = np.random.default_rng(0)
        o = jnp.asarray(rng.normal(0, 0.1, (8, 3)) - [3.0, 0, 0],
                        jnp.float32)
        d = jnp.tile(jnp.array([1.0, 0, 0], jnp.float32), (8, 1))
        field = lambda x, dd: ngp_field(p, cfg, x, dd)
        out = render_rays_occ(field, occupancy, o, d, rc, budget=16)
        assert np.all(np.isfinite(np.asarray(out["image"])))
        assert np.all(np.asarray(out["weights_sum"]) > 0)
