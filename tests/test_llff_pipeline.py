"""End-to-end LLFF ingestion: synthetic poses_bounds.npy capture ->
scripts/llff2nerf.py -> colmap-mode provider -> rays that re-trace to the
saved pixels.

This pins the full pose-convention chain (LLFF [down,right,back] -> NeRF
[right,up,back] -> internal ngp axes): any convention slip anywhere in
generator, converter or provider shows up as a large re-trace error, the
same failure a real LLFF scene (ref ``README.md:50``) would hit."""

import importlib.util
import os
import subprocess
import sys
import types

import numpy as np
import pytest

pytest.importorskip("cv2")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_llff_generate_convert_load_retrace(tmp_path):
    scene = str(tmp_path / "llff")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    for script, args in [
        ("scripts_dev/make_llff_dataset.py", [scene, "--res", "48",
                                              "--views", "4"]),
        ("scripts/llff2nerf.py", [scene]),
    ]:
        subprocess.run([sys.executable, os.path.join(REPO, script)] + args,
                       check=True, env=env, cwd=REPO)

    from nerf_signature_tpu.data.provider import NeRFDataset
    from nerf_signature_tpu.data.rays import get_rays

    spec = importlib.util.spec_from_file_location(
        "make_llff", os.path.join(REPO, "scripts_dev/make_llff_dataset.py"))
    make_llff = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(make_llff)

    opt = types.SimpleNamespace(
        path=scene, preload=False, scale=1.0, offset=[0, 0, 0], bound=1.0,
        rand_pose=-1, error_map=False, patch_size=1, num_rays=64,
        color_space="srgb", fp16=False, downscale=1, seed=0)
    ds = NeRFDataset(opt, type="train")  # colmap auto-detect (transforms.json)
    assert ds.H == ds.W == 48
    errs = []
    for i in range(len(ds.poses)):
        pose = np.asarray(ds.poses[i])
        rays = get_rays(pose[None], tuple(np.asarray(ds.intrinsics).tolist()),
                        ds.H, ds.W, -1)
        rgb = make_llff.trace_ff(
            np.asarray(rays["rays_o"][0]), np.asarray(rays["rays_d"][0])
        ).reshape(ds.H, ds.W, 3)
        gt = np.asarray(ds.images[i], np.float32)
        if gt.max() > 1.5:
            gt = gt / 255.0
        errs.append(np.abs(rgb - gt[..., :3]).mean())
    # PNG quantization only; a convention slip reads ~0.2+
    assert max(errs) < 0.02, errs
