#!/usr/bin/env python
"""Convert an LLFF-format dataset (``poses_bounds.npy`` + ``images*/``) to
the ``transforms.json`` layout the providers read.

The reference's LLFF recipe (``README.md:50``: ``data/nerf_llff_data/fern``)
assumes the dataset was already converted with torch-ngp's out-of-tree
converter; this makes the framework self-sufficient.  Format facts:

  * ``poses_bounds.npy``: [N, 17] — 15 values are a row-major 3x5 matrix
    ``[R | t | (H, W, focal)]`` with the LLFF axis convention
    (columns = [down, right, backwards]), the last 2 are near/far bounds.
  * The NeRF camera convention is [right, up, backwards]; the standard
    column fix is ``[c1, -c0, c2]``.

Writes ``transforms.json`` with ``camera_angle_x`` (+ fl_x/fl_y/cx/cy) and
one frame per image, which the colmap-mode provider
(``data/provider.NeRFDataset``) consumes directly.

Usage: python scripts/llff2nerf.py <scene_dir> [--images images] [--downscale 1]
"""

import argparse
import glob
import json
import os

import numpy as np


def llff_to_nerf_pose(pose_3x5):
    """[3, 5] LLFF row -> (4x4 c2w in NeRF convention, (H, W, focal))."""
    m = pose_3x5[:, :4]
    hwf = pose_3x5[:, 4]
    # column fix [down, right, back] -> [right, up, back]
    r = np.stack([m[:, 1], -m[:, 0], m[:, 2]], axis=1)
    c2w = np.eye(4, dtype=np.float64)
    c2w[:3, :3] = r
    c2w[:3, 3] = m[:, 3]
    return c2w, hwf


def convert(scene_dir, images="images", downscale=1, out="transforms.json"):
    pb = np.load(os.path.join(scene_dir, "poses_bounds.npy"))
    poses = pb[:, :15].reshape(-1, 3, 5)
    bounds = pb[:, 15:]

    img_dir = images if downscale == 1 else f"{images}_{int(downscale)}"
    files = sorted(
        f for f in glob.glob(os.path.join(scene_dir, img_dir, "*"))
        if f.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    if len(files) != len(poses):
        raise ValueError(
            f"{len(files)} images in {img_dir}/ but {len(poses)} poses"
        )

    if len(files) == 0:
        raise ValueError(f"no frames found under {img_dir}/")
    frames = []
    H = W = focal = None
    for f, p in zip(files, poses):
        c2w, hwf = llff_to_nerf_pose(p)
        if H is not None and not np.allclose(
            [H, W, focal], [hwf[0], hwf[1], hwf[2]], rtol=1e-3
        ):
            # a single global intrinsics block would silently give every
            # other frame wrong camera parameters
            raise ValueError(
                f"per-frame intrinsics differ beyond tolerance: "
                f"{(H, W, focal)} vs {tuple(hwf)} at {f}; LLFF scenes with "
                f"heterogeneous cameras need per-frame intrinsics "
                f"(unsupported by this converter)"
            )
        H, W, focal = float(hwf[0]), float(hwf[1]), float(hwf[2])
        frames.append({
            "file_path": os.path.relpath(f, scene_dir),
            "transform_matrix": c2w.tolist(),
        })
    H, W, focal = H / downscale, W / downscale, focal / downscale

    transform = {
        "camera_angle_x": float(2.0 * np.arctan(W / (2.0 * focal))),
        "fl_x": focal, "fl_y": focal,
        "cx": W / 2.0, "cy": H / 2.0,
        "w": W, "h": H,
        "near": float(bounds.min()), "far": float(bounds.max()),
        "frames": frames,
    }
    path = os.path.join(scene_dir, out)
    with open(path, "w") as f:
        json.dump(transform, f, indent=2)
    print(f"wrote {path}: {len(frames)} frames, {W:.0f}x{H:.0f}, "
          f"focal {focal:.1f}, bounds [{bounds.min():.2f}, {bounds.max():.2f}]")
    return path


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("scene_dir")
    ap.add_argument("--images", default="images")
    ap.add_argument("--downscale", type=int, default=1)
    ap.add_argument("--out", default="transforms.json")
    a = ap.parse_args()
    convert(a.scene_dir, a.images, a.downscale, a.out)
