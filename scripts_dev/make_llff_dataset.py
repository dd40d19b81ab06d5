"""Generate a synthetic LLFF-format dataset (``poses_bounds.npy`` +
``images/``) so the full LLFF ingestion pipeline — ``scripts/llff2nerf.py``
-> colmap-mode provider -> both training stages — can be exercised
end-to-end without vendored data (the reference's fern recipe,
``README.md:50``, assumes a pre-converted LLFF scene).

Forward-facing capture of the multi-object scene
(``make_multiobj_dataset``): cameras in a narrow cone looking at the
origin, plus a textured wall at z = -0.9 so the background is REAL
in-bounds geometry (LLFF photos have no alpha; every pixel must be
explainable by the radiance field).

Usage: python scripts_dev/make_llff_dataset.py /tmp/llff_scene \
           [--res 256] [--views 30]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_signature_tpu.data.rays import get_rays
from scripts_dev.make_multiobj_dataset import FOCAL_ANGLE, trace

WALL_Z = -0.9


def _wall_rgb(p):
    """Fine plaid texture — enough high-frequency content for the JPEG-ratio
    key-block scoring to rank blocks meaningfully."""
    x, y = p[..., 0], p[..., 1]
    c = (np.floor(10 * (x + 2)) + np.floor(10 * (y + 2))) % 2
    s = 0.5 + 0.5 * np.sin(25 * x) * np.sin(21 * y)
    return np.stack([
        0.35 + 0.3 * c + 0.1 * s,
        0.40 + 0.25 * c + 0.05 * s,
        0.50 + 0.2 * c,
    ], -1).astype(np.float32)


def trace_ff(ro, rd):
    """RGB (no alpha): scene hit, else the wall, else sky gradient."""
    rgba = trace(ro, rd)
    rgb, alpha = rgba[..., :3], rgba[..., 3:]
    tz = (WALL_Z - ro[..., 2]) / np.where(
        np.abs(rd[..., 2]) < 1e-8, 1e-8, rd[..., 2]
    )
    pw = ro + tz[..., None] * rd
    wall_ok = (tz > 1e-4) & (np.abs(pw[..., 0]) < 2.5) & (np.abs(pw[..., 1]) < 2.5)
    wall = np.where(wall_ok[..., None], _wall_rgb(pw), 0.55 + 0.25 * rd[..., 1:2])
    return np.clip(rgb * alpha + wall * (1 - alpha), 0, 1)


def forward_facing_poses(rng, size, radius=1.9):
    """ngp-convention c2w poses in a narrow cone about +z, looking at origin
    (the LLFF capture geometry)."""
    thetas = rng.uniform(np.pi / 2 - 0.28, np.pi / 2 + 0.28, size)
    phis = rng.uniform(-0.35, 0.35, size)
    centers = np.stack([
        radius * np.sin(thetas) * np.sin(phis),
        radius * np.cos(thetas),
        radius * np.sin(thetas) * np.cos(phis),
    ], axis=-1).astype(np.float32)

    def normalize(v):
        return v / (np.linalg.norm(v, axis=-1, keepdims=True) + 1e-10)

    forward = -normalize(centers)
    up0 = np.tile(np.array([0, -1, 0], np.float32), (size, 1))
    right = normalize(np.cross(up0, forward))
    up = np.cross(forward, right)
    poses = np.tile(np.eye(4, dtype=np.float32), (size, 1, 1))
    poses[:, :3, :3] = np.stack([right, up, forward], axis=-1)
    poses[:, :3, 3] = centers
    return poses


def ngp_to_blender(pose):
    """Invert the providers' nerf_matrix_to_ngp (same map as
    make_ball_dataset)."""
    inv = np.eye(4, dtype=np.float64)
    inv[0] = [pose[2, 0], -pose[2, 1], -pose[2, 2], pose[2, 3]]
    inv[1] = [pose[0, 0], -pose[0, 1], -pose[0, 2], pose[0, 3]]
    inv[2] = [pose[1, 0], -pose[1, 1], -pose[1, 2], pose[1, 3]]
    return inv


def blender_to_llff_row(c2w, H, W, focal, near, far):
    """NeRF cols [right, up, back] -> LLFF cols [down, right, back]
    (inverse of llff2nerf.llff_to_nerf_pose) + hwf column + bounds."""
    r = np.asarray(c2w, np.float64)[:3, :3]
    t = np.asarray(c2w, np.float64)[:3, 3]
    m = np.stack([-r[:, 1], r[:, 0], r[:, 2], t], axis=1)  # [3, 4]
    hwf = np.array([[H], [W], [focal]], np.float64)
    return np.concatenate(
        [np.concatenate([m, hwf], axis=1).reshape(-1), [near, far]]
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--views", type=int, default=30)
    args = ap.parse_args()

    import cv2

    H = W = args.res
    fl = W / (2 * np.tan(FOCAL_ANGLE / 2))
    img_dir = os.path.join(args.root, "images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(7)
    poses = forward_facing_poses(rng, args.views)
    rows = []
    for i, pose in enumerate(poses):
        rays = get_rays(pose[None], (fl, fl, W / 2, H / 2), H, W, -1)
        rgb = trace_ff(rays["rays_o"][0], rays["rays_d"][0]).reshape(H, W, 3)
        cv2.imwrite(os.path.join(img_dir, f"img_{i:03d}.png"),
                    cv2.cvtColor((rgb * 255).astype(np.uint8),
                                 cv2.COLOR_RGB2BGR))
        # bounds: nearest content ~ (cam radius - scene extent), farthest =
        # wall distance along the view axis (+ margin)
        near = float(np.linalg.norm(pose[:3, 3]) - 1.0)
        far = float(np.linalg.norm(pose[:3, 3]) + abs(WALL_Z) + 0.6)
        rows.append(blender_to_llff_row(
            ngp_to_blender(pose), H, W, fl, near, far))
    np.save(os.path.join(args.root, "poses_bounds.npy"),
            np.stack(rows).astype(np.float64))
    print(f"LLFF dataset written to {args.root} "
          f"({args.res}px, {args.views} views)")


if __name__ == "__main__":
    main()
