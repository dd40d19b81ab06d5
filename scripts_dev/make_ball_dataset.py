"""Generate a tiny synthetic Blender-format dataset (textured ball, RGBA) for
CLI verification and benchmarks without vendored datasets."""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_signature_tpu.data.rays import get_rays

H = W = int(os.environ.get("BALL_RES", "64"))
FOCAL_ANGLE = 0.8


def orbit_poses_rh(rng, size, radius=1.8):
    """Right-handed orbit poses (det=+1), unlike the reference's left-handed
    ``rand_poses`` — real Blender datasets are right-handed and scipy's
    ``Rotation.from_matrix`` (used for test-pose slerp) requires det>0."""
    thetas = rng.uniform(np.pi / 3, 2 * np.pi / 3, size)
    phis = rng.uniform(0, 2 * np.pi, size)
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


def ball_gt(rays_o, rays_d):
    b = np.sum(rays_o * rays_d, -1)
    c = np.sum(rays_o * rays_o, -1) - 0.4**2
    disc = b * b - c
    hit = disc > 0
    t = -b - np.sqrt(np.maximum(disc, 0))
    p = rays_o + t[..., None] * rays_d
    rgba = np.zeros((*rays_o.shape[:-1], 4), np.float32)
    rgba[..., 0] = np.where(hit, 0.6 + 0.4 * np.sin(8 * p[..., 0]), 0)
    rgba[..., 1] = np.where(hit, 0.5 + 0.5 * np.cos(7 * p[..., 1]), 0)
    rgba[..., 2] = np.where(hit, 0.3, 0)
    rgba[..., 3] = hit.astype(np.float32)
    return np.clip(rgba, 0, 1)


def main(root):
    import cv2

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    for split, n in [("train", 10), ("val", 1), ("test", 2)]:
        frames = []
        poses = orbit_poses_rh(rng, n, radius=1.8)
        for i, pose in enumerate(poses):
            inv = np.eye(4, dtype=np.float32)
            inv[0] = [pose[2, 0], -pose[2, 1], -pose[2, 2], pose[2, 3]]
            inv[1] = [pose[0, 0], -pose[0, 1], -pose[0, 2], pose[0, 3]]
            inv[2] = [pose[1, 0], -pose[1, 1], -pose[1, 2], pose[1, 3]]
            fl = W / (2 * np.tan(FOCAL_ANGLE / 2))
            rays = get_rays(pose[None], (fl, fl, W / 2, H / 2), H, W, -1)
            rgba = ball_gt(rays["rays_o"][0], rays["rays_d"][0]).reshape(H, W, 4)
            fname = f"r_{split}_{i}.png"
            cv2.imwrite(os.path.join(root, fname),
                        cv2.cvtColor((rgba * 255).astype(np.uint8),
                                     cv2.COLOR_RGBA2BGRA))
            frames.append({"file_path": fname, "transform_matrix": inv.tolist()})
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": FOCAL_ANGLE, "frames": frames}, f)
    print(f"dataset written to {root}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/ball_scene")
