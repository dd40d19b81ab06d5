"""Generate a multi-object textured synthetic dataset (Blender format) at
realistic resolution for capability demos — no reference datasets are
vendored, so this stands in for a Blender-class scene: four textured spheres
+ a textured ground disc, lambertian-shaded with hard shadows from a point
light, rendered analytically in numpy.

Usage:  python scripts_dev/make_multiobj_dataset.py /tmp/scene \
            [--res 256] [--views 60] [--colmap]

--colmap additionally writes a single ``transforms.json`` (colmap-style
auto-detect layout, ref ``nerf/provider.py:115-120``) so the colmap provider
path is exercised at scale too.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_signature_tpu.data.rays import get_rays
from scripts_dev.make_ball_dataset import orbit_poses_rh

FOCAL_ANGLE = 0.8
LIGHT = np.array([0.5, 1.0, 0.3], np.float32)
LIGHT = LIGHT / np.linalg.norm(LIGHT)

# (center, radius, texture id)
SPHERES = [
    (np.array([0.00, -0.05, 0.00], np.float32), 0.32, 0),
    (np.array([-0.45, -0.25, 0.35], np.float32), 0.18, 1),
    (np.array([0.42, -0.28, -0.30], np.float32), 0.16, 2),
    (np.array([0.15, -0.33, 0.48], np.float32), 0.11, 3),
]
GROUND_Y = -0.45
GROUND_R = 0.95

# --env (unbounded-style variant): surrounding environment beyond the unit
# box — extended ground annulus + textured cylindrical wall.  Geometry sized
# so the reference's 360 recipe (``README.md:40``: --bound 2 --scale 0.33)
# puts the wall at 4.5 * 0.33 ~= 1.5, i.e. INSIDE bound 2 but OUTSIDE bound
# 1 — real cascade-2 content for the mip-level march logic
# (ops/marching.py:137-151, ref raymarching.cu:42-54).
ENV_R = 4.5
ENV_WALL_TOP = 3.2

# --rich (hotdog-scale variant, VERDICT r4 next #3): a denser "plate of
# objects" — 14 extra spheres in two rings + a center stack, and 3 axis-
# aligned textured boxes — so an 800x800 render carries Blender-class
# geometric/texture frequency content (thin occlusions, many silhouette
# edges, hard shadows from 20 occluders).
_RICH_RING = [
    (np.array([0.62 * np.cos(a), -0.36, 0.62 * np.sin(a)], np.float32),
     0.085 + 0.02 * ((i * 7) % 3), (i * 5) % 4)
    for i, a in enumerate(np.linspace(0, 2 * np.pi, 9, endpoint=False))
]
_RICH_INNER = [
    (np.array([0.22 * np.cos(a + 0.4), -0.40, 0.22 * np.sin(a + 0.4)],
              np.float32), 0.06, (i * 3 + 1) % 4)
    for i, a in enumerate(np.linspace(0, 2 * np.pi, 4, endpoint=False))
]
RICH_SPHERES = _RICH_RING + _RICH_INNER + [
    (np.array([0.0, 0.38, 0.0], np.float32), 0.14, 2),
]
# (lo, hi, texture id) axis-aligned boxes
RICH_BOXES = [
    (np.array([-0.34, -0.45, -0.52], np.float32),
     np.array([-0.10, -0.18, -0.34], np.float32), 3),
    (np.array([0.28, -0.45, 0.10], np.float32),
     np.array([0.46, -0.05, 0.26], np.float32), 1),
    (np.array([-0.06, -0.45, 0.30], np.float32),
     np.array([0.10, -0.28, 0.44], np.float32), 0),
]


def _tex(tid, p):
    """Procedural RGB textures with high-frequency content (JPEG-ratio key
    block scoring needs texture variance to be meaningful)."""
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    if tid == 0:  # swirly stripes
        return np.stack([
            0.55 + 0.45 * np.sin(14 * x + 9 * z),
            0.50 + 0.40 * np.cos(11 * y + 5 * x),
            0.45 + 0.35 * np.sin(17 * z),
        ], -1)
    if tid == 1:  # checker
        c = (np.floor(9 * x) + np.floor(9 * y) + np.floor(9 * z)) % 2
        return np.stack([0.2 + 0.7 * c, 0.25 + 0.2 * c, 0.65 - 0.45 * c], -1)
    if tid == 2:  # dots
        d = np.sin(22 * x) * np.sin(22 * y) * np.sin(22 * z)
        return np.stack([0.8 - 0.5 * (d > 0.15), 0.35 + 0.5 * (d > 0.15),
                         0.25 + 0.1 * d], -1)
    if tid == 3:  # marble
        m = 0.5 + 0.5 * np.sin(10 * x + 4 * np.sin(13 * y) + 6 * z)
        return np.stack([0.85 * m + 0.1, 0.75 * m + 0.1, 0.55 * m + 0.2], -1)
    # ground: fine checker
    c = (np.floor(12 * (x + 1)) + np.floor(12 * (z + 1))) % 2
    g = 0.35 + 0.35 * c
    return np.stack([g, g * 0.95, g * 0.85], -1)


def _cylinder_hit(ro, rd, radius, y0, y1):
    """Inside-out hit against a vertical cylinder shell (the env wall)."""
    ox, oz = ro[..., 0], ro[..., 2]
    dx, dz = rd[..., 0], rd[..., 2]
    a = dx * dx + dz * dz
    b = ox * dx + oz * dz
    c = ox * ox + oz * oz - radius * radius
    disc = b * b - a * c
    ok = (disc > 0) & (a > 1e-12)
    # camera is inside the cylinder: take the far (exit) root
    t = (-b + np.sqrt(np.maximum(disc, 0.0))) / np.where(a > 1e-12, a, 1.0)
    y = ro[..., 1] + t * rd[..., 1]
    return np.where(ok & (t > 1e-4) & (y > y0) & (y < y1), t, np.inf)


def _sphere_hit(ro, rd, center, radius):
    oc = ro - center
    b = np.sum(oc * rd, -1)
    c = np.sum(oc * oc, -1) - radius * radius
    disc = b * b - c
    t = -b - np.sqrt(np.maximum(disc, 0.0))
    return np.where((disc > 0) & (t > 1e-4), t, np.inf)


def _ground_hit(ro, rd, radius=None):
    t = (GROUND_Y - ro[..., 1]) / np.where(
        np.abs(rd[..., 1]) < 1e-8, 1e-8, rd[..., 1]
    )
    p = ro + t[..., None] * rd
    r2 = p[..., 0] ** 2 + p[..., 2] ** 2
    rmax = GROUND_R if radius is None else radius
    return np.where((t > 1e-4) & (r2 < rmax**2), t, np.inf)


def _box_hit(ro, rd, lo, hi):
    """Slab test; returns (t, normal) with t=inf on miss."""
    inv = 1.0 / np.where(np.abs(rd) < 1e-12, 1e-12, rd)
    t0 = (lo - ro) * inv
    t1 = (hi - ro) * inv
    tmin = np.minimum(t0, t1)
    tmax = np.maximum(t0, t1)
    tn = tmin.max(-1)
    tf = tmax.min(-1)
    ok = (tn < tf) & (tf > 1e-4) & (tn > 1e-4)
    t = np.where(ok, tn, np.inf)
    # entering face = the axis achieving tn; normal points against the ray
    ax = np.argmax(tmin, -1)
    normal = np.zeros_like(ro)
    np.put_along_axis(normal, ax[..., None],
                      -np.sign(np.take_along_axis(rd, ax[..., None], -1)), -1)
    return t, normal


def _shadowed(p, spheres, boxes=()):
    """Hard shadow: any occluder between p and the (directional) light."""
    sh = np.zeros(p.shape[:-1], bool)
    ro = p + 1e-3 * LIGHT
    rd = np.broadcast_to(LIGHT, p.shape)
    for c, r, _ in spheres:
        sh |= np.isfinite(_sphere_hit(ro, rd, c, r))
    for lo, hi, _ in boxes:
        sh |= np.isfinite(_box_hit(ro, rd, lo, hi)[0])
    return sh


def trace(ro, rd, env=False, rich=False):
    """RGBA for rays [N, 3]."""
    spheres = SPHERES + (RICH_SPHERES if rich else [])
    boxes = RICH_BOXES if rich else []
    ts = [_sphere_hit(ro, rd, c, r) for c, r, _ in spheres]
    box_normals = []
    for lo, hi, _ in boxes:
        tb, nb = _box_hit(ro, rd, lo, hi)
        ts.append(tb)
        box_normals.append(nb)
    ts.append(_ground_hit(ro, rd, radius=ENV_R if env else None))
    if env:
        ts.append(_cylinder_hit(ro, rd, ENV_R, GROUND_Y, ENV_WALL_TOP))
    ts = np.stack(ts, -1)  # [N, K]
    k = np.argmin(ts, -1)
    t = np.take_along_axis(ts, k[..., None], -1)[..., 0]
    hit = np.isfinite(t)
    t = np.where(hit, t, 0.0)
    p = ro + t[..., None] * rd

    rgb = np.zeros((*ro.shape[:-1], 3), np.float32)
    normal = np.zeros_like(rgb)
    for i, (c, r, tid) in enumerate(spheres):
        m = hit & (k == i)
        if m.any():
            n = (p[m] - c) / r
            normal[m] = n
            rgb[m] = _tex(tid, p[m])
    for j, (lo, hi, tid) in enumerate(boxes):
        m = hit & (k == len(spheres) + j)
        if m.any():
            normal[m] = box_normals[j][m]
            rgb[m] = _tex(tid, p[m])
    mg = hit & (k == len(spheres) + len(boxes))
    if mg.any():
        normal[mg] = np.array([0, 1, 0], np.float32)
        rgb[mg] = _tex(-1, p[mg])
    if env:
        mw = hit & (k == len(spheres) + len(boxes) + 1)
        if mw.any():
            pw = p[mw]
            n = -pw.copy()
            n[:, 1] = 0.0
            n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-8)
            normal[mw] = n
            # brick-ish wall texture keyed on azimuth + height (high
            # frequency so key blocks can land on the wall too)
            az = np.arctan2(pw[:, 2], pw[:, 0])
            cbrick = (np.floor(8 * az) + np.floor(3.5 * pw[:, 1])) % 2
            rgb[mw] = np.stack([
                0.45 + 0.35 * cbrick + 0.1 * np.sin(40 * az),
                0.30 + 0.25 * cbrick,
                0.25 + 0.15 * np.cos(25 * pw[:, 1]),
            ], -1)

    lam = np.clip(np.sum(normal * LIGHT, -1), 0.0, 1.0)
    shade = 0.25 + 0.75 * lam * (~_shadowed(p, spheres, boxes) | ~hit)
    rgba = np.zeros((*ro.shape[:-1], 4), np.float32)
    rgba[..., :3] = np.clip(rgb * shade[..., None], 0, 1) * hit[..., None]
    rgba[..., 3] = hit
    return rgba


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--views", type=int, default=60)
    ap.add_argument("--colmap", action="store_true",
                    help="also write colmap-style transforms.json")
    ap.add_argument("--env", action="store_true",
                    help="unbounded-style variant: surrounding wall+ground "
                         "environment beyond the unit box; cameras orbit at "
                         "2.2 looking at the center (360-recipe shape: "
                         "--bound 2 --scale 0.33 puts the wall in cascade 2)")
    ap.add_argument("--rich", action="store_true",
                    help="hotdog-scale geometry: +14 spheres and 3 textured "
                         "boxes (20 occluders, thin shadows/silhouettes) — "
                         "pair with --res 800 for the Blender-recipe proxy "
                         "(ref README.md:45 trains hotdog at 800x800/ds2)")
    args = ap.parse_args()

    import cv2

    H = W = args.res
    os.makedirs(args.root, exist_ok=True)
    rng = np.random.default_rng(0)
    all_frames = []
    for split, n in [("train", args.views), ("val", 2),
                     ("test", max(4, args.views // 10))]:
        frames = []
        poses = orbit_poses_rh(rng, n, radius=2.2 if args.env else 1.9)
        for i, pose in enumerate(poses):
            # invert the ngp-convention pose back to Blender convention
            # (same transform as make_ball_dataset)
            inv = np.eye(4, dtype=np.float32)
            inv[0] = [pose[2, 0], -pose[2, 1], -pose[2, 2], pose[2, 3]]
            inv[1] = [pose[0, 0], -pose[0, 1], -pose[0, 2], pose[0, 3]]
            inv[2] = [pose[1, 0], -pose[1, 1], -pose[1, 2], pose[1, 3]]
            fl = W / (2 * np.tan(FOCAL_ANGLE / 2))
            rays = get_rays(pose[None], (fl, fl, W / 2, H / 2), H, W, -1)
            rgba = trace(rays["rays_o"][0], rays["rays_d"][0],
                         env=args.env, rich=args.rich).reshape(H, W, 4)
            fname = f"r_{split}_{i}.png"
            cv2.imwrite(os.path.join(args.root, fname),
                        cv2.cvtColor((rgba * 255).astype(np.uint8),
                                     cv2.COLOR_RGBA2BGRA))
            frames.append({"file_path": fname,
                           "transform_matrix": inv.tolist()})
        with open(os.path.join(args.root, f"transforms_{split}.json"),
                  "w") as f:
            json.dump({"camera_angle_x": FOCAL_ANGLE, "frames": frames}, f)
        all_frames += frames
    if args.colmap:
        croot = args.root.rstrip("/") + "_colmap"
        os.makedirs(croot, exist_ok=True)
        for fr in all_frames:
            src = os.path.join(args.root, fr["file_path"])
            dst = os.path.join(croot, fr["file_path"])
            if not os.path.exists(dst):
                os.link(src, dst)
        with open(os.path.join(croot, "transforms.json"), "w") as f:
            json.dump({"camera_angle_x": FOCAL_ANGLE, "frames": all_frames},
                      f)
        print(f"colmap-style variant at {croot}")
    print(f"dataset written to {args.root} ({args.res}px, {args.views} views)")


if __name__ == "__main__":
    main()
