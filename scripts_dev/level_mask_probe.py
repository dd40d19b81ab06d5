"""Population probe for per-sample hash-LEVEL masking by march step size.

VERDICT r3 #4a named one untested lever against the forward-gather floor:
"skip gathering levels whose cell size is below the sample's dt".  This
probe measures the lever's *ceiling* on real trained geometry before anyone
invests in the (sample, level)-pair compaction it would need:

  * march real test rays through a trained workspace's occupancy grid
    (the same ``ops.marching.march_rays`` the trainers run),
  * per surviving sample, count hash levels whose cell size
    ``2 * bound / res_l`` is smaller than ``kappa * dt`` — the levels the
    lever would skip,
  * report the masked fraction of (sample, level) forward-gather rows and
    the implied upper-bound speedup of the forward gather term.

Degeneracy worth stating up front: with ``dt_gamma == 0`` (the headline
bound-1 recipes) dt is CONSTANT across samples, so "mask levels finer than
dt" is the same cut for every sample — i.e. it degenerates to the
``n_levels`` / max-level hyperparameter, not a per-sample win.  The
per-sample version only has teeth under geometric stepping
(``dt_gamma > 0``, the cascade-2 recipe), where far samples take large
steps.  Run both configs and compare.

CPU-friendly (pure march math + numpy stats; no field forward):
  python scripts_dev/level_mask_probe.py --workspace /tmp/ws_moA_wm \
      --data /tmp/mo_scene --bound 1 --scale 1 --dt_gamma 0
  python scripts_dev/level_mask_probe.py --workspace /tmp/ws_env2_wm \
      --data /tmp/mo_env --bound 2 --scale 0.33 --dt_gamma 0.0078125
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from nerf_signature_tpu.data.rays import get_rays, nerf_matrix_to_ngp
from nerf_signature_tpu.ops.hashenc import level_resolutions
from nerf_signature_tpu.ops.intersect import near_far_from_aabb
from nerf_signature_tpu.ops.marching import march_rays
from nerf_signature_tpu.train.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
)


def _test_rays(data_dir, scale, n_rays, seed):
    with open(os.path.join(data_dir, "transforms_test.json")) as f:
        tf = json.load(f)
    frames = tf["frames"][:4]
    poses = np.stack(
        [
            nerf_matrix_to_ngp(
                np.array(fr["transform_matrix"], np.float32), scale, [0, 0, 0]
            )
            for fr in frames
        ]
    )
    # probe the first frame's image for H/W (the synthetic scenes carry no
    # h/w keys), intrinsics from camera_angle_x like the provider
    import cv2

    fp = os.path.join(data_dir, frames[0]["file_path"].lstrip("./"))
    if not os.path.exists(fp):
        fp = fp + ".png"
    img = cv2.imread(fp)
    H, W = img.shape[0], img.shape[1]
    fl = W / (2.0 * np.tan(tf["camera_angle_x"] / 2.0))
    rays = get_rays(poses, (fl, fl, W / 2.0, H / 2.0), H, W, N=-1)
    o = rays["rays_o"].reshape(-1, 3)
    d = rays["rays_d"].reshape(-1, 3)
    rng = np.random.default_rng(seed)
    sel = rng.choice(o.shape[0], size=n_rays, replace=False)
    return o[sel], d[sel]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workspace", required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--bound", type=float, default=1.0)
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--dt_gamma", type=float, default=0.0)
    ap.add_argument("--max_steps", type=int, default=1024)
    ap.add_argument("--budget", type=int, default=128)
    ap.add_argument("--n_rays", type=int, default=4096)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    ckpt = latest_checkpoint(os.path.join(args.workspace, "checkpoints"), "ngp")
    if ckpt is None:
        raise SystemExit(f"no checkpoint under {args.workspace}")
    state = load_checkpoint(ckpt)
    occupancy = np.asarray(state["occ"]["occupancy"], bool)
    C = occupancy.shape[0]
    print(f"[probe] ckpt={ckpt} cascades={C} "
          f"occ_frac={occupancy.mean():.4f}")

    o, d = _test_rays(args.data, args.scale, args.n_rays, args.seed)
    b = args.bound
    aabb = np.array([-b, -b, -b, b, b, b], np.float32)
    nears, fars = near_far_from_aabb(o, d, aabb)
    out = march_rays(
        o,
        d,
        occupancy,
        nears,
        fars,
        bound=args.bound,
        dt_gamma=args.dt_gamma,
        max_steps=args.max_steps,
        budget=args.budget,
    )
    dts = np.asarray(out["deltas"])      # [N, S]
    mask = np.asarray(out["mask"])       # [N, S]
    n_valid = int(mask.sum())
    if n_valid == 0:
        raise SystemExit("march produced no samples — wrong scene/flags?")
    dt_v = dts[mask]
    print(f"[probe] samples={n_valid} ({n_valid / mask.shape[0]:.1f}/ray)  "
          f"dt: min={dt_v.min():.5f} mean={dt_v.mean():.5f} "
          f"max={dt_v.max():.5f}")

    res = level_resolutions(16, 16, 2048)
    cell = 2.0 * args.bound / res        # [L] metric cell size per level
    rec = {"workspace": args.workspace, "dt_gamma": args.dt_gamma,
           "bound": args.bound, "samples": n_valid}
    for kappa in (0.5, 1.0, 2.0):
        masked = dt_v[:, None] > (kappa * cell)[None, :]   # [n_valid, L]
        frac = float(masked.mean())
        rec[f"masked_frac_k{kappa:g}"] = round(frac, 4)
        rec[f"fwd_gather_ceiling_k{kappa:g}"] = round(1.0 / (1.0 - frac), 3) \
            if frac < 1 else float("inf")
        print(f"[probe] kappa={kappa:g}: masked (sample,level) pairs = "
              f"{frac:.4f}  -> forward-gather ceiling {1 / (1 - frac):.2f}x")
    per_level = (dt_v[:, None] > cell[None, :]).mean(axis=0)
    print("[probe] per-level masked fraction (kappa=1):")
    for l, (r, f) in enumerate(zip(res, per_level)):
        print(f"    level {l:2d} res {int(r):4d} cell {cell[l]:.5f}  "
              f"masked {f:.3f}")
    rec["per_level_k1"] = [round(float(f), 3) for f in per_level]
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
