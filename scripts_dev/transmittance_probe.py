"""Population probe: how many marched samples are transmittance-dead?

The march selects the first `budget` OCCUPIED candidates per ray, but
occupancy says nothing about visibility: every sample behind an opacity
saturation point (entering transmittance T < T_thresh = 1e-4, the
reference's own early-termination threshold, `raymarching.cu` composite
break) gets weight EXACTLY zero in `ops/composite.py:composite_rays` — and
therefore contributes exactly zero loss and exactly zero gradient (T is
monotone, so every sample after a dead one is dead too; changing a dead
sample's sigma only moves transmittance entering other dead samples).  We
still pay the full hash-gather + MLP forward/backward for them.

This probe measures the exactly-removable fraction on real trained models:
march real test rays, run the trained density field at the selected
samples, composite, and count samples with T_in < thresh.  That fraction is
the ZERO-BIAS ceiling for a transmittance-aware second compaction pass
(train) and for reference-parity early ray termination (inference).

  python scripts_dev/transmittance_probe.py --workspace /tmp/ws_moA_wm \
      --data /tmp/mo_scene --bound 1 --scale 1 --dt_gamma 0
  python scripts_dev/transmittance_probe.py --workspace /tmp/ws_env2_wm \
      --data /tmp/mo_env --bound 2 --scale 0.33 --dt_gamma 0.0078125
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from nerf_signature_tpu.models.ngp import NGPConfig, init_ngp_params, ngp_density
from nerf_signature_tpu.ops.intersect import near_far_from_aabb
from nerf_signature_tpu.ops.marching import march_rays
from nerf_signature_tpu.train.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    restore_like,
)
from level_mask_probe import _test_rays


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
    ap.add_argument("--density_scale", type=float, default=1.0)
    args = ap.parse_args()

    ckpt = latest_checkpoint(os.path.join(args.workspace, "checkpoints"), "ngp")
    if ckpt is None:
        raise SystemExit(f"no checkpoint under {args.workspace}")
    state = load_checkpoint(ckpt)
    occupancy = np.asarray(state["occ"]["occupancy"], bool)

    cfg = NGPConfig(bound=args.bound, compute_dtype=jnp.float32)
    template = init_ngp_params(jax.random.PRNGKey(0), cfg)
    # wm checkpoints carry extra trainable leaves (msg tables, decoder) —
    # restore only the clean backbone subtree the density field needs
    params = restore_like(template, state["backbone"])

    o, d = _test_rays(args.data, args.scale, args.n_rays, args.seed)
    b = args.bound
    aabb = np.array([-b, -b, -b, b, b, b], np.float32)
    nears, fars = near_far_from_aabb(o, d, aabb)
    out = march_rays(
        o, d, occupancy, nears, fars,
        bound=args.bound, dt_gamma=args.dt_gamma,
        max_steps=args.max_steps, budget=args.budget,
    )
    mask = np.asarray(out["mask"])                       # [N, S]
    xyz = np.asarray(out["xyzs"]).reshape(-1, 3)
    sig = np.zeros(xyz.shape[0], np.float32)
    CH = 262144
    dens = jax.jit(lambda x: ngp_density(params, cfg, x)["sigma"])
    for i in range(0, xyz.shape[0], CH):
        sig[i:i + CH] = np.asarray(dens(jnp.asarray(xyz[i:i + CH])))
    sig = sig.reshape(mask.shape) * args.density_scale

    tau = np.where(mask, sig * np.asarray(out["deltas"]), 0.0)
    cum = np.cumsum(tau, axis=-1)
    T_in = np.exp(-(cum - tau))                          # entering T
    n_valid = int(mask.sum())
    rec = {"workspace": args.workspace, "samples": n_valid,
           "mean_per_ray": round(n_valid / mask.shape[0], 1)}
    print(f"[probe] ckpt={ckpt} samples={n_valid} "
          f"({rec['mean_per_ray']}/ray)")
    for th in (1e-4, 1e-2):
        dead = float((T_in[mask] < th).mean())
        rec[f"dead_frac_T{th:g}"] = round(dead, 4)
        rec[f"pop_ceiling_T{th:g}"] = round(1.0 / (1.0 - dead), 3) \
            if dead < 1 else float("inf")
        bias = "ZERO-bias" if th <= 1e-4 else "approx"
        print(f"[probe] T_thresh={th:g}: dead samples = {dead:.4f} "
              f"-> population ceiling {1 / (1 - dead):.2f}x ({bias})")
    # where the dead tail sits: mean per-ray first-dead index vs occupancy
    first_dead = np.where(
        (T_in < 1e-4) & mask, np.arange(mask.shape[1])[None, :],
        mask.shape[1],
    ).min(axis=1)
    per_ray = mask.sum(axis=1)
    hit = first_dead < mask.shape[1]
    if hit.any():
        print(f"[probe] rays saturating: {hit.mean():.3f}; on those, "
              f"first dead sample at index "
              f"{first_dead[hit].mean():.1f} of {per_ray[hit].mean():.1f} "
              f"valid samples")
        rec["saturating_rays"] = round(float(hit.mean()), 3)
        rec["mean_first_dead"] = round(float(first_dead[hit].mean()), 1)
        rec["mean_valid_on_saturating"] = round(float(per_ray[hit].mean()), 1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
