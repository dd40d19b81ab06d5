"""Viewer resolution/latency curve (VERDICT r4 next #8): measure the
browser viewer's render path (staged render + host assembly, the same
calls ``Viewer.render_view`` makes) at each downscale on a trained
workspace, so the "interactive via adaptive downscale" claim is a table,
not an adjective.

Usage: python scripts_dev/viewer_latency.py <scene_dir> --workspace <ws> \
           [--W 800 --H 800] [--infer_budget 128] [usual CLI flags]
Prints one JSON line per downscale: {downscale, H, W, first_ms (compile),
steady_ms (median of 5), fps}.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    from nerf_signature_tpu.utils.config import add_common_args, apply_O_macro

    add_common_args(parser)
    opt = apply_O_macro(parser.parse_args())

    import jax

    if opt.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from nerf_signature_tpu.api import NGPModel
    from nerf_signature_tpu.data.rays import get_rays
    from nerf_signature_tpu.models.ngp import NGPConfig
    from nerf_signature_tpu.train.trainer import Trainer
    from nerf_signature_tpu.viewer import OrbitCamera

    cfg = NGPConfig(
        bound=opt.bound,
        compute_dtype=jnp.bfloat16 if opt.fp16 else jnp.float32,
        n_levels=opt.n_levels, n_features=opt.n_features,
    )
    model = NGPModel(
        cfg, cuda_ray=opt.cuda_ray, min_near=opt.min_near,
        density_thresh=opt.density_thresh, dt_gamma=opt.dt_gamma,
        max_steps=opt.max_steps, grid_size=opt.grid_size,
        infer_budget=opt.infer_budget,
    )
    trainer = Trainer("ngp", opt, model, workspace=opt.workspace,
                      use_checkpoint=opt.ckpt)
    del trainer  # only needed for the checkpoint restore side effects

    cam = OrbitCamera(opt.W, opt.H, r=opt.radius, fovy=opt.fovy)
    for ds in (8, 4, 2, 1):
        H, W = opt.H // ds, opt.W // ds
        intr = cam.intrinsics / ds
        rays = get_rays(cam.pose[None], intr, H, W, -1)
        ro = jnp.asarray(rays["rays_o"]).reshape(-1, 3)
        rd = jnp.asarray(rays["rays_d"]).reshape(-1, 3)

        def frame():
            out = model.render(ro, rd, staged=True, max_ray_batch=4096,
                               bg_color=np.ones((1, 3), np.float32),
                               budget=opt.infer_budget)
            return float(np.asarray(out["image"]).sum())

        t0 = time.perf_counter()
        frame()
        first_ms = (time.perf_counter() - t0) * 1e3
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            frame()
            times.append((time.perf_counter() - t0) * 1e3)
        steady = float(np.median(times))
        print(json.dumps({
            "downscale": ds, "H": H, "W": W,
            "first_ms": round(first_ms, 1),
            "steady_ms": round(steady, 1),
            "fps": round(1000.0 / steady, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
