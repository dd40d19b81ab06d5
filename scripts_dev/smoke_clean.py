"""Dev smoke: train the clean NGP on a synthetic ball scene, CPU, tiny shapes."""

import os, sys, time, types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("SMOKE_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from nerf_signature_tpu.api import NGPModel
from nerf_signature_tpu.data.rays import get_rays, rand_poses
from nerf_signature_tpu.models.ngp import NGPConfig
from nerf_signature_tpu.train.trainer import Trainer


def synthetic_gt(rays_o, rays_d):
    """Analytic scene: solid red ball radius 0.4 at origin, white bg."""
    o, d = rays_o, rays_d
    b = np.sum(o * d, -1)
    c = np.sum(o * o, -1) - 0.4**2
    disc = b * b - c
    hit = disc > 0
    rgb = np.ones(o.shape, np.float32)
    rgb[hit] = [0.8, 0.2, 0.1]
    return rgb


class SynthLoader:
    """Minimal loader mimicking the provider batch dict."""

    def __init__(self, n_poses=10, H=64, W=64, num_rays=1024, seed=0):
        self.rng = np.random.default_rng(seed)
        self.poses = rand_poses(self.rng, n_poses, radius=1.5)
        self.intrinsics = np.array([70.0, 70.0, W / 2, H / 2])
        self.H, self.W, self.num_rays = H, W, num_rays
        self.error_map = None

    def __len__(self):
        return len(self.poses)

    def __iter__(self):
        for i in range(len(self.poses)):
            rays = get_rays(self.poses[i:i+1], self.intrinsics, self.H, self.W,
                            self.num_rays, rng=self.rng)
            gt = synthetic_gt(rays["rays_o"], rays["rays_d"])
            yield {"H": self.H, "W": self.W, "rays_o": rays["rays_o"],
                   "rays_d": rays["rays_d"], "images": gt}


def main():
    cfg = NGPConfig(bound=1.0, n_levels=8, log2_hashmap_size=15,
                    finest_resolution=256, compute_dtype=jnp.float32)
    model = NGPModel(cfg, grid_size=32, max_steps=256, train_budget=64,
                     infer_budget=64)
    opt = types.SimpleNamespace(lr=1e-2, iters=200, max_steps=256,
                                update_extra_interval=16, max_ray_batch=4096)
    tr = Trainer("smoke", opt, model, workspace="/tmp/smoke_ws",
                 use_checkpoint="scratch", eval_interval=1000)
    loader = SynthLoader()
    t0 = time.time()
    tr.train(loader, None, max_epochs=20)
    print("train time", time.time() - t0)

    # eval a full view
    rays = get_rays(loader.poses[:1], loader.intrinsics, 64, 64, -1)
    gt = synthetic_gt(rays["rays_o"], rays["rays_d"]).reshape(64, 64, 3)
    out = model.render(jnp.asarray(rays["rays_o"]), jnp.asarray(rays["rays_d"]),
                       staged=True, max_ray_batch=2048)
    pred = np.asarray(out["image"]).reshape(64, 64, 3)
    mse = np.mean((pred - gt) ** 2)
    psnr = -10 * np.log10(mse)
    print(f"PSNR {psnr:.2f}")


if __name__ == "__main__":
    main()
