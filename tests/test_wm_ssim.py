"""--lambda_ssim structural content guard in the watermark stage.

The per-ray content MSE is blind to the spatial structure of the message
perturbation (high-frequency density speckle); ``--patch_size`` +
``--lambda_ssim`` adds an in-graph 1-SSIM term over patch-structured content
rays.  Covers: the jnp SSIM matches the host (numpy) SSIM, the loss term
actually changes the objective and its gradient, and the scan loop's
device-side patch sampler emits valid contiguous-patch pixel indices.
"""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_signature_tpu.api import WatermarkModel
from nerf_signature_tpu.models.ngp import NGPConfig
from nerf_signature_tpu.models.watermark import WatermarkConfig
from nerf_signature_tpu.train.metrics import ssim, ssim_jnp
from nerf_signature_tpu.train.trainer_wtmk import WatermarkTrainer


def test_ssim_jnp_matches_host_ssim():
    rng = np.random.default_rng(0)
    a = rng.random((24, 24, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    got = float(ssim_jnp(jnp.asarray(a)[None], jnp.asarray(b)[None]))
    want = ssim(a, b)
    assert abs(got - want) < 1e-3
    assert float(ssim_jnp(jnp.asarray(a)[None], jnp.asarray(a)[None])) > 0.9999


def test_ssim_jnp_small_patch_window_shrinks():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.random((2, 8, 8, 3)), jnp.float32)
    v = float(ssim_jnp(a, a))  # 8 < 11: window must shrink, not crash
    assert v > 0.9999


def test_ssim_jnp_is_differentiable():
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.random((1, 16, 16, 3)), jnp.float32)
    b = jnp.asarray(rng.random((1, 16, 16, 3)), jnp.float32)
    g = jax.grad(lambda x: 1.0 - ssim_jnp(x, b))(a)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0


def _tiny_trainer(patch_size=1, lambda_ssim=0.0, num_rays=16):
    cfg = NGPConfig(bound=1.0, n_levels=4, log2_hashmap_size=10,
                    finest_resolution=64, compute_dtype=jnp.float32)
    wcfg = WatermarkConfig(ngp=cfg, message_dim=2, msg_resolution=64,
                           msg_log2_hashmap_size=10)
    model = WatermarkModel(wcfg, grid_size=16, max_steps=64,
                           train_budget=16, infer_budget=16)
    model.occ = model.occ._replace(
        occupancy=model.occ.occupancy.at[:].set(True)
    )
    opt = types.SimpleNamespace(
        seed=0, iters=4, lr=1e-2, lambda_w=0.5, lambda_i=1.0,
        loss_w="bce", distortion="none", message_dim=2, devices=0,
        num_rays=num_rays, patch_size=patch_size, lambda_ssim=lambda_ssim,
    )
    return WatermarkTrainer("ssim", opt, model, workspace=None,
                            use_checkpoint="scratch", mute=True)


def _patch_batch(pp, npatch):
    n = npatch * pp * pp
    rng = np.random.default_rng(3)
    ro = np.zeros((n, 3), np.float32) - 2.0
    rd = np.tile(np.array([1, 0, 0], np.float32), (n, 1))
    gt = rng.random((n, 3)).astype(np.float32)
    D, bh, bw = 2, 4, 4
    return {
        "watermark": {
            "rays_o_block": np.zeros((D, bh, bw, 3), np.float32) - 2.0,
            "rays_d_block": np.tile(np.array([1, 0, 0], np.float32),
                                    (D, bh, bw, 1)),
        },
        "content": {"rays_o": ro, "rays_d": rd, "images": gt},
    }


def test_lambda_ssim_changes_the_objective():
    data = _patch_batch(pp=4, npatch=1)
    msg = np.array([0, 1], np.int32)
    base = _tiny_trainer(patch_size=4, lambda_ssim=0.0)
    guard = _tiny_trainer(patch_size=4, lambda_ssim=0.5)
    l0 = float(base.train_step_data(data, msg)[0])
    l1 = float(guard.train_step_data(data, msg)[0])
    # random GT vs a near-constant render: SSIM is far from 1, so the
    # guarded loss must carry a strictly positive extra term
    assert l1 > l0 + 1e-4
    assert np.isfinite(l1)


def test_lambda_ssim_without_patches_is_rejected():
    with pytest.raises(ValueError):
        _tiny_trainer(patch_size=1, lambda_ssim=0.5)


def test_device_loop_patch_sampling_runs():
    from nerf_signature_tpu.train.trainer_wtmk import _wm_device_loop

    tr = _tiny_trainer(patch_size=4, lambda_ssim=0.25)
    m = tr.model
    data = _patch_batch(pp=4, npatch=1)
    H = W = 8
    P = 2
    poses = np.tile(np.eye(4, dtype=np.float32), (P, 1, 1))
    poses[:, 0, 3] = -2.0
    state = tr.optimizer.init(m.trainable)
    out = _wm_device_loop(
        m.backbone, m.trainable, state, m.occ.occupancy,
        jnp.asarray(data["watermark"]["rays_o_block"]),
        jnp.asarray(data["watermark"]["rays_d_block"]),
        jnp.asarray(poses), jnp.full((P, H * W, 3), 0.5),
        jnp.asarray([8.0, 8.0, 4.0, 4.0], jnp.float32),
        jax.random.PRNGKey(0), jnp.float32(0.5), jnp.float32(1.0),
        m.wcfg, m.rc, 16, 16, tr.optimizer.update, "none", "bce",
        2, 16, H, W, patch_size=4, lambda_ssim=jnp.float32(0.25),
    )
    losses = np.asarray(out[2])
    assert losses.shape == (2,) and np.all(np.isfinite(losses))


def test_device_patch_pixels_are_contiguous_grids():
    """The device sampler must emit the same contiguous-patch index layout
    as data/rays.get_rays(patch_size=...)."""
    H, W, pp = 16, 16, 4
    kx, ky, _ = jax.random.split(jax.random.PRNGKey(7), 3)
    tx = jax.random.randint(kx, (2,), 0, H - pp)
    ty = jax.random.randint(ky, (2,), 0, W - pp)
    pi, pj = np.meshgrid(np.arange(pp), np.arange(pp), indexing="ij")
    off = jnp.asarray(pi.ravel() * W + pj.ravel())
    pix = np.asarray(((tx * W + ty)[:, None] + off[None]).reshape(-1))
    for p in range(2):
        block = pix[p * pp * pp:(p + 1) * pp * pp].reshape(pp, pp)
        rows, cols = block // W, block % W
        # rows constant along each row of the patch, +1 per row down
        assert np.array_equal(rows, rows[0:1, :] + np.arange(pp)[:, None])
        assert np.array_equal(cols, cols[:, 0:1] + np.arange(pp)[None, :])
        assert rows.max() < H and cols.max() < W
