"""Parity tests for the native JAX LPIPS against a hand-written torch
forward over randomly initialised weights — validates the ingestion +
forward math without the real pretrained checkpoint (absent in this image).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from nerf_signature_tpu.utils.lpips import (
    _ALEX_CONVS,
    _POOL_BEFORE,
    _SCALE,
    _SHIFT,
    lpips_distance,
    lpips_params_from_state_dict,
)


def _random_state_dict(seed=0):
    """State dict with the exact lpips-alex key layout and shapes."""
    rng = np.random.default_rng(seed)
    conv_idx = [0, 3, 6, 8, 10]
    sd = {}
    for i, (o, c, k, _, _) in enumerate(_ALEX_CONVS):
        sd[f"net.slice{i + 1}.{conv_idx[i]}.weight"] = rng.normal(
            0, 1.0 / np.sqrt(c * k * k), (o, c, k, k)
        ).astype(np.float32)
        sd[f"net.slice{i + 1}.{conv_idx[i]}.bias"] = rng.normal(
            0, 0.01, (o,)
        ).astype(np.float32)
        sd[f"lin{i}.model.1.weight"] = np.abs(
            rng.normal(0, 1.0 / o, (1, o, 1, 1))
        ).astype(np.float32)
    return sd


def _torch_lpips(sd, img0, img1):
    """Reference forward in torch, written independently from lpips but to
    its published architecture (scaling -> alex taps -> unit-normalise ->
    squared diff -> 1x1 lin -> spatial mean -> sum)."""
    conv_idx = [0, 3, 6, 8, 10]
    shift = torch.tensor(_SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(_SCALE).view(1, 3, 1, 1)

    def feats(x):
        x = (x - shift) / scale
        out = []
        for i, (_, _, k, s, p) in enumerate(_ALEX_CONVS):
            if i in _POOL_BEFORE:
                x = F.max_pool2d(x, 3, stride=2)
            w = torch.tensor(sd[f"net.slice{i + 1}.{conv_idx[i]}.weight"])
            b = torch.tensor(sd[f"net.slice{i + 1}.{conv_idx[i]}.bias"])
            x = F.relu(F.conv2d(x, w, b, stride=s, padding=p))
            out.append(x)
        return out

    def norm(f):
        return f / torch.sqrt((f * f).sum(1, keepdim=True) + 1e-10)

    x0 = torch.tensor(img0).permute(0, 3, 1, 2) * 2 - 1
    x1 = torch.tensor(img1).permute(0, 3, 1, 2) * 2 - 1
    total = 0.0
    for i, (f0, f1) in enumerate(zip(feats(x0), feats(x1))):
        lin = torch.tensor(sd[f"lin{i}.model.1.weight"])
        d = (norm(f0) - norm(f1)) ** 2
        total = total + F.conv2d(d, lin).mean(dim=(1, 2, 3))
    return total.numpy()


def test_lpips_parity_with_torch_forward():
    sd = _random_state_dict()
    params = lpips_params_from_state_dict(sd)
    rng = np.random.default_rng(1)
    img0 = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    img1 = np.clip(img0 + rng.normal(0, 0.1, img0.shape), 0, 1).astype(
        np.float32
    )
    ours = np.asarray(lpips_distance(params, jnp.asarray(img0),
                                     jnp.asarray(img1)))
    ref = _torch_lpips(sd, img0, img1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)
    assert (ours > 0).all()
    # identical images -> zero distance
    zero = np.asarray(lpips_distance(params, jnp.asarray(img0),
                                     jnp.asarray(img0)))
    np.testing.assert_allclose(zero, 0.0, atol=1e-7)


def test_lpips_differentiable_and_min_size():
    params = lpips_params_from_state_dict(_random_state_dict())
    img0 = jnp.asarray(
        np.random.default_rng(2).uniform(0, 1, (1, 32, 32, 3)), jnp.float32
    )
    img1 = jnp.clip(img0 + 0.1, 0, 1)
    g = jax.grad(lambda a: jnp.mean(lpips_distance(params, a, img1)))(img0)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0
    with pytest.raises(ValueError, match="32"):
        lpips_distance(params, img0[:, :16, :16], img1[:, :16, :16])
