"""Native JAX LPIPS (alex) — in-graph, differentiable perceptual distance.

The reference uses LPIPS twice (``nerf/utils.py``):
  * patch-mode training loss: ``loss += 1e-3 * lpips(pred, gt)`` when
    ``patch_size > 1`` (``nerf/utils.py:374-377,519-528``),
  * the ``LPIPSMeter`` eval metric (``nerf/utils_wtmk_disen.py:285-319``).

A torch-side LPIPS cannot back-propagate into a JAX train step, so this is a
from-scratch jnp implementation of the LPIPS-alex forward (scaling layer ->
AlexNet feature taps relu1..relu5 -> channel-unit-normalise -> squared diff
-> 1x1 linear heads -> spatial mean -> sum over taps), jittable and
differentiable — the patch loss runs INSIDE the fused XLA train step.

Weights are ingested from the standard ``lpips`` torch checkpoints when they
exist locally (the package itself, or a full ``lpips.LPIPS(net='alex')``
state dict saved to a file — point ``--lpips_weights`` / ``$LPIPS_WEIGHTS``
at it).  The image used for CI has neither package nor weights (zero
egress), so every consumer must degrade EXPLICITLY: meters report n/a
(never a -1 sentinel), the patch loss logs one skip line.  The ingestion +
forward math is parity-tested against a hand-written torch forward over
randomly initialised weights (``tests/test_lpips.py``) so correctness does
not depend on the real checkpoint being present.
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

# lpips.ScalingLayer constants (lpips/lpips.py): input in [-1, 1]
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# torchvision alexnet.features conv layout: (out_ch, in_ch, k, stride, pad),
# with a 3x3/2 maxpool before convs 2 and 3 — the five LPIPS taps are the
# ReLU outputs of these five convs
_ALEX_CONVS = [
    (64, 3, 11, 4, 2),
    (192, 64, 5, 1, 2),
    (384, 192, 3, 1, 1),
    (256, 384, 3, 1, 1),
    (256, 256, 3, 1, 1),
]
_POOL_BEFORE = {1, 2}  # maxpool precedes conv index 1 and 2

MIN_SIZE = 32  # smallest H/W that survives the conv/pool stack


def init_lpips_params(key):
    """Random-init params with the exact shapes of lpips-alex — used by
    tests and as the ingestion target structure."""
    keys = jax.random.split(key, len(_ALEX_CONVS) * 2 + len(_ALEX_CONVS))
    convs, lins = [], []
    for i, (o, c, k, _, _) in enumerate(_ALEX_CONVS):
        fan = c * k * k
        convs.append({
            "w": jax.random.normal(keys[2 * i], (k, k, c, o)) / np.sqrt(fan),
            "b": jnp.zeros((o,), jnp.float32),
        })
        lins.append(
            jnp.abs(jax.random.normal(keys[2 * len(_ALEX_CONVS) + i], (o,)))
            / o
        )
    return {"convs": convs, "lins": lins}


def lpips_params_from_state_dict(sd):
    """Convert a torch ``lpips.LPIPS(net='alex')`` state dict (tensors or
    ndarrays) to the jnp param pytree.

    Key layout (lpips/lpips.py + lpips/pretrained_networks.py): conv weights
    at ``net.slice{1..5}.{0,3,6,8,10}.weight/bias`` (OIHW), linear heads at
    ``lin{0..4}.model.1.weight`` ([1, C, 1, 1], no bias).
    """
    def arr(v):
        v = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        return jnp.asarray(v, jnp.float32)

    conv_idx = [0, 3, 6, 8, 10]
    convs, lins = [], []
    for i, ci in enumerate(conv_idx):
        w = arr(sd[f"net.slice{i + 1}.{ci}.weight"])  # [O, I, k, k]
        b = arr(sd[f"net.slice{i + 1}.{ci}.bias"])
        convs.append({"w": jnp.transpose(w, (2, 3, 1, 0)), "b": b})  # HWIO
        lin = arr(sd[f"lin{i}.model.1.weight"])  # [1, C, 1, 1]
        lins.append(lin.reshape(-1))
    return {"convs": convs, "lins": lins}


def load_lpips_params(path=None):
    """Best-effort weight resolution: an explicit state-dict file, the
    ``$LPIPS_WEIGHTS`` env var, or the ``lpips`` package (which needs its
    bundled checkpoints + torchvision's pretrained AlexNet — absent in
    zero-egress images).  Returns the param pytree or None."""
    path = path or os.environ.get("LPIPS_WEIGHTS")
    if path:
        if not os.path.exists(path):
            # an EXPLICITLY requested weight file must not degrade silently
            # (a typo'd --lpips_weights would otherwise train for hours
            # without the perceptual loss); mirrors the CLIP path's policy
            raise FileNotFoundError(
                f"--lpips_weights / $LPIPS_WEIGHTS points at {path!r}, "
                f"which does not exist"
            )
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        sd = sd.get("state_dict", sd)
        return lpips_params_from_state_dict(sd)
    try:
        import lpips as lpips_pkg

        model = lpips_pkg.LPIPS(net="alex")
        return lpips_params_from_state_dict(model.state_dict())
    except Exception:
        return None


def _conv(x, w, b, stride, pad):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b


def _maxpool3x3s2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


def _alex_feats(params, x):
    """x: [B, H, W, 3] in [-1, 1].  Returns the 5 tap activations."""
    x = (x - _SHIFT) / _SCALE
    feats = []
    for i, ((_, _, k, s, p), conv) in enumerate(zip(_ALEX_CONVS,
                                                    params["convs"])):
        if i in _POOL_BEFORE:
            x = _maxpool3x3s2(x)
        x = jax.nn.relu(_conv(x, conv["w"], conv["b"], s, p))
        feats.append(x)
    return feats


def lpips_distance(params, img0, img1):
    """LPIPS(img0, img1) per batch element.

    img0, img1: [B, H, W, 3] in [0, 1] (converted to the [-1, 1] domain the
    torch implementation expects), H, W >= MIN_SIZE.  Returns [B].
    """
    if img0.shape[1] < MIN_SIZE or img0.shape[2] < MIN_SIZE:
        raise ValueError(
            f"LPIPS needs images >= {MIN_SIZE}px (got {img0.shape[1:3]}); "
            "the AlexNet stack collapses below that"
        )
    x0 = img0.astype(jnp.float32) * 2.0 - 1.0
    x1 = img1.astype(jnp.float32) * 2.0 - 1.0
    total = 0.0
    for f0, f1, lin in zip(_alex_feats(params, x0), _alex_feats(params, x1),
                           params["lins"]):
        n0 = f0 * jax.lax.rsqrt(jnp.sum(f0 * f0, -1, keepdims=True) + 1e-10)
        n1 = f1 * jax.lax.rsqrt(jnp.sum(f1 * f1, -1, keepdims=True) + 1e-10)
        d = (n0 - n1) ** 2
        total = total + jnp.mean(jnp.sum(d * lin, -1), axis=(1, 2))  # [B]
    return total


@functools.partial(jax.jit)
def _lpips_jit(params, img0, img1):
    return lpips_distance(params, img0, img1)


def lpips_metric(params, img0, img1):
    """Host-facing metric entry: mean LPIPS over the batch (float)."""
    return float(jnp.mean(_lpips_jit(params, jnp.asarray(img0),
                                     jnp.asarray(img1))))
