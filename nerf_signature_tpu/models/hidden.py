"""HiDDeN-style CNN bit extractor (and watermark encoder).

TPU-native equivalent of ``nerf/hidden_models.py``:
  * ``ConvBNRelu`` = Conv3x3(stride 1, pad 1) + BatchNorm(eps=1e-3,
    track_running_stats=False) + GELU (``hidden_models.py:16-35``).
    ``track_running_stats=False`` means torch normalises by BATCH statistics in
    both train and eval — a pure function of the batch, which is exactly what
    we implement (no mutable running-mean state, jit-friendly).
  * ``HiddenDecoder_multi_views``: ``num_blocks`` conv blocks -> conv to
    ``num_bits * redundancy`` -> global average pool -> Linear -> sum over
    redundancy (``hidden_models.py:104-137``).
  * ImageNet normalize/unnormalize (``hidden_models.py:13-14``).

Layout is NHWC (TPU-native; the reference is NCHW).  Init mirrors torch
Conv2d/Linear defaults (kaiming-uniform a=sqrt(5) => U(+-1/sqrt(fan_in)))
so training dynamics match.
"""

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def normalize_img(x):
    """x: [..., 3] in [0, 1] -> ImageNet-normalised (channel-last)."""
    return (x - _IMAGENET_MEAN) / _IMAGENET_STD


def unnormalize_img(x):
    return x * _IMAGENET_STD + _IMAGENET_MEAN


@dataclasses.dataclass(frozen=True)
class HiddenDecoderConfig:
    num_blocks: int = 8
    num_bits: int = 1
    redundancy: int = 1
    input_ch: int = 3        # n_views * 3 in the reference
    channels: int = 64
    bn_eps: float = 1e-3


def _conv_init(key, k, cin, cout):
    """torch Conv2d default: kaiming_uniform(a=sqrt(5)) -> U(+-1/sqrt(fan_in));
    bias U(+-1/sqrt(fan_in)).  HWIO layout."""
    fan_in = cin * k * k
    bound = 1.0 / np.sqrt(fan_in)
    kw, kb = jax.random.split(key)
    w = jax.random.uniform(kw, (k, k, cin, cout), minval=-bound, maxval=bound)
    b = jax.random.uniform(kb, (cout,), minval=-bound, maxval=bound)
    return {"w": w, "b": b}


def _bn_init(ch):
    return {"scale": jnp.ones((ch,)), "bias": jnp.zeros((ch,))}


def _conv3x3(p, x):
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["b"]


def _batch_norm(p, x, eps):
    # batch statistics over (N, H, W) per channel — both train and eval,
    # matching track_running_stats=False
    mean = jnp.mean(x, axis=(0, 1, 2), keepdims=True)
    var = jnp.var(x, axis=(0, 1, 2), keepdims=True)
    xn = (x - mean) * jax.lax.rsqrt(var + eps)
    return xn * p["scale"] + p["bias"]


def _conv_bn_gelu(p, x, eps):
    return jax.nn.gelu(_batch_norm(p["bn"], _conv3x3(p["conv"], x), eps))


def init_hidden_decoder(key, cfg: HiddenDecoderConfig) -> Dict[str, Any]:
    keys = jax.random.split(key, cfg.num_blocks + 3)
    blocks = []
    cin = cfg.input_ch
    for i in range(cfg.num_blocks):
        blocks.append(
            {"conv": _conv_init(keys[i], 3, cin, cfg.channels),
             "bn": _bn_init(cfg.channels)}
        )
        cin = cfg.channels
    out_ch = cfg.num_bits * cfg.redundancy
    head = {"conv": _conv_init(keys[-3], 3, cfg.channels, out_ch),
            "bn": _bn_init(out_ch)}
    fan_in = out_ch
    bound = 1.0 / np.sqrt(fan_in)
    kw, kb = jax.random.split(keys[-1])
    linear = {
        "w": jax.random.uniform(kw, (out_ch, out_ch), minval=-bound, maxval=bound),
        "b": jax.random.uniform(kb, (out_ch,), minval=-bound, maxval=bound),
    }
    return {"blocks": blocks, "head": head, "linear": linear}


def hidden_decoder_apply(params, cfg: HiddenDecoderConfig, x):
    """x: [B, H, W, input_ch] (already normalised) -> logits [B, num_bits].

    Mirrors ``HiddenDecoder_multi_views.forward`` (``hidden_models.py:125-137``).
    """
    for p in params["blocks"]:
        x = _conv_bn_gelu(p, x, cfg.bn_eps)
    x = _conv_bn_gelu(params["head"], x, cfg.bn_eps)
    x = jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d((1,1)) -> [B, out_ch]
    x = x @ params["linear"]["w"] + params["linear"]["b"]
    x = x.reshape(-1, cfg.num_bits, cfg.redundancy)
    return jnp.sum(x, axis=-1)


@dataclasses.dataclass(frozen=True)
class HiddenDecoderSingleConfig:
    """Single-view decoder (ref ``HiddenDecoder``, ``hidden_models.py:77-102``):
    same conv stack but with ``ConvBNRelu_original`` — BatchNorm WITH running
    statistics.  In JAX the running stats are explicit state threaded by the
    caller (pure function, no mutation)."""

    num_blocks: int = 7
    num_bits: int = 16
    channels: int = 64
    bn_eps: float = 1e-3
    momentum: float = 0.1


def init_hidden_decoder_single(key, cfg: HiddenDecoderSingleConfig):
    keys = jax.random.split(key, cfg.num_blocks + 3)
    blocks, state = [], []
    cin = 3
    chans = [cfg.channels] * cfg.num_blocks + [cfg.num_bits]
    for i, cout in enumerate(chans):
        blocks.append({"conv": _conv_init(keys[i], 3, cin, cout),
                       "bn": _bn_init(cout)})
        state.append({"mean": jnp.zeros((cout,)), "var": jnp.ones((cout,))})
        cin = cout
    bound = 1.0 / np.sqrt(cfg.num_bits)
    kw, kb = jax.random.split(keys[-1])
    linear = {
        "w": jax.random.uniform(kw, (cfg.num_bits, cfg.num_bits),
                                minval=-bound, maxval=bound),
        "b": jax.random.uniform(kb, (cfg.num_bits,), minval=-bound,
                                maxval=bound),
    }
    return {"blocks": blocks, "linear": linear}, {"bn": state}


def hidden_decoder_single_apply(params, state, cfg, x, train=False):
    """x [B, H, W, 3] -> (logits [B, num_bits], new_state).

    train=True normalises by batch stats and EMA-updates the running stats;
    train=False uses the running stats (torch BatchNorm semantics)."""
    new_bn = []
    for p, s in zip(params["blocks"], state["bn"]):
        y = _conv3x3(p["conv"], x)
        if train:
            mean = jnp.mean(y, axis=(0, 1, 2))
            var = jnp.var(y, axis=(0, 1, 2))
            new_bn.append({
                "mean": (1 - cfg.momentum) * s["mean"] + cfg.momentum * mean,
                "var": (1 - cfg.momentum) * s["var"] + cfg.momentum * var,
            })
        else:
            mean, var = s["mean"], s["var"]
            new_bn.append(s)
        y = (y - mean) * jax.lax.rsqrt(var + cfg.bn_eps)
        x = jax.nn.gelu(y * p["bn"]["scale"] + p["bn"]["bias"])
    x = jnp.mean(x, axis=(1, 2))
    logits = x @ params["linear"]["w"] + params["linear"]["b"]
    return logits, {"bn": new_bn}


@dataclasses.dataclass(frozen=True)
class HiddenEncoderConfig:
    num_blocks: int = 4
    num_bits: int = 16
    channels: int = 64
    last_tanh: bool = True
    bn_eps: float = 1e-3


def init_hidden_encoder(key, cfg: HiddenEncoderConfig) -> Dict[str, Any]:
    keys = jax.random.split(key, cfg.num_blocks + 2)
    blocks = []
    cin = 3
    for i in range(cfg.num_blocks):
        blocks.append(
            {"conv": _conv_init(keys[i], 3, cin, cfg.channels),
             "bn": _bn_init(cfg.channels)}
        )
        cin = cfg.channels
    after = {
        "conv": _conv_init(keys[-2], 3, cfg.channels + 3 + cfg.num_bits, cfg.channels),
        "bn": _bn_init(cfg.channels),
    }
    final = _conv_init(keys[-1], 1, cfg.channels, 3)
    return {"blocks": blocks, "after": after, "final": final}


def hidden_encoder_apply(params, cfg, imgs, msgs):
    """imgs [B, H, W, 3], msgs [B, num_bits] -> watermarked residual [B, H, W, 3].
    Ref ``HiddenEncoder.forward`` (``hidden_models.py:159-173``)."""
    x = imgs
    for p in params["blocks"]:
        x = _conv_bn_gelu(p, x, cfg.bn_eps)
    B, H, W, _ = imgs.shape
    m = jnp.broadcast_to(msgs[:, None, None, :], (B, H, W, msgs.shape[-1]))
    concat = jnp.concatenate([m, x, imgs], axis=-1)
    x = _conv_bn_gelu(params["after"], concat, cfg.bn_eps)
    x = _conv3x3(params["final"], x)
    if cfg.last_tanh:
        x = jnp.tanh(x)
    return x
