"""Watermarked NGP network: frozen clean backbone + codebook message encoder
+ HiDDeN bit extractor.

TPU-native equivalent of ``nerf/network_wtmk_tcnn.py:15-194``:
  * same clean backbone (hash encoder + sigma/color MLPs),
  * ``msg_encoder``: codebook tables (``models/message.py``), whose [N, 2]
    feature is added ONLY to the last 2 of the 32 hash features
    (``network_wtmk_tcnn.py:106``),
  * ``msg_decoder``: ``HiddenDecoder_multi_views(num_bits=1, num_blocks=8,
    input_ch=n_views*3, channels=64)`` (``network_wtmk_tcnn.py:47-49``),
  * freezing: the backbone never receives gradients.  In JAX this is
    expressed structurally: params are split into ``backbone`` (captured as a
    constant by the train step) and ``trainable`` (= msg_tables + decoder),
    instead of ``requires_grad`` flags — ``get_params``'s two param groups
    (``network_wtmk_tcnn.py:179-194``) become the ``trainable`` subtree.
"""

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..ops.activation import trunc_exp
from ..ops.hashenc import hash_encode

from .hidden import HiddenDecoderConfig, init_hidden_decoder
from .message import init_msg_tables, msg_effective_table
from .mlp import mlp_apply
from .ngp import NGPConfig, init_ngp_params, ngp_color


@dataclasses.dataclass(frozen=True)
class WatermarkConfig:
    ngp: NGPConfig = dataclasses.field(default_factory=NGPConfig)
    message_dim: int = 16
    n_views: int = 1
    msg_resolution: int = 2048
    msg_log2_hashmap_size: int = 19
    finetune_decoder: bool = False
    # legacy whole-image extraction (ref ``nerf/utils_wtmk.py:528-640``): the
    # decoder reads all message_dim bits from ONE whole rendered image instead
    # of 1 bit per key block
    whole_image: bool = False

    @property
    def decoder(self) -> HiddenDecoderConfig:
        return HiddenDecoderConfig(
            num_blocks=8,
            num_bits=self.message_dim if self.whole_image else 1,
            redundancy=1,
            input_ch=self.n_views * 3, channels=64,
        )


def init_watermark_params(key, cfg: WatermarkConfig) -> Dict[str, Any]:
    """Returns {'backbone': {...clean NGP...},
                'trainable': {'msg_tables', 'decoder'}}."""
    k_ngp, k_msg, k_dec = jax.random.split(key, 3)
    return {
        "backbone": init_ngp_params(k_ngp, cfg.ngp),
        "trainable": {
            "msg_tables": init_msg_tables(
                k_msg, cfg.message_dim, cfg.ngp.n_features,
                cfg.msg_log2_hashmap_size,
            ),
            "decoder": init_hidden_decoder(k_dec, cfg.decoder),
        },
    }


def _msg_feature(trainable, cfg: WatermarkConfig, x01, message):
    import numpy as np
    eff = msg_effective_table(trainable["msg_tables"], message)
    return hash_encode(
        x01, eff, np.array([float(cfg.msg_resolution)]),
        cfg.msg_log2_hashmap_size,
        gather_dtype=jnp.dtype(cfg.ngp.compute_dtype).name,
    )


def _encode_with_message(backbone, trainable, cfg: WatermarkConfig, x, message):
    ngp = cfg.ngp
    x01 = (x + ngp.bound) / (2.0 * ngp.bound)
    feat = hash_encode(
        x01, backbone["hash_table"], ngp.resolutions, ngp.log2_hashmap_size,
        gather_dtype=jnp.dtype(ngp.compute_dtype).name,
    )
    if message is not None:
        msg_feat = _msg_feature(trainable, cfg, x01, message)
        # message feature perturbs only the finest level's 2 features
        # (ref network_wtmk_tcnn.py:106)
        feat = feat.at[:, -2:].add(msg_feat)
    return feat


def wtmk_density(backbone, trainable, cfg: WatermarkConfig, x, message):
    """Ref ``network_wtmk_tcnn.py:126-143``."""
    ngp = cfg.ngp
    feat = _encode_with_message(backbone, trainable, cfg, x, message)
    h = mlp_apply(backbone["sigma_net"], feat, compute_dtype=ngp.compute_dtype)
    return {"sigma": trunc_exp(h[..., 0]), "geo_feat": h[..., 1:]}


def wtmk_field(backbone, trainable, cfg: WatermarkConfig, x, d, message):
    """Fused forward (sigma, rgb).  Ref ``network_wtmk_tcnn.py:97-124``."""
    ngp = cfg.ngp
    feat = _encode_with_message(backbone, trainable, cfg, x, message)
    h = mlp_apply(backbone["sigma_net"], feat, compute_dtype=ngp.compute_dtype)
    sigma = trunc_exp(h[..., 0])
    geo_feat = h[..., 1:]
    rgb = ngp_color(backbone, ngp, d, geo_feat)
    return sigma, rgb
