"""Model layer: NGP field networks (clean + watermarked), the codebook message
encoder, and the HiDDeN bit extractor — the TPU-native equivalents of
``nerf/network_hash.py``, ``nerf/network_wtmk_tcnn.py``,
``hash_encoding_wtmk_bit.py`` and ``nerf/hidden_models.py``."""

from .mlp import init_mlp, mlp_apply
from .ngp import NGPConfig, init_ngp_params, ngp_field, ngp_density, ngp_color
from .message import init_msg_tables, msg_encode, msg_effective_table
from .hidden import (
    HiddenDecoderConfig,
    init_hidden_decoder,
    hidden_decoder_apply,
    init_hidden_encoder,
    hidden_encoder_apply,
    normalize_img,
    unnormalize_img,
)
from .watermark import WatermarkConfig, init_watermark_params, wtmk_field, wtmk_density
