"""CopyRNeRF baseline: color-space message watermarking.

The reference vendors this comparison method as a stale experimental snapshot
(``nerf/.ipynb_checkpoints/network_copyrnerf_tcnn-checkpoint.py`` +
``utils_wtmk_copyrnerf-checkpoint.py``) built around an external
``CopyRNeRF.encoder.Encoder_Tri_MLP_f`` module that is NOT in the tree —
the upstream variant cannot run.  What its call site pins down
(``network_copyrnerf_tcnn-checkpoint.py:51-53,187-193``):

  * the message enters through an MLP over three input groups — frequency-
    encoded position (10 freqs -> 60 dims, via ``encoder_pos``), frequency-
    encoded direction (4 freqs -> 24 dims, via ``encoder_dir_2``), and the
    backbone's (color, raw sigma) pair — concatenated with the message bits
    (``Encoder_Tri_MLP_f(D=3, W=256, input_ch=60, input_ch_color=4,
    input_ch_message=message_dim, input_ch_views=24, output_ch=3)``),
  * it REPLACES the per-sample color (``color = self.msg_encoder(...)``);
    density is untouched by the message,
  * extraction is whole-image: ``HiddenDecoder_multi_views(num_bits=
    message_dim, input_ch=3)`` decodes all bits from one rendered view
    (``:56-58``), trained with BCE + MSE exactly like the main method
    (``utils_wtmk_copyrnerf-checkpoint.py:588-615``).

This module is a working TPU-native completion of that design: a plain
3-layer/256-wide ReLU MLP over ``[pe(x), pe(d), rgb, sigma_raw, msg]`` with a
sigmoid head, residually blended with the clean color so the zero-init state
starts at the clean render.  Enabled via ``WatermarkConfig.copyrnerf``; the
rest of the pipeline (trainer, key datasets, attacks) is shared.
"""

import jax
import jax.numpy as jnp
import numpy as np


def freq_encode(x, n_freqs):
    """tcnn-style 'Frequency' encoding: [..., C] -> [..., C * 2 * n_freqs]
    with sin/cos of 2**k * pi * x.

    Layout: everything stays flat [..., C*n_freqs] (sample-minor) — no
    [N, C, n_freqs]-style small-minor intermediate for TPU register tiling
    to pad (CLAUDE.md layout rule).  Feature ORDER (all sins channel-major,
    then all coses) is an internal convention consumed only by the jointly
    trained msg MLP — checkpoints pin it from their first training step."""
    C = x.shape[-1]
    freqs = np.tile((2.0 ** np.arange(n_freqs)).astype(np.float32) * np.pi, C)
    ang = jnp.repeat(x, n_freqs, axis=-1) * freqs  # [..., C * n_freqs]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def init_copyrnerf_mlp(key, message_dim, width=256, depth=3,
                       n_freqs_pos=10, n_freqs_dir=4):
    """Message-color MLP params.  Input = pe(x) 60 + pe(d) 24 + rgb 3 +
    sigma_raw 1 + message_dim; output = 3 (color logits)."""
    in_dim = 3 * 2 * n_freqs_pos + 3 * 2 * n_freqs_dir + 4 + message_dim
    dims = [in_dim] + [width] * (depth - 1) + [3]
    keys = jax.random.split(key, len(dims) - 1)
    layers = []
    for k, (a, b) in zip(keys, zip(dims[:-1], dims[1:])):
        bound = 1.0 / np.sqrt(a)
        kw, kb = jax.random.split(k)
        layers.append({
            "w": jax.random.uniform(kw, (a, b), minval=-bound, maxval=bound),
            "b": jax.random.uniform(kb, (b,), minval=-bound, maxval=bound),
        })
    return {"layers": layers}


def copyrnerf_color(params, x01, d, rgb, sigma_raw, message,
                    n_freqs_pos=10, n_freqs_dir=4, replace=False):
    """Watermarked per-sample color.

    x01: [N, 3] in [0, 1] (scaled position; the reference feeds ``2*x-1``
    into its frequency encoder, ``network_copyrnerf_tcnn-checkpoint.py:188``);
    d: [N, 3] unit directions; rgb: [N, 3] clean color; sigma_raw: [N] the
    pre-activation density logit; message: [message_dim] 0/1 bits.

    replace=True reproduces the upstream design exactly — the MLP REPLACES
    the per-sample color (``color = self.msg_encoder(...)``, checkpoint
    ``:193``); the default residual blend bounds the message channel to
    +-0.5 around the clean color and starts AT the clean render at zero
    init, so baseline tables must state which variant produced them.
    """
    n = x01.shape[0]
    msg = jnp.broadcast_to(
        (2.0 * message.astype(jnp.float32) - 1.0)[None, :],
        (n, message.shape[0]),
    )
    h = jnp.concatenate(
        [
            freq_encode(2.0 * x01 - 1.0, n_freqs_pos),
            freq_encode(d, n_freqs_dir),
            rgb.astype(jnp.float32),
            sigma_raw.astype(jnp.float32)[:, None],
            msg,
        ],
        axis=-1,
    )
    for layer in params["layers"][:-1]:
        h = jax.nn.relu(h @ layer["w"] + layer["b"])
    out = h @ params["layers"][-1]["w"] + params["layers"][-1]["b"]
    if replace:
        # upstream-exact: message MLP output IS the color (sigmoid head like
        # the backbone's color net; checkpoint ``:193``)
        return jax.nn.sigmoid(out)
    # residual blend around the clean color: sigmoid(logit(rgb) + out) would
    # need a stable logit; equivalent zero-init-safe form below keeps the
    # watermarked field exactly at the clean render when ``out == 0``.
    return jnp.clip(rgb + jnp.tanh(out) * 0.5, 0.0, 1.0)
