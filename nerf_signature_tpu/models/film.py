"""FiLM/SIREN message encoder (alternative message-conditioning design).

Equivalent of the reference's ``msgencoder.py`` (``msg_FiLM``, ``FiLMLayer``,
``CustomMappingNetwork``): a mapping MLP turns the bit string into per-layer
(frequency, phase) FiLM parameters that modulate sine layers applied to voxel
features.  The reference imports it (``hash_encoding_wtmk_bit.py:7``) but the
active path never instantiates it — it is the paper's ablated alternative to
the codebook encoder; provided here for completeness.

Init mirrors the reference: first sine layer U(+-1/in), later layers
U(+-sqrt(6/in)/25) (``msgencoder.py:19-45``); forward computes
``sin(freq * (Wx + b) + phase)`` with freq offset +30 like FiLM-SIREN.
"""

import jax
import jax.numpy as jnp
import numpy as np


def init_film_msg_encoder(key, message_dim=16, hidden=64, out_dim=2,
                          n_layers=3, feature_dim=2):
    """Params: mapping net (msg -> 2*hidden per layer) + sine layers."""
    keys = jax.random.split(key, 2 * n_layers + 2)
    layers = []
    d_in = feature_dim
    for i in range(n_layers):
        bound = 1.0 / d_in if i == 0 else np.sqrt(6.0 / d_in) / 25.0
        w = jax.random.uniform(keys[2 * i], (d_in, hidden), minval=-bound,
                               maxval=bound)
        b = jnp.zeros((hidden,))
        layers.append({"w": w, "b": b})
        d_in = hidden
    final = {
        "w": jax.random.uniform(keys[-2], (hidden, out_dim),
                                minval=-np.sqrt(6.0 / hidden) / 25.0,
                                maxval=np.sqrt(6.0 / hidden) / 25.0),
        "b": jnp.zeros((out_dim,)),
    }
    # mapping network: message -> per-layer (freq, phase)
    m_hidden = 64
    k1, k2 = jax.random.split(keys[-1])
    mapping = {
        "w1": jax.random.normal(k1, (message_dim, m_hidden)) * 0.1,
        "b1": jnp.zeros((m_hidden,)),
        "w2": jax.random.normal(k2, (m_hidden, n_layers * 2 * hidden)) * 0.01,
        "b2": jnp.zeros((n_layers * 2 * hidden,)),
    }
    return {"layers": layers, "final": final, "mapping": mapping}


def film_msg_encode(params, features, message):
    """features: [N, F] voxel features; message: [D] bits -> [N, out_dim]."""
    n_layers = len(params["layers"])
    hidden = params["layers"][0]["w"].shape[1]

    msg = message.astype(jnp.float32) * 2.0 - 1.0
    h = jax.nn.leaky_relu(msg @ params["mapping"]["w1"] + params["mapping"]["b1"],
                          0.2)
    fp = h @ params["mapping"]["w2"] + params["mapping"]["b2"]
    fp = fp.reshape(n_layers, 2, hidden)
    freqs, phases = fp[:, 0], fp[:, 1]

    x = features
    for i, layer in enumerate(params["layers"]):
        z = x @ layer["w"] + layer["b"]
        x = jnp.sin((freqs[i] * 15.0 + 30.0) * z + phases[i])
    return x @ params["final"]["w"] + params["final"]["b"]
