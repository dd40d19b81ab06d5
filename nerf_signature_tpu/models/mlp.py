"""Tiny bias-free MLPs (the tcnn ``FullyFusedMLP`` replacement).

The reference offloads its 64-wide sigma/color MLPs to tinycudann's fused CUDA
MLPs (``nerf/network_hash.py:39-75``).  "Fully fused" is a GPU-occupancy trick;
on TPU the right design is plain bf16 matmuls over the compacted sample batch —
XLA fuses the activation chain and the batch dimension (rays x samples, tens of
thousands) keeps the MXU busy.  Like tcnn, layers carry no biases.
"""

import jax
import jax.numpy as jnp
import numpy as np


def init_mlp(key, dims, dtype=jnp.float32):
    """dims: [in, hidden..., out].  He-uniform init, bias-free (tcnn-style)."""
    params = []
    for i in range(len(dims) - 1):
        key, sub = jax.random.split(key)
        fan_in = dims[i]
        bound = np.sqrt(6.0 / fan_in)
        params.append(
            jax.random.uniform(
                sub, (dims[i], dims[i + 1]), dtype=dtype, minval=-bound, maxval=bound
            )
        )
    return params


def mlp_apply(params, x, *, activation=jax.nn.relu, compute_dtype=None):
    """ReLU MLP with linear output; computes in ``compute_dtype`` (e.g. bf16)
    and returns float32."""
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    for i, w in enumerate(params):
        w_c = w.astype(compute_dtype) if compute_dtype is not None else w
        x = jnp.dot(x, w_c, preferred_element_type=x.dtype)
        if i < len(params) - 1:
            x = activation(x)
    return x.astype(jnp.float32)
