"""Truncated-exponential activation.

TPU-native equivalent of the reference's ``activation.py:5-18`` (``trunc_exp``):
forward is a plain ``exp``; the backward clamps the *input* to [-15, 15] before
exponentiating so that a single huge pre-activation cannot blow up the gradient
in low precision.  The reference implements this as a
``torch.autograd.Function`` with ``custom_fwd(cast_inputs=float32)``; here it is
a ``jax.custom_vjp`` and callers are expected to keep sigma math in float32.
"""

import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x):
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)
