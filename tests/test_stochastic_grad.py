"""Stochastic-corner hash gradients (``stochastic_grad=True``).

Forward must be bit-identical to the deterministic path; the backward is a
one-corner-per-sample estimator whose aggregate over uniformly distributed
samples converges to the exact gradient (corner chosen with probability equal
to its trilinear weight).
"""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_signature_tpu.ops.hashenc import hash_encode, init_hash_table

RES = (4.0, 8.0)
S = 6  # tiny table so every cell accumulates many samples


class TestStochasticHashGrad:
    def test_forward_matches_deterministic(self):
        key = jax.random.PRNGKey(0)
        table = init_hash_table(key, 2, 2, S)
        x = jax.random.uniform(key, (257, 3))
        a = hash_encode(x, table, RES, S)
        b = hash_encode(x, table, RES, S, stochastic_grad=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    def test_gradient_unbiased_aggregate(self):
        key = jax.random.PRNGKey(1)
        k1, k2 = jax.random.split(key)
        table = init_hash_table(k1, 2, 2, S)
        x = jax.random.uniform(k2, (50_000, 3))

        def loss(t, stoch):
            # linear loss => cotangent independent of the estimator
            return jnp.sum(hash_encode(x, t, RES, S, stochastic_grad=stoch))

        g_exact = np.asarray(jax.grad(lambda t: loss(t, False))(table))
        g_stoch = np.asarray(jax.grad(lambda t: loss(t, True))(table))
        # cosine similarity of the flattened gradients
        a, b = g_exact.ravel(), g_stoch.ravel()
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
        assert cos > 0.98, cos
        # total mass is conserved exactly (sum of weights = 1 per sample)
        np.testing.assert_allclose(a.sum(), b.sum(), rtol=1e-3)

    def test_gradient_dtype_and_flow(self):
        key = jax.random.PRNGKey(2)
        table = init_hash_table(key, 2, 2, S)
        x = jax.random.uniform(key, (64, 3))

        def loss(t):
            return jnp.sum(
                hash_encode(x, t, RES, S, gather_dtype="bfloat16",
                            stochastic_grad=True) ** 2
            )

        g = jax.grad(loss)(table)
        assert g.dtype == jnp.float32
        assert float(jnp.abs(g).sum()) > 0

    def test_level_stride_unbiased_aggregate(self):
        """Backward level subsampling (hash_level_stride=2): forward exact,
        aggregate gradient over many samples ~ the exact gradient (each
        level kept with probability 1/stride, cotangent scaled by stride)."""
        key = jax.random.PRNGKey(3)
        k1, k2 = jax.random.split(key)
        table = init_hash_table(k1, 2, 2, S)
        x = jax.random.uniform(k2, (50_000, 3))

        fwd_a = hash_encode(x, table, RES, S, stochastic_grad=True)
        fwd_b = hash_encode(x, table, RES, S, stochastic_grad=True,
                            level_stride=2)
        np.testing.assert_allclose(np.asarray(fwd_a), np.asarray(fwd_b),
                                   atol=1e-7)

        def loss(t, stride):
            return jnp.sum(hash_encode(x, t, RES, S, stochastic_grad=True,
                                       level_stride=stride))

        g_exact = np.asarray(
            jax.grad(lambda t: jnp.sum(hash_encode(x, t, RES, S)))(table))
        g_sub = np.asarray(jax.grad(lambda t: loss(t, 2))(table))
        a, b = g_exact.ravel(), g_sub.ravel()
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
        assert cos > 0.97, cos
        # expected mass conserved (per-level-pair selection is fair-ish at
        # 50k samples; stride scaling restores the total)
        np.testing.assert_allclose(a.sum(), b.sum(), rtol=5e-2)

    def test_level_stride_actually_subsamples_per_sample(self):
        """NON-VACUOUS stride check: a SINGLE sample's gradient must touch
        only ceil(L/stride) levels when stride > 1 (round 3 shipped a
        wrapper that silently dropped the kwarg — the aggregate tests above
        pass trivially in that state; this one cannot)."""
        key = jax.random.PRNGKey(7)
        table = init_hash_table(key, 2, 2, S)
        x = jax.random.uniform(key, (1, 3))

        def per_level_mass(stride):
            g = np.asarray(jax.grad(
                lambda t: jnp.sum(hash_encode(x, t, RES, S,
                                              stochastic_grad=True,
                                              level_stride=stride))
            )(table))
            return (np.abs(g).reshape(2, -1).sum(axis=1) > 0)

        assert per_level_mass(1).sum() == 2
        assert per_level_mass(2).sum() == 1

    def test_level_stride_covers_both_phases(self):
        """Both level-parity classes receive gradient mass (the phase source
        must vary per sample, not per cell)."""
        key = jax.random.PRNGKey(4)
        table = init_hash_table(key, 2, 2, S)
        x = jax.random.uniform(key, (4096, 3))

        g = np.asarray(jax.grad(
            lambda t: jnp.sum(hash_encode(x, t, RES, S, stochastic_grad=True,
                                          level_stride=2))
        )(table))
        per_level = np.abs(g).reshape(2, -1).sum(axis=1)
        assert (per_level > 0).all(), per_level
