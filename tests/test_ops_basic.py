"""Unit tests for core field ops vs closed-form / reference-semantics values."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_signature_tpu.ops import (
    composite_rays,
    hash_coords,
    hash_encode,
    init_hash_table,
    level_resolutions,
    morton3d,
    morton3d_invert,
    near_far_from_aabb,
    sample_pdf,
    sh_encode,
    trunc_exp,
)


class TestTruncExp:
    def test_forward(self):
        x = jnp.array([-2.0, 0.0, 3.0])
        np.testing.assert_allclose(trunc_exp(x), np.exp([-2.0, 0.0, 3.0]), rtol=1e-6)

    def test_backward_clamped(self):
        # gradient at x=20 must use exp(15), not exp(20)
        g = jax.grad(lambda x: trunc_exp(x))(20.0)
        np.testing.assert_allclose(g, np.exp(15.0), rtol=1e-6)
        g = jax.grad(lambda x: trunc_exp(x))(2.0)
        np.testing.assert_allclose(g, np.exp(2.0), rtol=1e-6)


class TestMorton:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        coords = rng.integers(0, 1024, size=(100, 3)).astype(np.uint32)
        codes = morton3d(jnp.asarray(coords))
        back = morton3d_invert(codes)
        np.testing.assert_array_equal(np.asarray(back), coords)

    def test_known_values(self):
        # interleave xyz with x in the low bit: (1,0,0)->1, (0,1,0)->2, (0,0,1)->4
        assert int(morton3d(jnp.array([1, 0, 0], jnp.uint32))) == 1
        assert int(morton3d(jnp.array([0, 1, 0], jnp.uint32))) == 2
        assert int(morton3d(jnp.array([0, 0, 1], jnp.uint32))) == 4
        assert int(morton3d(jnp.array([3, 3, 3], jnp.uint32))) == 63


class TestHash:
    def test_matches_torch_semantics(self):
        # replicate the reference's int32-wraparound XOR hash in numpy
        primes = np.array([1, 2654435761, 805459861], dtype=np.uint64)
        rng = np.random.default_rng(1)
        coords = rng.integers(0, 2048, size=(64, 3)).astype(np.uint32)
        expect = np.zeros(64, dtype=np.uint64)
        for i in range(3):
            expect ^= (coords[:, i].astype(np.uint64) * primes[i]) & 0xFFFFFFFF
        expect = expect & ((1 << 19) - 1)
        got = hash_coords(jnp.asarray(coords), 19)
        np.testing.assert_array_equal(np.asarray(got, dtype=np.uint64), expect)

    def test_resolutions(self):
        res = level_resolutions(16, 16, 2048)
        assert res[0] == 16
        assert res[-1] == 2048
        # geometric growth
        assert np.all(np.diff(res) > 0)

    def test_encode_shapes_and_interp(self):
        key = jax.random.PRNGKey(0)
        table = init_hash_table(key, 4, 2, 8)
        res = level_resolutions(4, 4, 32)
        x = jax.random.uniform(jax.random.PRNGKey(1), (17, 3))
        out = hash_encode(x, table, res, 8)
        assert out.shape == (17, 8)
        # encoding is continuous: nearby points give nearby features
        eps = 1e-5
        out2 = hash_encode(x + eps, table, res, 8)
        np.testing.assert_allclose(out, out2, atol=1e-4)

    def test_exact_corner_value(self):
        # at an exact lattice point of a 1-level grid, the encoding equals the
        # table entry of that corner's hash (trilinear weight collapses)
        log2s = 10
        table = (
            jnp.arange(1 << log2s, dtype=jnp.float32)[:, None]
            * jnp.ones((1, 2))
        )
        res = np.array([8.0])
        x = jnp.array([[0.25, 0.5, 0.75]])  # lattice coords (2, 4, 6) at res 8
        idx = hash_coords(jnp.array([[2, 4, 6]], jnp.uint32), log2s)
        out = hash_encode(x, table, res, log2s)
        np.testing.assert_allclose(out[0, 0], float(idx[0]), rtol=1e-6)


class TestSH:
    def test_constant_term(self):
        d = jnp.array([[0.0, 0.0, 1.0]])
        out = sh_encode(d, degree=1)
        np.testing.assert_allclose(out, [[0.28209479177387814]], rtol=1e-6)

    def test_degree4_shape_and_values(self):
        d = jnp.array([[0.0, 1.0, 0.0]])
        out = sh_encode(d, degree=4)
        assert out.shape == (1, 16)
        # l=1: (-C1*y, C1*z, -C1*x)
        np.testing.assert_allclose(out[0, 1], -0.4886025119029199, rtol=1e-6)
        np.testing.assert_allclose(out[0, 2], 0.0, atol=1e-7)
        np.testing.assert_allclose(out[0, 3], 0.0, atol=1e-7)


class TestAABB:
    def test_axis_ray(self):
        o = jnp.array([[-3.0, 0.0, 0.0]])
        d = jnp.array([[1.0, 0.0, 0.0]])
        aabb = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
        near, far = near_far_from_aabb(o, d, aabb, min_near=0.2)
        np.testing.assert_allclose(near, [2.0], rtol=1e-6)
        np.testing.assert_allclose(far, [4.0], rtol=1e-6)

    def test_miss(self):
        o = jnp.array([[-3.0, 5.0, 0.0]])
        d = jnp.array([[1.0, 0.0, 0.0]])
        aabb = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
        near, far = near_far_from_aabb(o, d, aabb)
        assert float(near[0]) > 1e30 and float(far[0]) > 1e30

    def test_min_near_clamp(self):
        o = jnp.array([[0.0, 0.0, 0.0]])  # inside the box
        d = jnp.array([[1.0, 0.0, 0.0]])
        aabb = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
        near, far = near_far_from_aabb(o, d, aabb, min_near=0.2)
        np.testing.assert_allclose(near, [0.2], rtol=1e-6)
        np.testing.assert_allclose(far, [1.0], rtol=1e-6)


class TestComposite:
    def test_matches_sequential_reference(self):
        """Closed-form cumsum composite == the CUDA kernel's sequential scan."""
        rng = np.random.default_rng(2)
        N, S = 5, 16
        sigmas = rng.uniform(0, 20, (N, S)).astype(np.float32)
        rgbs = rng.uniform(0, 1, (N, S, 3)).astype(np.float32)
        deltas = rng.uniform(0.005, 0.02, (N, S)).astype(np.float32)
        ts = np.cumsum(deltas, axis=-1).astype(np.float32)
        T_thresh = 1e-2

        # sequential scan mirroring kernel_composite_rays_train_forward
        exp_img = np.zeros((N, 3), np.float32)
        exp_ws = np.zeros(N, np.float32)
        exp_d = np.zeros(N, np.float32)
        for n in range(N):
            T = 1.0
            for s in range(S):
                alpha = 1.0 - np.exp(-sigmas[n, s] * deltas[n, s])
                w = alpha * T
                exp_img[n] += w * rgbs[n, s]
                exp_ws[n] += w
                exp_d[n] += w * ts[n, s]
                T *= 1.0 - alpha
                if T < T_thresh:
                    break

        out = composite_rays(
            jnp.asarray(sigmas), jnp.asarray(rgbs), jnp.asarray(deltas),
            jnp.asarray(ts), T_thresh=T_thresh,
        )
        np.testing.assert_allclose(out["image"], exp_img, rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(out["weights_sum"], exp_ws, rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(out["depth"], exp_d, rtol=2e-4, atol=2e-5)

    def test_gradient_matches_finite_differences(self):
        rng = np.random.default_rng(3)
        N, S = 2, 8
        sigmas = jnp.asarray(rng.uniform(0.5, 5, (N, S)).astype(np.float32))
        rgbs = jnp.asarray(rng.uniform(0, 1, (N, S, 3)).astype(np.float32))
        deltas = jnp.asarray(rng.uniform(0.01, 0.05, (N, S)).astype(np.float32))
        ts = jnp.cumsum(deltas, axis=-1)

        def loss(sg, rg):
            out = composite_rays(sg, rg, deltas, ts, T_thresh=0.0)
            return jnp.sum(out["image"] ** 2) + jnp.sum(out["weights_sum"])

        g_sig, g_rgb = jax.grad(loss, argnums=(0, 1))(sigmas, rgbs)
        # finite differences on a few random entries
        f0 = loss(sigmas, rgbs)
        eps = 1e-3
        for (i, j) in [(0, 0), (1, 3), (0, 7)]:
            sp = sigmas.at[i, j].add(eps)
            fd = (loss(sp, rgbs) - f0) / eps
            np.testing.assert_allclose(g_sig[i, j], fd, rtol=5e-2, atol=1e-3)

    def test_mask_zeroes_padding(self):
        sigmas = jnp.ones((1, 4)) * 10
        rgbs = jnp.ones((1, 4, 3))
        deltas = jnp.ones((1, 4)) * 0.1
        ts = jnp.cumsum(deltas, axis=-1)
        mask = jnp.array([[True, True, False, False]])
        out = composite_rays(sigmas, rgbs, deltas, ts, mask=mask)
        out_full = composite_rays(sigmas[:, :2], rgbs[:, :2], deltas[:, :2], ts[:, :2])
        np.testing.assert_allclose(out["image"], out_full["image"], rtol=1e-6)


class TestSamplePDF:
    def test_concentrates_samples(self):
        bins = jnp.linspace(0, 1, 9)[None].repeat(2, axis=0)  # [2, 9]
        weights = jnp.zeros((2, 8)).at[:, 4].set(100.0)  # mass in bin 4
        s = sample_pdf(jax.random.PRNGKey(0), bins, weights, 32, det=True)
        # nearly all samples must land in [0.5, 0.625]
        frac = jnp.mean((s >= 0.5) & (s <= 0.625))
        assert float(frac) > 0.9


class TestDenseCoarseLevels:
    """tcnn-style dense storage for coarse levels (ops.hashenc.level_sides):
    forward parity with the hashed layout after densification, and
    collision-free gradients."""

    def test_densified_forward_matches_hashed(self):
        import jax
        import jax.numpy as jnp

        from nerf_signature_tpu.ops.hashenc import (
            _hash3, hash_encode, init_hash_table, level_resolutions,
            level_row_counts, level_sides,
        )

        L, F, S = 3, 2, 10
        res = level_resolutions(L, 4, 64)          # 4, 16, 64
        sides = level_sides(res, S, True)
        assert sides[0] > 0 and sides[-1] == 0      # coarse dense, fine hashed

        table_h = init_hash_table(jax.random.PRNGKey(0), L, F, S)
        # densify exactly like torch_ingest: dense[cell] = hashed[hash(cell)]
        parts = []
        for i, side in enumerate(sides):
            lvl = table_h[i * (1 << S):(i + 1) * (1 << S)]
            if side:
                ax = np.arange(side, dtype=np.uint32)
                cx, cy, cz = np.meshgrid(ax, ax, ax, indexing="ij")
                h = np.asarray(_hash3(jnp.asarray(cx.ravel()),
                                      jnp.asarray(cy.ravel()),
                                      jnp.asarray(cz.ravel()), S))
                parts.append(np.asarray(lvl)[h])
            else:
                parts.append(np.asarray(lvl))
        table_d = jnp.asarray(np.concatenate(parts, axis=0))
        assert table_d.shape[0] == level_row_counts(sides, S).sum()

        x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
        out_h = hash_encode(x, table_h, res, S)
        out_d = hash_encode(x, table_d, res, S, dense_sides=sides)
        np.testing.assert_allclose(np.asarray(out_h), np.asarray(out_d),
                                   rtol=1e-6)

    def test_dense_grad_is_collision_free(self):
        import jax
        import jax.numpy as jnp

        from nerf_signature_tpu.ops.hashenc import (
            hash_encode, init_hash_table_sized, level_resolutions,
            level_sides,
        )

        L, F, S = 2, 2, 10
        res = level_resolutions(L, 4, 8)
        sides = level_sides(res, S, True)
        assert all(s > 0 for s in sides)
        table = init_hash_table_sized(jax.random.PRNGKey(0), sides, F, S)
        x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3))

        g = jax.grad(
            lambda t: jnp.sum(hash_encode(x, t, res, S, dense_sides=sides))
        )(table)
        assert float(jnp.abs(g).sum()) > 0

    def test_ngp_model_with_dense_coarse(self):
        import jax
        import jax.numpy as jnp

        from nerf_signature_tpu.models.ngp import (
            NGPConfig, init_ngp_params, ngp_field,
        )

        cfg = NGPConfig(n_levels=4, log2_hashmap_size=10,
                        finest_resolution=64, compute_dtype=jnp.float32,
                        dense_coarse=True)
        p = init_ngp_params(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-1,
                               maxval=1)
        d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (32, 1))
        sigma, rgb = ngp_field(p, cfg, x, d)
        assert sigma.shape == (32,) and rgb.shape == (32, 3)
        assert np.isfinite(np.asarray(sigma)).all()
