"""Tests for the differentiable JPEG layers."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_signature_tpu.utils.jpeg import diff_jpeg_ste, jpeg_dct, random_diff_jpeg


def _test_image(b=2, h=24, w=24):
    key = jax.random.PRNGKey(0)
    base = jax.random.uniform(key, (b, h // 4, w // 4, 3))
    return jax.image.resize(base, (b, h, w, 3), "linear")


class TestJpegDCT:
    def test_high_quality_near_identity(self):
        x = _test_image()
        y = jpeg_dct(x, quality=95.0)
        assert y.shape == x.shape
        assert float(jnp.abs(y - x).mean()) < 0.03

    def test_low_quality_degrades_more(self):
        x = _test_image()
        e95 = float(jnp.abs(jpeg_dct(x, 95.0) - x).mean())
        e10 = float(jnp.abs(jpeg_dct(x, 10.0) - x).mean())
        assert e10 > e95

    def test_gradients_flow(self):
        x = _test_image(1, 16, 16)
        g = jax.grad(lambda im: jnp.sum(jpeg_dct(im, 75.0) ** 2))(x)
        assert bool(jnp.all(jnp.isfinite(g)))
        assert float(jnp.abs(g).sum()) > 0

    def test_jittable(self):
        x = _test_image(1, 16, 16)
        y = jax.jit(lambda im: jpeg_dct(im, 75.0))(x)
        assert y.shape == x.shape

    def test_non_multiple_of_8(self):
        x = _test_image(1, 20, 28)
        y = jpeg_dct(x, 75.0)
        assert y.shape == x.shape


class TestDiffJpegSTE:
    def test_matches_real_codec(self):
        from PIL import Image
        import io

        x = np.asarray(_test_image(1, 24, 24))
        y = np.asarray(diff_jpeg_ste(jnp.asarray(x), 75))
        # reproduce the codec on host
        pil = Image.fromarray((np.clip(x[0], 0, 1) * 255).astype(np.uint8))
        buf = io.BytesIO()
        pil.save(buf, format="JPEG", quality=75)
        buf.seek(0)
        ref = np.asarray(Image.open(buf), np.float32) / 255.0
        np.testing.assert_allclose(y[0], ref, atol=1e-6)

    def test_straight_through_gradient(self):
        x = _test_image(1, 16, 16)
        g = jax.grad(lambda im: jnp.sum(diff_jpeg_ste(im, 75)))(x)
        np.testing.assert_allclose(np.asarray(g), 1.0, rtol=1e-6)


class TestRandomJpeg:
    def test_runs(self):
        x = _test_image(2, 16, 16)
        y = random_diff_jpeg(jax.random.PRNGKey(0), x, low=40)
        assert y.shape == x.shape
