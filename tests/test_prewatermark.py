"""Prewatermarking-baseline tests: HiDDeN enc/dec joint pretraining on scene
crops, image embedding, and bit survival decoding (train/prewatermark.py)."""

import numpy as np

from nerf_signature_tpu.train.prewatermark import (
    bit_survival,
    pretrain_hidden,
    watermark_images,
)


def _toy_images(n=6, hw=28, seed=0):
    """Textured toy images (smooth gradients + blobs), [n, hw, hw, 3]."""
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:hw, 0:hw] / hw
    imgs = []
    for _ in range(n):
        a, b, c = rng.random(3)
        img = np.stack(
            [a * x + (1 - a) * y,
             np.abs(np.sin(6 * b * x + 3 * c * y)),
             (x - c) ** 2 + (y - a) ** 2],
            axis=-1,
        )
        imgs.append(img / img.max())
    return np.stack(imgs).astype(np.float32)


class TestPrewatermark:
    def test_pipeline_learns_and_survives_embedding(self):
        """Joint enc/dec pretraining on 6 tiny toy images: deterministic
        (seed-pinned) regression of the measured survival.  On this toy
        setup the probed config reaches ~0.95 train bit-acc and ~0.71
        full-image survival (the gap is the crop->full-image +
        batch->running-stat BN shift; real scenes train with far more data,
        and upstream uses a COCO-pretrained HiDDeN)."""
        imgs = _toy_images()
        D = 4
        enc, dec, enc_cfg, dec_cfg = pretrain_hidden(
            imgs, D, steps=800, crop=20, batch=16, lr=3e-3, noise_std=0.01,
            lambda_res=0.01, strength=0.2, seed=0, log=None, channels=32,
            dec_blocks=3, enc_blocks=2,
        )
        rng = np.random.default_rng(1)
        message = rng.integers(0, 2, D)
        wm = watermark_images(enc, enc_cfg, imgs, message, strength=0.2)

        assert wm.shape == imgs.shape
        assert wm.min() >= 0.0 and wm.max() <= 1.0
        # embedding is a bounded perturbation, not a rewrite
        assert np.abs(wm - imgs).max() <= 0.2 + 1e-5
        assert np.abs(wm - imgs).max() > 0.0

        acc, per_view = bit_survival(dec, dec_cfg, wm, message)
        assert len(per_view) == len(imgs)
        # jointly trained pair must beat chance decisively on its own output
        assert acc > 0.6, f"bit survival {acc}"

    def test_bit_survival_protocol(self):
        """Sign-agreement protocol sanity: decoding random images with a
        random decoder is ~chance."""
        from nerf_signature_tpu.models.hidden import (
            HiddenDecoderSingleConfig, init_hidden_decoder_single,
        )
        import jax

        D = 8
        dec_cfg = HiddenDecoderSingleConfig(num_blocks=2, num_bits=D,
                                            channels=8)
        tp, ts = init_hidden_decoder_single(jax.random.PRNGKey(0), dec_cfg)
        dec = {"params": tp, "state": ts}
        imgs = _toy_images(n=4)
        accs = []
        rng = np.random.default_rng(0)
        for _ in range(8):
            acc, _ = bit_survival(dec, dec_cfg, imgs, rng.integers(0, 2, D))
            accs.append(acc)
        assert 0.1 < float(np.mean(accs)) < 0.9
