"""Evaluation metric meters: PSNR, SSIM, LPIPS (optional), bit accuracy.

Equivalents of ``nerf/utils_wtmk_disen.py:211-361`` (PSNRMeter / SSIMMeter /
LPIPSMeter / BIT_ACC).  SSIM is implemented natively (gaussian 11x11,
sigma 1.5 — the torchmetrics default the reference uses); LPIPS degrades
gracefully when the ``lpips`` package is absent (it is not in the TPU image).
"""

import numpy as np


class _Meter:
    def __init__(self):
        self.V = 0.0
        self.N = 0

    def clear(self):
        self.V, self.N = 0.0, 0

    def measure(self):
        return self.V / max(self.N, 1)

    def report(self):
        return f"{type(self).__name__} = {self.measure():.6f}"


class PSNRMeter(_Meter):
    """PSNR = -10 log10 MSE, ref ``utils_wtmk_disen.py:211-245``."""

    name = "PSNR"

    def update(self, preds, truths):
        preds = np.asarray(preds, np.float32)
        truths = np.asarray(truths, np.float32)
        mse = np.mean((preds - truths) ** 2)
        self.V += -10.0 * np.log10(max(mse, 1e-12))
        self.N += 1


def _gaussian_kernel(size=11, sigma=1.5):
    x = np.arange(size) - size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    return g / g.sum()


def ssim(img1, img2, data_range=1.0, size=11, sigma=1.5):
    """Per-image SSIM over [H, W, C] float arrays (separable gaussian window),
    matching torchmetrics' StructuralSimilarityIndexMeasure defaults."""
    img1 = np.asarray(img1, np.float64)
    img2 = np.asarray(img2, np.float64)
    if img1.ndim == 2:
        img1, img2 = img1[..., None], img2[..., None]
    k = _gaussian_kernel(size, sigma)

    def blur(x):
        # separable conv along H then W with reflect-free 'valid' region
        x = np.apply_along_axis(lambda r: np.convolve(r, k, mode="valid"), 0, x)
        x = np.apply_along_axis(lambda r: np.convolve(r, k, mode="valid"), 1, x)
        return x

    C1 = (0.01 * data_range) ** 2
    C2 = (0.03 * data_range) ** 2
    mu1, mu2 = blur(img1), blur(img2)
    mu1_sq, mu2_sq, mu12 = mu1**2, mu2**2, mu1 * mu2
    s1 = blur(img1**2) - mu1_sq
    s2 = blur(img2**2) - mu2_sq
    s12 = blur(img1 * img2) - mu12
    m = ((2 * mu12 + C1) * (2 * s12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2)
    )
    return float(m.mean())


def ssim_jnp(img1, img2, data_range=1.0, size=11, sigma=1.5):
    """Differentiable in-graph SSIM over [B, H, W, C] jnp arrays.

    Same gaussian-window formula as :func:`ssim` (torchmetrics defaults),
    expressed as two static 'valid' convolution matrices so the blur is two
    small matmuls — jit/grad-friendly at the patch sizes the watermark
    trainer's ``--lambda_ssim`` content guard uses.  The window shrinks to
    the largest odd size that fits when the patch is smaller than 11."""
    import jax.numpy as jnp

    H, W = int(img1.shape[-3]), int(img1.shape[-2])
    size = min(size, H - (1 - H % 2), W - (1 - W % 2))
    k = _gaussian_kernel(size, sigma)
    KH = np.zeros((H - size + 1, H), np.float32)
    for r in range(H - size + 1):
        KH[r, r:r + size] = k
    KW = np.zeros((W - size + 1, W), np.float32)
    for r in range(W - size + 1):
        KW[r, r:r + size] = k
    KH, KW = jnp.asarray(KH), jnp.asarray(KW)

    def blur(x):
        x = jnp.einsum("oh,...hwc->...owc", KH, x)
        return jnp.einsum("ow,...hwc->...hoc", KW, x)

    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)
    C1 = (0.01 * data_range) ** 2
    C2 = (0.03 * data_range) ** 2
    mu1, mu2 = blur(img1), blur(img2)
    mu1_sq, mu2_sq, mu12 = mu1**2, mu2**2, mu1 * mu2
    s1 = blur(img1**2) - mu1_sq
    s2 = blur(img2**2) - mu2_sq
    s12 = blur(img1 * img2) - mu12
    m = ((2 * mu12 + C1) * (2 * s12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2)
    )
    return m.mean()


class SSIMMeter(_Meter):
    name = "SSIM"

    def update(self, preds, truths):
        preds = np.asarray(preds, np.float32)
        truths = np.asarray(truths, np.float32)
        if preds.ndim == 4:  # [B, H, W, C]
            for p, t in zip(preds, truths):
                self.V += ssim(p, t)
                self.N += 1
        else:
            self.V += ssim(preds, truths)
            self.N += 1


class LPIPSMeter(_Meter):
    """LPIPS (alex) through the native JAX implementation
    (``utils/lpips.py``) when weights resolve (``$LPIPS_WEIGHTS`` file or
    the ``lpips`` package); otherwise EXPLICITLY inert: ``measure()``
    returns None and ``report()`` says n/a — never a -1 sentinel that reads
    like a score (ref LPIPSMeter, ``utils_wtmk_disen.py:285-319``)."""

    name = "LPIPS"

    def __init__(self, net="alex", weights_path=None):
        super().__init__()
        from ..utils.lpips import load_lpips_params

        self._params = load_lpips_params(weights_path)

    @property
    def available(self):
        return self._params is not None

    def update(self, preds, truths):
        if self._params is None:
            return
        from ..utils.lpips import lpips_metric

        preds = np.asarray(preds, np.float32)
        truths = np.asarray(truths, np.float32)
        if preds.ndim == 3:
            preds, truths = preds[None], truths[None]
        self.V += lpips_metric(self._params, preds, truths)
        self.N += 1

    def measure(self):
        return self.V / max(self.N, 1) if self._params is not None else None

    def report(self):
        if self._params is None:
            return f"{type(self).__name__} = n/a (lpips weights unavailable)"
        return super().report()


class BitAccMeter(_Meter):
    """Sign-agreement bit accuracy, ref BIT_ACC (``utils_wtmk_disen.py:321-361``):
    acc = mean(~XOR(decoded > 0, truth > 0)); truths are 0/1 bits compared as
    (2b-1) > 0."""

    name = "BitAcc"

    def __init__(self):
        super().__init__()
        self.records = []

    def clear(self):
        super().clear()
        self.records = []
        self.bits_total = 0
        self.bits_correct = 0

    def update(self, decoded, bits):
        decoded = np.asarray(decoded, np.float32).reshape(-1)
        bits = np.asarray(bits, np.float32).reshape(-1)
        agree = (decoded > 0) == (bits > 0.5)
        acc = float(agree.mean())
        self.records.append(acc)
        self.V += acc
        self.N += 1
        self.bits_total = getattr(self, "bits_total", 0) + agree.size
        self.bits_correct = getattr(self, "bits_correct", 0) + int(agree.sum())

    def pvalue(self):
        """Ownership significance, returned as **log10(p)**: exact binomial
        tail P(X >= correct bits | random guessing p=0.5) over all evaluated
        bits (log10 stays readable far below float underflow — 200 msgs x
        32 bits at acc 1.0 is p = 2^-6400).  The paper's protocol claims
        ownership when this is negligible; the reference reports only the
        accuracy, leaving significance to the reader."""
        n = getattr(self, "bits_total", 0)
        k = getattr(self, "bits_correct", 0)
        if n == 0:
            return None
        from math import exp, lgamma, log
        log_half_n = n * log(0.5)
        # sum_{j=k}^{n} C(n,j) * 0.5^n in log space (exact; n is ~1e4 max)
        terms = [lgamma(n + 1) - lgamma(j + 1) - lgamma(n - j + 1)
                 + log_half_n for j in range(k, n + 1)]
        m = max(terms)
        log_p = m + log(sum(exp(t - m) for t in terms))
        return log_p / log(10.0)  # log10(p): readable far below fp underflow

    def significance(self):
        """Human-readable ownership-evidence string."""
        l10 = self.pvalue()
        if l10 is None:
            return "n/a"
        if l10 > -4:
            return f"p={10 ** l10:.2g}"
        return f"p=1e{l10:.0f}"
