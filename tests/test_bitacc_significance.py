"""Ownership-significance (binomial tail) readout on BitAccMeter.

The reference's protocol reports only raw bit accuracy
(``utils_wtmk_disen.py:321-361``); the meter here additionally quantifies
the ownership evidence as an exact binomial-tail p-value (log10, so 200
messages x 32 bits at accuracy 1.0 — p = 2^-6400 — stays representable)."""

import numpy as np

from nerf_signature_tpu.train.metrics import BitAccMeter


def test_pvalue_exact_small_case():
    m = BitAccMeter()
    m.update(np.array([1.0, 1.0, 1.0, -1.0]), np.array([1, 1, 1, 0]))
    # 4/4 correct under fair coins: p = (1/2)^4 = 0.0625
    assert abs(10 ** m.pvalue() - 0.0625) < 1e-12
    assert m.significance() == "p=0.063"


def test_pvalue_perfect_run_underflow_safe():
    m = BitAccMeter()
    for _ in range(10):
        m.update(np.ones(32), np.ones(32))
    # 320/320: log10(2^-320) = -320*log10(2) = -96.33
    assert abs(m.pvalue() - (-320 * np.log10(2))) < 1e-9
    assert m.significance() == "p=1e-96"


def test_pvalue_random_is_insignificant():
    m = BitAccMeter()
    rng = np.random.default_rng(0)
    for _ in range(20):
        m.update(rng.normal(size=32), rng.integers(0, 2, 32))
    assert 10 ** m.pvalue() > 0.05


def test_clear_resets_bit_counters():
    m = BitAccMeter()
    m.update(np.ones(8), np.ones(8))
    m.clear()
    assert m.pvalue() is None and m.significance() == "n/a"
