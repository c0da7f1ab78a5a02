"""Unit tests for the KS metric accumulator (metrics/kolmogorov_smirnov_metrics.py).

Mirrors the reference's metric semantics (accumulate reference/predicted
sample pools across batches, compute the two-sample KS distance via scipy,
reset between epochs — kolmogorov_smirnov_metrics.py:7-92).
"""

import numpy as np

from diffusion_for_multi_scale_molecular_dynamics_tpu.metrics.kolmogorov_smirnov_metrics import (
    KolmogorovSmirnovMetric,
    compute_kolmogorov_smirnov_distance_and_pvalue,
)


def test_identical_distributions_have_small_distance():
    rng = np.random.default_rng(0)
    pool = rng.normal(size=4000)
    d, p = compute_kolmogorov_smirnov_distance_and_pvalue(
        pool[:2000], pool[2000:]
    )
    assert d < 0.06
    assert p > 0.05


def test_shifted_distributions_are_detected():
    rng = np.random.default_rng(1)
    d, p = compute_kolmogorov_smirnov_distance_and_pvalue(
        rng.normal(size=1000), rng.normal(size=1000) + 1.0
    )
    assert d > 0.3
    assert p < 1e-6


def test_accumulation_and_reset():
    rng = np.random.default_rng(2)
    metric = KolmogorovSmirnovMetric()
    assert not metric.has_data
    # Accumulate across "batches" like the validation loop does.
    for _ in range(4):
        metric.register_reference_samples(rng.normal(size=100))
    for _ in range(2):
        metric.register_predicted_samples(rng.normal(size=100))
    assert metric.has_data
    d, p = metric.compute()
    assert 0.0 <= d <= 1.0 and 0.0 <= p <= 1.0
    # The pooled computation equals a direct scipy call on the pools.
    metric.reset()
    assert not metric.has_data


def test_pooling_matches_direct_computation():
    rng = np.random.default_rng(3)
    a = rng.normal(size=300)
    b = rng.normal(size=250) + 0.2
    metric = KolmogorovSmirnovMetric()
    metric.register_reference_samples(a[:100])
    metric.register_reference_samples(a[100:])
    metric.register_predicted_samples(b[:50])
    metric.register_predicted_samples(b[50:])
    d_pooled, p_pooled = metric.compute()
    d_direct, p_direct = compute_kolmogorov_smirnov_distance_and_pvalue(b, a)
    np.testing.assert_allclose(d_pooled, d_direct, atol=1e-12)
    np.testing.assert_allclose(p_pooled, p_direct, atol=1e-12)
