"""Two-sample Kolmogorov-Smirnov metrics (the headline validation numbers).

Accumulates reference and predicted scalar samples (energies, interatomic
distances, lattice parameters) over an epoch and computes the two-sample KS
distance and p-value on the host — tiny arrays, scipy territory.

(reference: src/diffusion_for_multi_scale_molecular_dynamics/metrics/kolmogorov_smirnov_metrics.py:7-92)
"""

from typing import List, Tuple

import numpy as np


def compute_kolmogorov_smirnov_distance_and_pvalue(
    predicted_samples: np.ndarray, reference_samples: np.ndarray
) -> Tuple[float, float]:
    """Two-sample KS distance and p-value.

    The null hypothesis is that both sets are drawn from the same
    distribution: a KS distance near 0 with a large p-value indicates
    agreement.
    """
    from scipy.stats import ks_2samp

    # NaNs (e.g. oracle energies of degenerate early-training samples) make
    # ks_2samp return NaN, which would poison the logged metric and the
    # model-checkpoint monitor. Treat them as maximal disagreement (+inf —
    # infinities sort to the tail and count against the CDF match).
    predicted_samples = np.nan_to_num(
        np.asarray(predicted_samples, dtype=np.float64), nan=np.inf
    )
    reference_samples = np.nan_to_num(
        np.asarray(reference_samples, dtype=np.float64), nan=np.inf
    )
    result = ks_2samp(predicted_samples, reference_samples, method="auto")
    return float(result.statistic), float(result.pvalue)


class KolmogorovSmirnovMetric:
    """Accumulator for reference/predicted samples with a KS readout."""

    def __init__(self):
        self._reference: List[np.ndarray] = []
        self._predicted: List[np.ndarray] = []

    def register_reference_samples(self, samples) -> None:
        self._reference.append(np.ravel(np.asarray(samples)))

    def register_predicted_samples(self, samples) -> None:
        self._predicted.append(np.ravel(np.asarray(samples)))

    def reset(self) -> None:
        self._reference.clear()
        self._predicted.clear()

    @property
    def has_data(self) -> bool:
        return bool(self._reference) and bool(self._predicted)

    def compute(self) -> Tuple[float, float]:
        assert self.has_data, "both sample sets must be registered"
        return compute_kolmogorov_smirnov_distance_and_pvalue(
            np.concatenate(self._predicted), np.concatenate(self._reference)
        )
