"""Distribution-match metrics (Kolmogorov-Smirnov) for sample validation."""

from .kolmogorov_smirnov_metrics import (
    KolmogorovSmirnovMetric,
    compute_kolmogorov_smirnov_distance_and_pvalue,
)
from .sampling_metrics_parameters import SamplingMetricsParameters

__all__ = [
    "KolmogorovSmirnovMetric",
    "compute_kolmogorov_smirnov_distance_and_pvalue",
    "SamplingMetricsParameters",
]
