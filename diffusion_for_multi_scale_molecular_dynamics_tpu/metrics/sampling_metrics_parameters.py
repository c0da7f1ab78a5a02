"""Sampling-metric configuration.

(reference: src/diffusion_for_multi_scale_molecular_dynamics/metrics/sampling_metrics_parameters.py:5)
"""

from dataclasses import dataclass


@dataclass(kw_only=True)
class SamplingMetricsParameters:
    """Which distribution-match metrics to compute on generated samples."""

    compute_energies: bool = True
    compute_structure_factor: bool = False
    structure_factor_max_distance: float = 5.0
    record_samples: bool = False  # persist the sampled compositions to disk
    record_lattice_parameters: bool = False
