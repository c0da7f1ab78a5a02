"""Predictor-corrector sampling hyperparameters.

(reference: src/diffusion_for_multi_scale_molecular_dynamics/generators/predictor_corrector_axl_generator.py:21-204;
the reference's python-loop skeleton becomes a lax.scan in langevin_generator.py)
"""

from dataclasses import dataclass

from .axl_generator import SamplingParameters


@dataclass(kw_only=True)
class PredictorCorrectorSamplingParameters(SamplingParameters):
    """Hyperparameters for predictor-corrector AXL generators."""

    algorithm: str = "predictor_corrector"
    number_of_corrector_steps: int = 1
    small_epsilon: float = 1e-8
    one_atom_type_transition_per_step: bool = True
    atom_type_greedy_sampling: bool = True
    atom_type_transition_in_corrector: bool = False
