"""Generator factory keyed on the sampling algorithm.

(reference: src/diffusion_for_multi_scale_molecular_dynamics/generators/instantiate_generator.py:25,
 load_sampling_parameters.py:13)
"""

import logging
from typing import Any, Dict, Optional

from .adaptive_corrector import AdaptiveCorrectorGenerator
from .axl_generator import SamplingParameters
from .langevin_generator import LangevinGenerator
from .ode_position_generator import (
    ExplodingVarianceODEAXLGenerator,
    ODESamplingParameters,
)
from .predictor_corrector_axl_generator import PredictorCorrectorSamplingParameters
from .sde_position_generator import (
    ExplodingVarianceSDEPositionGenerator,
    SDESamplingParameters,
)

_PARAMETER_CLASSES = {
    "predictor_corrector": PredictorCorrectorSamplingParameters,
    "adaptive_corrector": PredictorCorrectorSamplingParameters,
    "ode": ODESamplingParameters,
    "sde": SDESamplingParameters,
}


def load_sampling_parameters(sampling_config: Dict[str, Any]) -> SamplingParameters:
    """Build the sampling-parameter dataclass from the config dict."""
    cfg = dict(sampling_config)
    algorithm = cfg.get("algorithm", "predictor_corrector")
    assert algorithm in _PARAMETER_CLASSES, (
        f"Unknown sampling algorithm '{algorithm}'. "
        f"Options: {sorted(_PARAMETER_CLASSES)}"
    )
    return _PARAMETER_CLASSES[algorithm](**cfg)


def instantiate_generator(
    sampling_parameters: SamplingParameters,
    noise_parameters,
    axl_network,
    trajectory_initializer=None,
    sampling_constraints=None,
):
    """Build the configured generator; constraints select the RePaint path."""
    if sampling_constraints is not None:
        from .constrained_langevin_generator import ConstrainedLangevinGenerator

        return ConstrainedLangevinGenerator(
            noise_parameters=noise_parameters,
            sampling_parameters=sampling_parameters,
            axl_network=axl_network,
            sampling_constraints=sampling_constraints,
            trajectory_initializer=trajectory_initializer,
        )

    algorithm = sampling_parameters.algorithm
    if algorithm == "predictor_corrector":
        cls = LangevinGenerator
    elif algorithm == "adaptive_corrector":
        if getattr(sampling_parameters, "number_of_corrector_steps", 0) < 5:
            logging.getLogger(__name__).warning(
                "adaptive_corrector with number_of_corrector_steps=%d: "
                "corrector-only transport needs >= 5 corrector steps per "
                "noise level even with an exact score (measured in "
                "tests/test_sampling_fidelity.py; at the reference default "
                "of 2 only ~60%% of atoms reach a mode). Also set "
                "adaptive_corrector_mode_std to the data's thermal "
                "displacement scale for learned scores.",
                sampling_parameters.number_of_corrector_steps,
            )
        cls = AdaptiveCorrectorGenerator
    elif algorithm == "ode":
        cls = ExplodingVarianceODEAXLGenerator
    elif algorithm == "sde":
        cls = ExplodingVarianceSDEPositionGenerator
    else:
        raise NotImplementedError(f"algorithm '{algorithm}' is not implemented")
    return cls(
        noise_parameters=noise_parameters,
        sampling_parameters=sampling_parameters,
        axl_network=axl_network,
        trajectory_initializer=trajectory_initializer,
    )
