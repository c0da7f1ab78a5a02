"""Regularizer factory keyed on the configured type.

(reference: src/diffusion_for_multi_scale_molecular_dynamics/regularizers/regularizer_factory.py:33-81)
"""

from typing import Any, Dict, Optional

from ..generators.predictor_corrector_axl_generator import (
    PredictorCorrectorSamplingParameters,
)
from ..models.analytical_score_network import AnalyticalScoreNetworkConfig
from ..models.score_network_factory import create_score_network_config
from ..noise_schedulers import NoiseParameters
from .consistency_regularizer import (
    ConsistencyRegularizer,
    ConsistencyRegularizerParameters,
)
from .fokker_planck_regularizer import (
    FokkerPlanckRegularizer,
    FokkerPlanckRegularizerParameters,
)
from .regression_regularizer import (
    RegressionRegularizer,
    RegressionRegularizerParameters,
)
from .regularizer import Regularizer, RegularizerParameters

REGULARIZERS_BY_TYPE = {
    "fokker_planck": FokkerPlanckRegularizer,
    "consistency": ConsistencyRegularizer,
    "regression": RegressionRegularizer,
}


def create_regularizer_parameters(
    regularizer_dictionary: Dict[str, Any],
    global_parameters_dictionary: Optional[Dict[str, Any]] = None,
) -> RegularizerParameters:
    """Parse a regularizer config block into its parameter dataclass."""
    cfg = dict(regularizer_dictionary)
    regularizer_type = cfg.get("type")
    assert regularizer_type in REGULARIZERS_BY_TYPE, (
        f"unknown regularizer type '{regularizer_type}'. "
        f"Options: {sorted(REGULARIZERS_BY_TYPE)}"
    )
    if regularizer_type == "regression":
        score_network_config = create_score_network_config(
            cfg.pop("score_network"), global_parameters_dictionary
        )
        return RegressionRegularizerParameters(
            **cfg, score_network_config=score_network_config
        )
    if regularizer_type == "consistency":
        noise_parameters = NoiseParameters(**cfg.pop("noise"))
        sampling_parameters = PredictorCorrectorSamplingParameters(
            **cfg.pop("sampling")
        )
        analytical_config = None
        if "analytical_score_network" in cfg:
            analytical_config = AnalyticalScoreNetworkConfig(
                **cfg.pop("analytical_score_network")
            )
        return ConsistencyRegularizerParameters(
            **cfg,
            noise_parameters=noise_parameters,
            sampling_parameters=sampling_parameters,
            analytical_score_network_config=analytical_config,
        )
    return FokkerPlanckRegularizerParameters(**cfg)


def create_regularizer(parameters: RegularizerParameters) -> Regularizer:
    return REGULARIZERS_BY_TYPE[parameters.type](parameters)
