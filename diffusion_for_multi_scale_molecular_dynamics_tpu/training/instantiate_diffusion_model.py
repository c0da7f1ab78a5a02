"""Build the diffusion model pieces from the experiment config dict.

(reference: src/diffusion_for_multi_scale_molecular_dynamics/models/instantiate_diffusion_model.py:27)
"""

import logging
from typing import Any, Dict, Tuple

from ..loss import create_loss_parameters
from ..models import create_score_network, create_score_network_config
from ..noise_schedulers import NoiseParameters
from .diffusion_model import AXLDiffusionConfig

logger = logging.getLogger(__name__)


def create_noise_parameters(noise_config: Dict[str, Any]) -> NoiseParameters:
    return NoiseParameters(**noise_config)


def load_diffusion_model(hyper_params: Dict[str, Any]) -> Tuple[Any, AXLDiffusionConfig]:
    """Returns (score_network flax module, AXLDiffusionConfig)."""
    model_dict = hyper_params["model"]
    global_params = {
        "elements": hyper_params["elements"],
        "max_atom": hyper_params.get("data", {}).get("max_atom", 64),
        "spatial_dimension": hyper_params.get("spatial_dimension", 3),
    }
    score_network_config = create_score_network_config(
        model_dict["score_network"], global_params
    )
    score_network = create_score_network(score_network_config)

    loss_parameters = create_loss_parameters(model_dict)

    data_config = hyper_params.get("data", {})
    noise_parameters = create_noise_parameters(dict(data_config.get("noise", {})))

    regularizer = None
    if "regularizer" in model_dict:
        from ..regularizers import create_regularizer, create_regularizer_parameters

        regularizer_parameters = create_regularizer_parameters(
            model_dict["regularizer"], global_params
        )
        regularizer = create_regularizer(regularizer_parameters)

    diffusion_config = AXLDiffusionConfig(
        regularizer=regularizer,
        score_network_config=score_network_config,
        loss_parameters=loss_parameters,
        noise_parameters=noise_parameters,
        kmax_target_score=model_dict.get("kmax_target_score", 4),
        use_fixed_lattice_parameters=data_config.get(
            "use_fixed_lattice_parameters", False
        ),
        use_optimal_transport=data_config.get("use_optimal_transport", False),
    )
    return score_network, diffusion_config
