"""Loss hyperparameters, one per AXL modality.

(reference: src/diffusion_for_multi_scale_molecular_dynamics/loss/loss_parameters.py)
"""

from dataclasses import dataclass
from typing import Any, Dict

from ..namespace import AXL


@dataclass(frozen=True, kw_only=True)
class LossParameters:
    """Base loss hyperparameters for a single modality."""

    algorithm: str
    lambda_weight: float = 1.0


@dataclass(frozen=True, kw_only=True)
class MSELossParameters(LossParameters):
    algorithm: str = "mse"


@dataclass(frozen=True, kw_only=True)
class WeightedMSELossParameters(LossParameters):
    """Sigma-weighted MSE: weights(sigma) = exp(exponent * (sigma - sigma0)) + 1.

    Defaults give weights(0.5) ~ 1e3, flattening the loss-vs-sigma curve.
    """

    algorithm: str = "weighted_mse"
    sigma0: float = 0.2
    exponent: float = 23.0259  # ~ 10 ln(10)


@dataclass(frozen=True, kw_only=True)
class AtomTypeLossParameters(LossParameters):
    """D3PM loss: variational bound + ce_weight * cross entropy."""

    algorithm: str = "d3pm"
    ce_weight: float = 0.001  # google D3PM repo default
    eps: float = 1e-8


_BY_ALGORITHM = {
    "mse": MSELossParameters,
    "weighted_mse": WeightedMSELossParameters,
    "d3pm": AtomTypeLossParameters,
}


def create_loss_parameters(model_dictionary: Dict[str, Any]) -> AXL:
    """Build the AXL triple of loss parameters from a model config dict."""
    loss_config = model_dictionary.get(
        "loss",
        dict(
            coordinates=dict(algorithm="mse"),
            atom_types=dict(algorithm="d3pm"),
            lattice_parameters=dict(algorithm="mse"),
        ),
    )

    def build(cfg: Dict[str, Any], default_algorithm: str) -> LossParameters:
        cfg = dict(cfg)
        algorithm = cfg.pop("algorithm", default_algorithm)
        cls = _BY_ALGORITHM[algorithm]
        return cls(**cfg)

    return AXL(
        A=build(loss_config.get("atom_types", {}), "d3pm"),
        X=build(loss_config.get("coordinates", {}), "mse"),
        L=build(loss_config.get("lattice_parameters", {}), "mse"),
    )
