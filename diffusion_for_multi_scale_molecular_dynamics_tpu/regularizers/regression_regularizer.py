"""Regression regularizer: pull the X-score toward a known target network.

Most useful with an analytical target on toy problems. Random coordinates are
drawn so the match is enforced over the whole torus.

(reference: src/diffusion_for_multi_scale_molecular_dynamics/regularizers/regression_regularizer.py)
"""

from dataclasses import dataclass
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp

from ..models.score_network_factory import create_score_network
from ..namespace import NOISY_AXL_COMPOSITION
from .regularizer import Regularizer, RegularizerParameters


@dataclass(kw_only=True)
class RegressionRegularizerParameters(RegularizerParameters):
    type: str = "regression"
    score_network_config: Any = None  # config of the (parameter-free) target


class RegressionRegularizer(Regularizer):
    """MSE between the model's X score and a target network's X score."""

    def __init__(self, regularizer_parameters: RegressionRegularizerParameters):
        super().__init__(regularizer_parameters)
        self.target_score_network = create_score_network(
            regularizer_parameters.score_network_config
        )

    def compute_regularizer_loss(
        self, score_fn: Callable, augmented_batch: Dict[str, Any], key
    ) -> jnp.ndarray:
        composition = augmented_batch[NOISY_AXL_COMPOSITION]
        x = jax.random.uniform(key, composition.X.shape, composition.X.dtype)
        modified_batch = dict(augmented_batch)
        modified_batch[NOISY_AXL_COMPOSITION] = composition._replace(X=x)

        predicted = score_fn(modified_batch).X
        target = jax.lax.stop_gradient(
            self.target_score_network.apply({}, modified_batch, False).X
        )
        return jnp.mean((predicted - target) ** 2)
