"""Regularizer interface: auxiliary losses added to the score-matching loss.

A regularizer is a pure function of (score_fn, augmented batch, key) where
``score_fn(batch) -> AXL`` is the parameter-bound, differentiable network:
everything traces into the compiled train step. Burn-in gating happens
host-side in the trainer (one recompile at the burn-in boundary instead of a
per-step branch).

(reference: src/diffusion_for_multi_scale_molecular_dynamics/regularizers/regularizer.py:10-89)
"""

from abc import ABC, abstractmethod
from dataclasses import dataclass
from typing import Any, Callable, Dict

import jax.numpy as jnp


@dataclass(kw_only=True)
class RegularizerParameters:
    """Base regularizer hyperparameters."""

    type: str
    regularizer_lambda_weight: float = 1.0
    number_of_burn_in_epochs: int = 0

    def __post_init__(self):
        assert self.regularizer_lambda_weight > 0.0, (
            "The regularizer weight must be positive."
        )


class Regularizer(ABC):
    """Base class of all regularizers."""

    def __init__(self, regularizer_parameters: RegularizerParameters):
        self.parameters = regularizer_parameters
        self.weight = regularizer_parameters.regularizer_lambda_weight
        self.number_of_burn_in_epochs = regularizer_parameters.number_of_burn_in_epochs

    def can_regularizer_run(self, current_epoch: int) -> bool:
        """Host-side gate (burn-in)."""
        return current_epoch >= self.number_of_burn_in_epochs

    def compute_weighted_regularizer_loss(
        self, score_fn: Callable, augmented_batch: Dict[str, Any], key
    ) -> jnp.ndarray:
        return self.weight * self.compute_regularizer_loss(
            score_fn, augmented_batch, key
        )

    @abstractmethod
    def compute_regularizer_loss(
        self, score_fn: Callable, augmented_batch: Dict[str, Any], key
    ) -> jnp.ndarray:
        """The (unweighted) scalar regularizer loss; must be traceable."""
