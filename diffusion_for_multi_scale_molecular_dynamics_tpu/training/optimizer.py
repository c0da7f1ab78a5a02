"""Optimizer and learning-rate scheduler configuration (optax).

Capability parity with the reference's torch.optim plumbing
(src/diffusion_for_multi_scale_molecular_dynamics/models/{optimizer,scheduler}.py):
adam / adamw with optional gradient clipping, and two schedulers —
CosineAnnealingLR (per-epoch cosine) and ReduceLROnPlateau (on the validation
loss). The learning rate is exposed through optax.inject_hyperparams so the
host-side scheduler can set it between epochs without recompiling the step.
"""

import math
from dataclasses import dataclass
from typing import Any, Dict, Optional

import optax

_VALID_OPTIMIZERS = ("adam", "adamw")


@dataclass(frozen=True, kw_only=True)
class OptimizerParameters:
    """Optimizer hyperparameters."""

    name: str = "adamw"
    learning_rate: float = 1e-3
    weight_decay: float = 0.0
    gradient_clipping: Optional[float] = None
    # Exponential moving average of the parameters: 0 disables; a typical
    # value is 0.999. When enabled, validation/sampling/checkpoint-best use
    # the EMA weights (an upgrade over the reference, which has no EMA).
    ema_decay: float = 0.0
    # Average gradients over k micro-batches before applying one optimizer
    # step (the reference's lightning `accumulate_grad_batches` knob).
    accumulate_grad_batches: int = 1

    def __post_init__(self):
        assert self.name in _VALID_OPTIMIZERS, f"Unknown optimizer '{self.name}'"
        assert 0.0 <= self.ema_decay < 1.0, "ema_decay must be in [0, 1)"
        assert self.accumulate_grad_batches >= 1, (
            "accumulate_grad_batches must be >= 1"
        )


@dataclass(frozen=True, kw_only=True)
class SchedulerParameters:
    """Learning-rate scheduler hyperparameters."""

    name: str  # "CosineAnnealingLR" | "ReduceLROnPlateau"
    # CosineAnnealingLR
    t_max: int = 100  # epochs
    eta_min: float = 0.0
    # ReduceLROnPlateau
    factor: float = 0.1
    patience: int = 10

    def __post_init__(self):
        assert self.name in ("CosineAnnealingLR", "ReduceLROnPlateau"), (
            f"Unknown scheduler '{self.name}'"
        )


def create_optimizer_parameters(config: Dict[str, Any]) -> OptimizerParameters:
    return OptimizerParameters(**config)


def create_scheduler_parameters(
    config: Optional[Dict[str, Any]],
) -> Optional[SchedulerParameters]:
    if config is None:
        return None
    return SchedulerParameters(**config)


def load_optimizer(parameters: OptimizerParameters) -> optax.GradientTransformation:
    """Build the optax chain with an injectable learning rate."""
    if parameters.name == "adam":
        base = optax.inject_hyperparams(optax.adam)(
            learning_rate=parameters.learning_rate
        )
    else:
        base = optax.inject_hyperparams(optax.adamw)(
            learning_rate=parameters.learning_rate,
            weight_decay=parameters.weight_decay,
        )
    if parameters.gradient_clipping is not None:
        base = optax.chain(
            optax.clip_by_global_norm(parameters.gradient_clipping), base
        )
    if parameters.accumulate_grad_batches > 1:
        # Accumulate the mean gradient over k micro-batches; the wrapped
        # chain (clipping included) sees only the averaged gradient at the
        # real step, matching the reference's lightning semantics.
        base = optax.MultiSteps(
            base, every_k_schedule=parameters.accumulate_grad_batches
        )
    return base


def set_learning_rate(opt_state, learning_rate: float):
    """Write a new learning rate into an inject_hyperparams state."""

    import jax.numpy as jnp

    def visit(state) -> bool:
        if hasattr(state, "hyperparams") and "learning_rate" in state.hyperparams:
            old = state.hyperparams["learning_rate"]
            state.hyperparams["learning_rate"] = jnp.asarray(
                learning_rate, dtype=jnp.asarray(old).dtype
            )
            return True
        if hasattr(state, "inner_opt_state"):  # optax.MultiSteps wrapper
            return visit(state.inner_opt_state)
        if isinstance(state, tuple):
            return any(visit(sub) for sub in state)
        return False

    visit(opt_state)
    return opt_state


class LearningRateScheduler:
    """Host-side epoch scheduler driving the injected learning rate.

    Matches the reference semantics: CosineAnnealingLR steps every epoch;
    ReduceLROnPlateau monitors the validation loss (reference monitors
    'validation_epoch_loss', scheduler.py:18-44).
    """

    def __init__(
        self,
        scheduler_parameters: Optional[SchedulerParameters],
        base_learning_rate: float,
    ):
        self.params = scheduler_parameters
        self.base_lr = base_learning_rate
        self.current_lr = base_learning_rate
        self._best = math.inf
        self._bad_epochs = 0

    def on_epoch_end(self, epoch: int, validation_loss: Optional[float]) -> float:
        """Return the learning rate for the next epoch."""
        if self.params is None:
            return self.current_lr
        if self.params.name == "CosineAnnealingLR":
            t = min(epoch + 1, self.params.t_max)
            self.current_lr = self.params.eta_min + 0.5 * (
                self.base_lr - self.params.eta_min
            ) * (1.0 + math.cos(math.pi * t / self.params.t_max))
        elif self.params.name == "ReduceLROnPlateau" and validation_loss is not None:
            if validation_loss < self._best:
                self._best = validation_loss
                self._bad_epochs = 0
            else:
                self._bad_epochs += 1
                if self._bad_epochs > self.params.patience:
                    self.current_lr *= self.params.factor
                    self._bad_epochs = 0
        return self.current_lr
