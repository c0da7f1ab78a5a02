r"""Unreduced per-modality losses (pure functions).

Coordinates / lattice: (weighted) MSE between predicted and target
sigma-normalized scores. Atom types: D3PM variational bound
KL[q(a_{t-1}|a_t,a_0) || p_theta(a_{t-1}|a_t)] (NLL at t=1) plus
ce_weight * cross entropy on p(a_0|a_t).

Capability parity with the reference loss calculators
(src/diffusion_for_multi_scale_molecular_dynamics/loss/{coordinates_loss_calculator,
lattice_loss_calculator,atom_type_loss_calculator}.py), as branchless jnp
functions selected once at configuration time.
"""

from typing import Callable

import jax
import jax.numpy as jnp

from ..namespace import AXL
from ..ops.d3pm import get_probability_at_previous_time_step
from .loss_parameters import (
    AtomTypeLossParameters,
    LossParameters,
    WeightedMSELossParameters,
)


def calculate_coordinates_loss(
    predicted_normalized_scores: jnp.ndarray,
    target_normalized_conditional_scores: jnp.ndarray,
    sigmas: jnp.ndarray,
    parameters: LossParameters,
) -> jnp.ndarray:
    """Unreduced (weighted) MSE, same shape as the inputs.

    ``sigmas`` must be broadcast to the score shape.
    """
    squared_error = (
        predicted_normalized_scores - target_normalized_conditional_scores
    ) ** 2
    if parameters.algorithm == "weighted_mse":
        assert isinstance(parameters, WeightedMSELossParameters)
        weights = jnp.exp(parameters.exponent * (sigmas - parameters.sigma0)) + 1.0
        return squared_error * weights
    return squared_error


# The lattice loss has identical structure to the coordinates loss.
calculate_lattice_loss = calculate_coordinates_loss


def _cross_entropy_term(
    predicted_logits: jnp.ndarray, one_hot_real_atom_types: jnp.ndarray
) -> jnp.ndarray:
    """-log p~(a_0 | a_t) restricted to the true class, MASK column squashed."""
    nll = -jax.nn.log_softmax(predicted_logits, axis=-1)
    # p(a_0 = MASK) = 0 by construction (logit -inf): drop its divergent NLL.
    nll = nll.at[..., -1].set(0.0)
    # Select-before-multiply: a hard-zero prediction off the true class would
    # otherwise produce 0 * inf = NaN.
    return jnp.where(one_hot_real_atom_types > 0, nll, 0.0)


def _variational_bound_term(
    predicted_logits: jnp.ndarray,
    one_hot_real_atom_types: jnp.ndarray,
    one_hot_noisy_atom_types: jnp.ndarray,
    q_matrices: jnp.ndarray,
    q_bar_matrices: jnp.ndarray,
    q_bar_tm1_matrices: jnp.ndarray,
    time_indices: jnp.ndarray,
    eps: float,
) -> jnp.ndarray:
    """KL[q(a_{t-1}|a_t,a_0) || p_theta(a_{t-1}|a_t)], NLL at the first step."""
    q_posterior = get_probability_at_previous_time_step(
        probability_at_zeroth_timestep=one_hot_real_atom_types,
        one_hot_probability_at_current_timestep=one_hot_noisy_atom_types,
        q_matrices=q_matrices,
        q_bar_matrices=q_bar_matrices,
        q_bar_tm1_matrices=q_bar_tm1_matrices,
        small_epsilon=eps,
    )
    p_model = get_probability_at_previous_time_step(
        probability_at_zeroth_timestep=predicted_logits,
        one_hot_probability_at_current_timestep=one_hot_noisy_atom_types,
        q_matrices=q_matrices,
        q_bar_matrices=q_bar_matrices,
        q_bar_tm1_matrices=q_bar_tm1_matrices,
        small_epsilon=eps,
        probability_at_zeroth_timestep_are_logits=True,
    )

    log_p = jnp.log(jnp.clip(p_model, min=eps))
    # Pointwise KL integrand q * (log q - log p), with q log q := 0 at q = 0.
    kl = jnp.where(
        q_posterior > 0.0,
        q_posterior * (jnp.log(jnp.clip(q_posterior, min=eps)) - log_p),
        0.0,
    )

    nll_first_step = -log_p * one_hot_real_atom_types
    is_first = (time_indices == 0)[:, None, None]
    return jnp.where(is_first, nll_first_step, kl)


def calculate_atom_types_loss(
    predicted_logits: jnp.ndarray,
    one_hot_real_atom_types: jnp.ndarray,
    one_hot_noisy_atom_types: jnp.ndarray,
    time_indices: jnp.ndarray,
    q_matrices: jnp.ndarray,
    q_bar_matrices: jnp.ndarray,
    q_bar_tm1_matrices: jnp.ndarray,
    parameters: AtomTypeLossParameters,
) -> jnp.ndarray:
    """Unreduced D3PM loss, [batch, natoms, num_classes].

    Q matrices may be per-sample ([batch, 1, C, C]) or per-atom
    ([batch, natoms, C, C]); they broadcast identically.
    """
    vb = _variational_bound_term(
        predicted_logits,
        one_hot_real_atom_types,
        one_hot_noisy_atom_types,
        q_matrices,
        q_bar_matrices,
        q_bar_tm1_matrices,
        time_indices,
        parameters.eps,
    )
    ce = _cross_entropy_term(predicted_logits, one_hot_real_atom_types)
    return vb + parameters.ce_weight * ce


def create_loss_calculator(loss_parameters: AXL) -> AXL:
    """Bind parameters into an AXL of unreduced-loss callables."""

    def coordinates_fn(predicted, target, sigmas):
        return calculate_coordinates_loss(
            predicted, target, sigmas, loss_parameters.X
        )

    def lattice_fn(predicted, target, sigmas):
        return calculate_lattice_loss(predicted, target, sigmas, loss_parameters.L)

    def atom_types_fn(
        predicted_logits,
        one_hot_real,
        one_hot_noisy,
        time_indices,
        q_matrices,
        q_bar_matrices,
        q_bar_tm1_matrices,
    ):
        return calculate_atom_types_loss(
            predicted_logits,
            one_hot_real,
            one_hot_noisy,
            time_indices,
            q_matrices,
            q_bar_matrices,
            q_bar_tm1_matrices,
            loss_parameters.A,
        )

    return AXL(A=atom_types_fn, X=coordinates_fn, L=lattice_fn)
