r"""AXL diffusion model: the generic training/eval step as pure functions.

Replaces the reference's LightningModule "training brain"
(src/diffusion_for_multi_scale_molecular_dynamics/models/axl_diffusion_lightning_model.py:76-730)
with a functional design: one ``generic_step`` computes the full loss

    L = lambda_X * L_x + lambda_A * L_a + lambda_L * L_L

from a *clean* batch — the noising transform runs inside the step, on device,
so a training step is a single compiled program: noise -> targets -> network
forward -> per-modality losses -> weighted sum (-> grads).

Loss targets:
  * X: the sigma-normalized conditional wrapped-Gaussian score
    sigma(t) * nabla log p_{t|0}(x_t | x_0), evaluated at wrap(x_t - x_0);
  * A: D3PM variational bound + cross entropy via the Q tables;
  * L: Gaussian score -(l_t - l_0) / sigma_n with sigma_n = sigma / n^(1/d).
"""

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ..namespace import (
    ATOM_MASK,
    ATOM_TYPES,
    AXL,
    AXL_COMPOSITION,
    CARTESIAN_FORCES,
    LATTICE_PARAMETERS,
    NOISE,
    NOISY_ATOM_TYPES,
    NOISY_AXL_COMPOSITION,
    NOISY_LATTICE_PARAMETERS,
    NOISY_RELATIVE_COORDINATES,
    Q_BAR_MATRICES,
    Q_BAR_TM1_MATRICES,
    Q_MATRICES,
    RELATIVE_COORDINATES,
    TIME,
    TIME_INDICES,
)
from ..noise_schedulers import NoiseParameters, NoiseSchedule, build_noise_schedule
from ..ops.d3pm import class_index_to_onehot
from ..ops.gaussian_score import (
    get_lattice_sigma_normalized_score,
    scale_sigma_by_number_of_atoms,
)
from ..ops.geometry import map_relative_coordinates_to_unit_cell
from ..ops.wrapped_gaussian_score import get_coordinates_sigma_normalized_score
from ..loss import create_loss_calculator
from ..transforms import noising_transform


@dataclass(frozen=True, kw_only=True)
class AXLDiffusionConfig:
    """Top-level diffusion-model hyperparameters.

    (reference: axl_diffusion_lightning_model.py:62-75)
    """

    score_network_config: Any
    loss_parameters: AXL  # AXL of LossParameters
    noise_parameters: NoiseParameters
    kmax_target_score: int = 4
    use_fixed_lattice_parameters: bool = False
    use_optimal_transport: bool = False
    # Optional auxiliary-loss regularizer (activated after its burn-in).
    regularizer: Any = None


def get_coordinates_target_normalized_score(
    noisy_relative_coordinates: jnp.ndarray,
    real_relative_coordinates: jnp.ndarray,
    sigmas: jnp.ndarray,
    kmax: int,
) -> jnp.ndarray:
    """sigma(t) * nabla log p_{t|0}(x_t | x_0) on the torus."""
    delta = map_relative_coordinates_to_unit_cell(
        noisy_relative_coordinates - real_relative_coordinates
    )
    return get_coordinates_sigma_normalized_score(delta, sigmas, kmax=kmax)


def make_generic_step(
    score_network,
    config: AXLDiffusionConfig,
    schedule: Optional[NoiseSchedule] = None,
    apply_regularizer: bool = False,
) -> Callable:
    """Build the pure generic step.

    Returns:
        generic_step(params, batch, key, conditional: bool (static))
            -> (weighted_loss, aux dict)
        where batch holds the *clean* composition. With
        ``apply_regularizer=True`` (and a regularizer configured) the
        weighted auxiliary loss is added inside the same compiled program.
    """
    num_classes = config.score_network_config.num_classes
    spatial_dimension = config.score_network_config.spatial_dimension
    loss_calculator = create_loss_calculator(config.loss_parameters)
    lambda_weights = AXL(
        A=config.loss_parameters.A.lambda_weight,
        X=config.loss_parameters.X.lambda_weight,
        L=config.loss_parameters.L.lambda_weight,
    )
    if schedule is None:
        schedule = build_noise_schedule(config.noise_parameters, num_classes)

    regularizer = config.regularizer if apply_regularizer else None

    def generic_step(params, batch: Dict[str, Any], key, conditional: bool = False):
        key_noise, key_net = jax.random.split(key)
        augmented = noising_transform(
            key_noise,
            batch,
            schedule,
            spatial_dimension,
            use_fixed_lattice_parameters=config.use_fixed_lattice_parameters,
            use_optimal_transport=config.use_optimal_transport,
        )

        a0 = augmented[ATOM_TYPES]
        x0 = augmented[RELATIVE_COORDINATES]
        l0 = augmented[LATTICE_PARAMETERS]
        at = augmented[NOISY_ATOM_TYPES]
        xt = augmented[NOISY_RELATIVE_COORDINATES]
        lt = augmented[NOISY_LATTICE_PARAMETERS]
        batch_size, natoms, d = x0.shape

        sigmas = jnp.broadcast_to(
            augmented[NOISE][:, :, None], x0.shape
        ).astype(x0.dtype)
        target_x = get_coordinates_target_normalized_score(
            xt, x0, sigmas, config.kmax_target_score
        )

        sigmas_l = jnp.broadcast_to(augmented[NOISE], l0.shape).astype(l0.dtype)
        sigmas_n = scale_sigma_by_number_of_atoms(sigmas_l, natoms, d)
        target_l = get_lattice_sigma_normalized_score(lt, l0, sigmas_n)

        network_batch = {
            NOISY_AXL_COMPOSITION: AXL(A=at, X=xt, L=lt),
            TIME: augmented[TIME],
            NOISE: augmented[NOISE],
        }
        if CARTESIAN_FORCES in batch:
            network_batch[CARTESIAN_FORCES] = batch[CARTESIAN_FORCES]
        if ATOM_MASK in batch:
            network_batch[ATOM_MASK] = batch[ATOM_MASK]

        predictions = score_network.apply(params, network_batch, conditional)

        loss_x = loss_calculator.X(predictions.X, target_x, sigmas)
        loss_l = loss_calculator.L(predictions.L, target_l, sigmas_l)

        a0_onehot = class_index_to_onehot(a0, num_classes)
        at_onehot = class_index_to_onehot(at, num_classes)
        loss_a = loss_calculator.A(
            predictions.A,
            a0_onehot,
            at_onehot,
            augmented[TIME_INDICES],
            augmented[Q_MATRICES],
            augmented[Q_BAR_MATRICES],
            augmented[Q_BAR_TM1_MATRICES],
        )

        if ATOM_MASK in batch:
            atom_mask = batch[ATOM_MASK].astype(x0.dtype)
            per_atom_count = jnp.clip(jnp.sum(atom_mask, axis=1), min=1.0)
            mean_x = (
                jnp.sum(loss_x * atom_mask[:, :, None], axis=(1, 2))
                / (per_atom_count * d)
            )
            mean_a = (
                jnp.sum(loss_a * atom_mask[:, :, None], axis=(1, 2))
                / (per_atom_count * num_classes)
            )
        else:
            mean_x = jnp.mean(loss_x, axis=(1, 2))
            mean_a = jnp.mean(loss_a, axis=(1, 2))
        mean_l = jnp.mean(loss_l, axis=-1)

        per_sample = (
            lambda_weights.X * mean_x
            + lambda_weights.A * mean_a
            + lambda_weights.L * mean_l
        )
        weighted_loss = jnp.mean(per_sample)

        regularizer_loss = jnp.asarray(0.0, dtype=weighted_loss.dtype)
        if regularizer is not None:
            def bound_score_fn(b, cond=False):
                return score_network.apply(params, b, cond)

            key_net, key_reg = jax.random.split(key_net)
            regularizer_loss = regularizer.compute_weighted_regularizer_loss(
                bound_score_fn, network_batch, key_reg
            )
            weighted_loss = weighted_loss + regularizer_loss

        aux = {
            "loss": weighted_loss,
            "regularizer_loss": regularizer_loss,
            "loss_X": jnp.mean(mean_x),
            "loss_A": jnp.mean(mean_a),
            "loss_L": jnp.mean(mean_l),
            "unreduced_loss": AXL(A=loss_a, X=loss_x, L=loss_l),
            "predictions": predictions,
            "target_coordinates_normalized_conditional_scores": target_x,
            "target_lattice_normalized_conditional_scores": target_l,
            "sigmas": sigmas,
            TIME: augmented[TIME],
            TIME_INDICES: augmented[TIME_INDICES],
            AXL_COMPOSITION: AXL(A=a0, X=x0, L=l0),
            NOISY_AXL_COMPOSITION: AXL(A=at, X=xt, L=lt),
        }
        return weighted_loss, aux

    return generic_step


def make_train_step(generic_step, optimizer, ema_decay: float = 0.0) -> Callable:
    """Gradient step: (params, opt_state, batch, key) -> (params, opt_state, aux).

    With ``ema_decay > 0`` the returned step also carries an exponential
    moving average of the parameters (updated inside the same compiled
    program): (params, opt_state, ema_params, batch, key)
    -> (params, opt_state, ema_params, aux).
    """

    grad_fn = jax.value_and_grad(generic_step, has_aux=True)

    def train_step(params, opt_state, batch, key):
        (_, aux), grads = grad_fn(params, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        aux = {
            "loss": aux["loss"],
            "loss_X": aux["loss_X"],
            "loss_A": aux["loss_A"],
            "loss_L": aux["loss_L"],
            "regularizer_loss": aux.get("regularizer_loss", 0.0),
            "grad_norm": optax_global_norm(grads),
        }
        return params, opt_state, aux

    if ema_decay <= 0.0:
        return train_step

    def train_step_with_ema(params, opt_state, ema_params, batch, key):
        params, opt_state, aux = train_step(params, opt_state, batch, key)
        ema_params = jax.tree_util.tree_map(
            lambda e, p: ema_decay * e + (1.0 - ema_decay) * p, ema_params, params
        )
        return params, opt_state, ema_params, aux

    return train_step_with_ema


def optax_global_norm(tree) -> jnp.ndarray:
    """Global L2 norm of a pytree (for logging)."""
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))
