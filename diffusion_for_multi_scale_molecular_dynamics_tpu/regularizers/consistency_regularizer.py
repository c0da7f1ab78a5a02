r"""Consistency regularizer (Daras et al., adapted to the torus).

From a random valid batch element's time t_start, run the PC sampler for
``maximum_number_of_steps`` predictor steps (gradients stopped) from fresh
random coordinates, and require the model's normalized score at
(x_start, t_start) to match the wrapped-Gaussian conditional score toward the
partially denoised end point:

    target = (sigma_start / sigma_eff) * sigma_eff * nabla log K(x_start - x_end),
    sigma_eff = sqrt(sigma_start^2 - sigma_end^2),
    loss = sum(S (S - 2 target)) / batch_size.

(reference: src/diffusion_for_multi_scale_molecular_dynamics/regularizers/consistency_regularizer.py:30-308)

TPU-first: the partial trajectory is the generator's traceable scan embedded
directly in the compiled train step (the reference spawns a host-driven
sampling loop mid-training-step). Valid start times guarantee a fixed window
of ``maximum_number_of_steps`` steps, keeping the scan length static.
"""

from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ..generators.langevin_generator import LangevinGenerator
from ..generators.predictor_corrector_axl_generator import (
    PredictorCorrectorSamplingParameters,
)
from ..models.analytical_score_network import (
    AnalyticalScoreNetwork,
    AnalyticalScoreNetworkConfig,
)
from ..namespace import AXL, CARTESIAN_FORCES, NOISE, NOISY_AXL_COMPOSITION, TIME
from ..noise_schedulers import NoiseParameters
from ..ops.geometry import map_relative_coordinates_to_unit_cell
from ..ops.wrapped_gaussian_score import get_coordinates_sigma_normalized_score
from .regularizer import Regularizer, RegularizerParameters


@dataclass(kw_only=True)
class ConsistencyRegularizerParameters(RegularizerParameters):
    """Consistency regularization hyperparameters."""

    type: str = "consistency"
    maximum_number_of_steps: int
    kmax_target_score: int = 4
    noise_parameters: NoiseParameters = None
    sampling_parameters: PredictorCorrectorSamplingParameters = None
    # Sanity-check option: drive the partial trajectory with an analytical
    # score network instead of the trained one.
    analytical_score_network_config: Optional[AnalyticalScoreNetworkConfig] = None


class ConsistencyRegularizer(Regularizer):
    """Self-consistency along partial denoising trajectories."""

    def __init__(self, regularizer_parameters: ConsistencyRegularizerParameters):
        super().__init__(regularizer_parameters)
        self.max_steps = regularizer_parameters.maximum_number_of_steps
        self.kmax = regularizer_parameters.kmax_target_score
        # The generator is built once; its network is rebound per trace so the
        # trajectory follows the current parameters (gradients stopped).
        self._generator = LangevinGenerator(
            regularizer_parameters.noise_parameters,
            regularizer_parameters.sampling_parameters,
            axl_network=None,
        )
        self._analytical_network = None
        if regularizer_parameters.analytical_score_network_config is not None:
            self._analytical_network = AnalyticalScoreNetwork(
                regularizer_parameters.analytical_score_network_config
            )

    def compute_regularizer_loss(
        self, score_fn: Callable, augmented_batch: Dict[str, Any], key
    ) -> jnp.ndarray:
        key_pick, key_x, key_traj = jax.random.split(key, 3)
        noise = self._generator.schedule.noise
        composition = augmented_batch[NOISY_AXL_COMPOSITION]
        batch_size = composition.X.shape[0]
        batch_times = augmented_batch[TIME][:, 0]

        # Start times must leave room for max_steps predictor steps.
        valid = batch_times > noise.time[self.max_steps]
        any_valid = jnp.any(valid)
        # Categorical over the valid entries (uniform); safe fallback to 0.
        logits = jnp.where(valid, 0.0, -jnp.inf)
        safe_logits = jnp.where(any_valid, logits, jnp.zeros_like(logits))
        pick = jax.random.categorical(key_pick, safe_logits)

        start_time = batch_times[pick]
        start_sigma = augmented_batch[NOISE][pick, 0]
        start_index = jnp.argmin(jnp.abs(noise.time - start_time)) + 1
        end_index = start_index - self.max_steps
        end_sigma = jnp.where(
            end_index > 0, noise.sigma[jnp.maximum(end_index - 1, 0)], 0.0
        )

        # Fresh random coordinates; types/lattice copied from the picked item.
        x_start = jax.random.uniform(key_x, composition.X.shape)
        start_composition = AXL(
            A=jnp.broadcast_to(composition.A[pick], composition.A.shape),
            X=x_start,
            L=jnp.broadcast_to(composition.L[pick], composition.L.shape),
        )

        if self._analytical_network is not None:
            trajectory_network = lambda batch: self._analytical_network.apply(
                {}, batch, False
            )
        else:
            trajectory_network = score_fn
        self._generator.axl_network = trajectory_network

        # Partial denoising with a static-length window: scan max_steps steps
        # with per-step indices start_index-1 .. start_index-max_steps.
        indices = start_index - 1 - jnp.arange(self.max_steps)
        end_composition, _, _ = self._generator._scan_chunk(
            start_composition, key_traj, indices, False
        )
        end_composition = jax.lax.stop_gradient(end_composition)

        start_batch = {
            NOISY_AXL_COMPOSITION: start_composition,
            TIME: jnp.full((batch_size, 1), start_time),
            NOISE: jnp.full((batch_size, 1), start_sigma),
            CARTESIAN_FORCES: jnp.zeros_like(x_start),
        }
        start_normalized_score = score_fn(start_batch).X

        delta = map_relative_coordinates_to_unit_cell(
            start_composition.X - end_composition.X
        )
        effective_sigma = jnp.sqrt(
            jnp.clip(start_sigma**2 - end_sigma**2, min=1e-12)
        )
        effective_sigmas = jnp.full_like(delta, effective_sigma)
        target = (start_sigma / effective_sigma) * (
            get_coordinates_sigma_normalized_score(delta, effective_sigmas, self.kmax)
        )

        loss = (
            jnp.sum(
                start_normalized_score * (start_normalized_score - 2.0 * target)
            )
            / batch_size
        )
        return jnp.where(any_valid, loss, 0.0)
