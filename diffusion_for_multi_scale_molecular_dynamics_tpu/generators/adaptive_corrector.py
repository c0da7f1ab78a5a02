r"""Adaptive-step corrector-only generator (Song et al. 2021).

No predictor update for X/L (atom types still follow the D3PM predictor);
the corrector step size adapts to the current score magnitude:

    eps_i = 2 (r ||z|| / ||s||)^2,   s = (sigma * score) / sigma,

with r = noise_parameters.corrector_r.

(reference: src/diffusion_for_multi_scale_molecular_dynamics/generators/adaptive_corrector.py:17-148)
"""

import jax.numpy as jnp

from .langevin_generator import LangevinGenerator


class AdaptiveCorrectorGenerator(LangevinGenerator):
    """Langevin corrector with adaptive step sizes for X and L."""

    def _relative_coordinates_update_noop(self, x, *args):
        return x

    # Predictor leaves X and L untouched: override the update primitives used
    # inside predictor_step by wrapping it.
    def predictor_step(self, key, composition, idx):
        updated, predictions = super().predictor_step(key, composition, idx)
        return (
            updated._replace(X=composition.X, L=composition.L),
            predictions,
        )

    def _generic_corrector_step_size(self, sigma_i, sigma_normalized_scores, z, norm_axes):
        score_norm = jnp.mean(
            jnp.linalg.norm(sigma_normalized_scores, axis=norm_axes)
        )
        score_norm = score_norm / sigma_i
        z_norm = jnp.mean(jnp.linalg.norm(z, axis=-1))
        r = self.noise_parameters.corrector_r
        return 2.0 * (r * z_norm / jnp.clip(score_norm, min=self.small_epsilon)) ** 2

    def _coordinates_corrector_step_size(self, idx, sigma_i, scores, z):
        return self._generic_corrector_step_size(sigma_i, scores, z, norm_axes=(-2, -1))

    def _lattice_corrector_step_size(self, idx, sigma_n_i, scores, z):
        return self._generic_corrector_step_size(sigma_n_i, scores, z, norm_axes=-1)
