r"""Adaptive-step corrector-only generator (Song et al. 2021).

No predictor update for X/L (atom types still follow the D3PM predictor);
the corrector step size adapts to the current score magnitude:

    eps_i = 2 (r ||z|| / ||s||)^2,   s = (sigma * score) / sigma,

with r = noise_parameters.corrector_r.

Usage guidance (measured with an *exact* analytical score,
tests/test_sampling_fidelity.py): corrector-only transport needs >= 5
corrector steps per noise level — at the reference default of 2 only ~60%
of atoms reach a mode even with a perfect score. With a *learned* score
additionally set ``adaptive_corrector_mode_std`` to the data's thermal
displacement scale so the step-length cap fences the vanishing-score
(large sigma) regime, where the raw |z|/|s| step teleports atoms.

(reference: src/diffusion_for_multi_scale_molecular_dynamics/generators/adaptive_corrector.py:17-148)
"""

import jax.numpy as jnp

from .langevin_generator import LangevinGenerator


class AdaptiveCorrectorGenerator(LangevinGenerator):
    """Langevin corrector with adaptive step sizes for X and L."""

    # Predictor leaves X and L untouched (atom types still follow the D3PM
    # predictor): zero the predictor-side update weights in the shared
    # substep program, keeping the corrector's adaptive step sizes.
    def _substep_xl_weights(
        self, is_predictor, idx, sigma_i, sigma_n_i, predictions, z_x, z_l, tau
    ):
        weights = super()._substep_xl_weights(
            is_predictor, idx, sigma_i, sigma_n_i, predictions, z_x, z_l, tau
        )
        return tuple(jnp.where(is_predictor, 0.0, w) for w in weights)

    def _generic_corrector_step_size(self, sigma_i, sigma_normalized_scores, z, norm_axes):
        score_norm = jnp.mean(
            jnp.linalg.norm(sigma_normalized_scores, axis=norm_axes)
        )
        score_norm = score_norm / sigma_i
        z_norm = jnp.mean(jnp.linalg.norm(z, axis=-1))
        r = self.noise_parameters.corrector_r
        # length = |z|/|s| diverges when the learned score norm is tiny (the
        # near-uniform large-sigma phase) and the step teleports atoms — the
        # documented reference-default failure on the production system. An
        # exact harmonic score has |s| = sqrt(dof / (s_data^2 + sigma^2))
        # over the dof components the score norm covers, so cap length at
        # cap_factor x its exact-score value (see sampling parameters).
        length = z_norm / jnp.clip(score_norm, min=self.small_epsilon)
        cap_factor = self.sampling_parameters.adaptive_corrector_max_length_over_sigma
        mode_std = self.sampling_parameters.adaptive_corrector_mode_std
        # The cap engages only when the data's thermal scale is supplied:
        # with mode_std = 0 the harmonic length collapses to z_norm*sigma/
        # sqrt(dof) at freeze-out and would wrongly clamp healthy steps
        # (sigma << data width), contradicting the "defaults are inert"
        # contract of the sampling parameters.
        if cap_factor > 0 and mode_std > 0:
            axes = norm_axes if isinstance(norm_axes, tuple) else (norm_axes,)
            dof = 1.0
            for axis in axes:
                dof = dof * sigma_normalized_scores.shape[axis]
            harmonic_length = z_norm * jnp.sqrt(
                (sigma_i**2 + mode_std**2) / dof
            )
            length = jnp.minimum(length, cap_factor * harmonic_length)
        return 2.0 * (r * length) ** 2

    def _coordinates_corrector_step_size(self, idx, sigma_i, scores, z):
        return self._generic_corrector_step_size(sigma_i, scores, z, norm_axes=(-2, -1))

    def _lattice_corrector_step_size(self, idx, sigma_n_i, scores, z):
        return self._generic_corrector_step_size(sigma_n_i, scores, z, norm_axes=-1)
