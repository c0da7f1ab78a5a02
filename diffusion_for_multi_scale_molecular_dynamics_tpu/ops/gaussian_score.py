"""Sigma-normalized score of the plain Gaussian kernel (lattice parameters).

K(l, l0) ~ exp[-|l - l0|^2 / (2 sigma_n^2)] gives
sigma_n * d/dl log K = -(l - l0) / sigma_n.

(reference: src/diffusion_for_multi_scale_molecular_dynamics/score/gaussian_score.py:16)
"""

import jax.numpy as jnp


def get_lattice_sigma_normalized_score(
    noisy_l: jnp.ndarray, real_l: jnp.ndarray, sigma_n: jnp.ndarray
) -> jnp.ndarray:
    """sigma_n-normalized Gaussian score for lattice parameters."""
    return -(noisy_l - real_l) / sigma_n


def scale_sigma_by_number_of_atoms(
    sigma: jnp.ndarray, number_of_atoms, spatial_dimension: int
) -> jnp.ndarray:
    """sigma_n = sigma / n^(1/d).

    The unit-cell volume scales with the atom count; rescaling sigma keeps
    the lattice noise comparable across system sizes
    (reference: utils/noise_utils.py:4).
    """
    return sigma / jnp.power(
        jnp.asarray(number_of_atoms, dtype=jnp.result_type(sigma)),
        1.0 / spatial_dimension,
    )
