"""Forward noising of the AXL composition (explicit-PRNG, pure functions).

Each noiser is a pure function of (key, clean data, noise parameters), so
forward noising composes directly into jitted training steps and scanned
RePaint loops — no hidden RNG state, no host round trips.

Capability parity with the reference noiser classes
(src/diffusion_for_multi_scale_molecular_dynamics/noisers/{relative_coordinates,atom_types,lattice}_noiser.py).
"""

import jax
import jax.numpy as jnp

from .namespace import AXL
from .ops.d3pm import compute_q_at_given_a0
from .ops.gaussian_score import scale_sigma_by_number_of_atoms
from .ops.geometry import map_relative_coordinates_to_unit_cell


def get_noisy_relative_coordinates_sample(
    key, real_relative_coordinates: jnp.ndarray, sigmas: jnp.ndarray
) -> jnp.ndarray:
    """x_t = wrap(x_0 + sigma * z), z ~ N(0, 1).

    ``sigmas`` must already be broadcast to the coordinate shape (one value
    per configuration for consistent noising).
    """
    z = jax.random.normal(
        key, real_relative_coordinates.shape, real_relative_coordinates.dtype
    )
    return map_relative_coordinates_to_unit_cell(
        real_relative_coordinates + sigmas * z
    )


def get_noisy_atom_types_sample(
    key, real_onehot_atom_types: jnp.ndarray, q_bar: jnp.ndarray
) -> jnp.ndarray:
    """Sample a_t ~ q(a_t | a_0) = a_0 Qbar_t via the Gumbel-argmax trick.

    Args:
        key: PRNG key.
        real_onehot_atom_types: one-hot a_0, [..., C].
        q_bar: cumulative transition matrices, [..., C, C] broadcastable.

    Returns:
        integer class indices, shape [...].
    """
    probs = compute_q_at_given_a0(real_onehot_atom_types, q_bar)
    gumbel = jax.random.gumbel(key, probs.shape, probs.dtype)
    return jnp.argmax(jnp.log(probs) + gumbel, axis=-1)


def get_noisy_lattice_parameters_sample(
    key,
    real_lattice_parameters: jnp.ndarray,
    sigmas_n: jnp.ndarray,
    use_fixed_lattice_parameters: bool = False,
) -> jnp.ndarray:
    """l_t = l_0 + sigma_n * z (unwrapped; negative boxes allowed in noise space)."""
    if use_fixed_lattice_parameters:
        return real_lattice_parameters
    z = jax.random.normal(
        key, real_lattice_parameters.shape, real_lattice_parameters.dtype
    )
    return real_lattice_parameters + sigmas_n * z


def noise_axl_composition(
    key,
    composition: AXL,
    sigma: jnp.ndarray,
    q_bar_matrix: jnp.ndarray,
    num_classes: int,
    spatial_dimension: int,
    use_fixed_lattice_parameters: bool = False,
) -> AXL:
    """Noise all three modalities of a batched AXL composition.

    Args:
        key: PRNG key (split internally per modality).
        composition: clean AXL; A [batch, natoms] int, X [batch, natoms, d],
            L [batch, n_lattice_params].
        sigma: per-sample sigma(t), [batch].
        q_bar_matrix: per-sample cumulative D3PM matrices, [batch, C, C].
        num_classes: atom classes including MASK.
        spatial_dimension: d.
        use_fixed_lattice_parameters: hold L fixed if True.

    Returns:
        noisy AXL of the same shapes (A becomes the noisy class indices).
    """
    key_x, key_a, key_l = jax.random.split(key, 3)

    sigmas_x = sigma[:, None, None]
    xt = get_noisy_relative_coordinates_sample(key_x, composition.X, sigmas_x)

    a0_onehot = jax.nn.one_hot(composition.A, num_classes, dtype=composition.X.dtype)
    at = get_noisy_atom_types_sample(key_a, a0_onehot, q_bar_matrix[:, None, :, :])

    natoms = composition.X.shape[-2]
    sigmas_n = scale_sigma_by_number_of_atoms(
        sigma[:, None], natoms, spatial_dimension
    )
    lt = get_noisy_lattice_parameters_sample(
        key_l, composition.L, sigmas_n, use_fixed_lattice_parameters
    )

    return AXL(A=at, X=xt, L=lt)
