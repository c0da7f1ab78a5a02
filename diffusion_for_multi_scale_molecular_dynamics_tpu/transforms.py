"""Noising transform: augment a clean batch with everything score matching needs.

The reference applies this inside CPU dataloader workers
(src/diffusion_for_multi_scale_molecular_dynamics/data/diffusion/noising_transform.py:30-232).
TPU-first, it is a pure function of (key, batch) closing over the precomputed
noise tables, so it fuses into the jitted train step and the data pipeline
ships only clean arrays to the device.

Produced keys: TIME, TIME_INDICES, NOISE (sigma), Q/Qbar/Qbar_{t-1} matrices
(kept per-sample [batch, 1, C, C] instead of materializing per-atom copies),
NOISY_ATOM_TYPES, NOISY_RELATIVE_COORDINATES, NOISY_LATTICE_PARAMETERS.
"""

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from .namespace import (
    ATOM_TYPES,
    LATTICE_PARAMETERS,
    NOISE,
    NOISY_ATOM_TYPES,
    NOISY_LATTICE_PARAMETERS,
    NOISY_RELATIVE_COORDINATES,
    Q_BAR_MATRICES,
    Q_BAR_TM1_MATRICES,
    Q_MATRICES,
    RELATIVE_COORDINATES,
    TIME,
    TIME_INDICES,
)
from .noise_schedulers import NoiseSchedule, get_noise_at_indices
from .noise_schedulers.noise_schedule import sample_random_time_indices
from .noisers import (
    get_noisy_atom_types_sample,
    get_noisy_lattice_parameters_sample,
    get_noisy_relative_coordinates_sample,
)
from .ops.d3pm import class_index_to_onehot
from .ops.gaussian_score import scale_sigma_by_number_of_atoms
from .transport import Transporter


def noising_transform(
    key,
    batch: Dict[str, Any],
    schedule: NoiseSchedule,
    spatial_dimension: int,
    use_fixed_lattice_parameters: bool = False,
    use_optimal_transport: bool = False,
    transporter: Optional[Transporter] = None,
    time_indices: Optional[jnp.ndarray] = None,
) -> Dict[str, Any]:
    """Draw a random time per sample and noise every modality.

    Args:
        key: PRNG key.
        batch: dict with RELATIVE_COORDINATES [b, n, d], ATOM_TYPES [b, n],
            LATTICE_PARAMETERS [b, n_l].
        schedule: precomputed noise tables.
        spatial_dimension: d.
        use_fixed_lattice_parameters: hold L fixed.
        use_optimal_transport: align x_t to x_0 with the transporter.
        transporter: transporter to use (identity point group by default).
        time_indices: fixed per-sample indices (RePaint path); random if None.

    Returns:
        the batch dict augmented with the noised data (input not mutated).
    """
    x0 = batch[RELATIVE_COORDINATES]
    a0 = batch[ATOM_TYPES]
    l0 = batch[LATTICE_PARAMETERS]
    batch_size, natoms, _ = x0.shape

    key_t, key_x, key_a, key_l = jax.random.split(key, 4)
    if time_indices is None:
        time_indices = sample_random_time_indices(key_t, schedule, (batch_size,))
    noise = get_noise_at_indices(schedule.noise, time_indices)

    sigmas_x = noise.sigma[:, None, None].astype(x0.dtype)
    xt = get_noisy_relative_coordinates_sample(
        key_x, x0, jnp.broadcast_to(sigmas_x, x0.shape)
    )

    if use_optimal_transport:
        if transporter is None:
            transporter = Transporter(jnp.eye(spatial_dimension)[None])
        xt = transporter.get_optimal_transport(x0, xt)

    a0_onehot = class_index_to_onehot(a0, schedule.num_classes)
    q_bar = noise.q_bar_matrix[:, None, :, :]  # [b, 1, C, C] broadcast over atoms
    at = get_noisy_atom_types_sample(key_a, a0_onehot, q_bar)

    sigmas_n = scale_sigma_by_number_of_atoms(
        noise.sigma[:, None].astype(l0.dtype), natoms, spatial_dimension
    )
    lt = get_noisy_lattice_parameters_sample(
        key_l, l0, jnp.broadcast_to(sigmas_n, l0.shape), use_fixed_lattice_parameters
    )

    augmented = dict(batch)
    augmented[TIME] = noise.time[:, None].astype(x0.dtype)
    augmented[TIME_INDICES] = time_indices
    augmented[NOISE] = noise.sigma[:, None].astype(x0.dtype)
    augmented[Q_MATRICES] = noise.q_matrix[:, None, :, :]
    augmented[Q_BAR_MATRICES] = q_bar
    augmented[Q_BAR_TM1_MATRICES] = noise.q_bar_tm1_matrix[:, None, :, :]
    augmented[NOISY_ATOM_TYPES] = at
    augmented[NOISY_RELATIVE_COORDINATES] = xt
    augmented[NOISY_LATTICE_PARAMETERS] = lt
    return augmented


def noising_transform_given_time_index(
    key,
    batch: Dict[str, Any],
    schedule: NoiseSchedule,
    index_i: int | jnp.ndarray,
    spatial_dimension: int,
    use_fixed_lattice_parameters: bool = False,
) -> Dict[str, Any]:
    """Noise every sample to the same one-based time index (RePaint).

    ``index_i`` follows the one-based convention t_1 = delta .. t_N = 1
    (reference: noising_transform.py:98-120).
    """
    batch_size = batch[RELATIVE_COORDINATES].shape[0]
    idx = jnp.full((batch_size,), index_i - 1, dtype=jnp.int32)
    return noising_transform(
        key,
        batch,
        schedule,
        spatial_dimension,
        use_fixed_lattice_parameters=use_fixed_lattice_parameters,
        use_optimal_transport=False,
        time_indices=idx,
    )
