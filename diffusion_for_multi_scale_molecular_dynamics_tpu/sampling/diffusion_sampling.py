"""Batch sampling driver: chunked generation + cartesian positions.

(reference: src/diffusion_for_multi_scale_molecular_dynamics/sampling/diffusion_sampling.py:16-73)
"""

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..namespace import AXL, AXL_COMPOSITION, CARTESIAN_POSITIONS
from ..ops.geometry import (
    get_positions_from_coordinates,
    map_noisy_lattice_parameters_to_unit_cell_vectors,
)


def create_batch_of_samples(
    generator, sampling_parameters, key
) -> Dict[str, Any]:
    """Generate number_of_samples in chunks of sample_batchsize.

    Each chunk is one compiled scan; chunks share the compilation cache
    (same shapes). Returns the concatenated AXL composition plus cartesian
    positions computed from the (clipped) sampled cells.
    """
    total = sampling_parameters.number_of_samples
    chunk = sampling_parameters.sample_batchsize or total

    chunks = []
    for start in range(0, total, chunk):
        key, chunk_key = jax.random.split(key)
        n = min(chunk, total - start)
        chunks.append(generator.sample(chunk_key, n))

    composition = AXL(
        A=jnp.concatenate([c.A for c in chunks]),
        X=jnp.concatenate([c.X for c in chunks]),
        L=jnp.concatenate([c.L for c in chunks]),
    )

    basis_vectors = map_noisy_lattice_parameters_to_unit_cell_vectors(
        composition.L
    )
    cartesian_positions = get_positions_from_coordinates(
        composition.X, basis_vectors
    )
    return {
        AXL_COMPOSITION: composition,
        CARTESIAN_POSITIONS: cartesian_positions,
    }
