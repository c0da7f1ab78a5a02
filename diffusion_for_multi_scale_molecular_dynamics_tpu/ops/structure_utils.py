"""Structure helpers: builders and pair-distance collection for metrics.

(reference: src/diffusion_for_multi_scale_molecular_dynamics/utils/structure_utils.py:15-163;
pymatgen replaced by the in-repo Structure container, KeOps by the dense
masked pair-distance op.)
"""

from typing import List

import jax.numpy as jnp
import numpy as np

from ..active_learning.structure import Structure
from .neighbors import compute_distances_in_batch  # noqa: F401 (re-export)


def create_structure(
    basis_vectors: np.ndarray, relative_coordinates: np.ndarray, species: List[str]
) -> Structure:
    """Build a Structure from cell + fractional coordinates + species names."""
    return Structure(
        species=list(species),
        frac_coords=np.asarray(relative_coordinates),
        cell=np.asarray(basis_vectors),
    )


def get_orthogonal_basis_vectors(
    batch_size: int, cell_dimensions: List[float]
) -> jnp.ndarray:
    """[batch, d, d] diagonal cells from a list of box lengths."""
    cell = jnp.diag(jnp.asarray(cell_dimensions, dtype=jnp.float32))
    return jnp.broadcast_to(cell, (batch_size,) + cell.shape)


def compute_distances(
    cartesian_positions: jnp.ndarray,
    basis_vectors: jnp.ndarray,
    max_distance: float,
) -> np.ndarray:
    """All periodic pair distances below max_distance, as a flat host array."""
    distances = np.asarray(
        compute_distances_in_batch(cartesian_positions, basis_vectors, max_distance)
    ).ravel()
    return distances[np.isfinite(distances)]
