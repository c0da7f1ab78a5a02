"""Reference crystal configurations (silicon diamond supercells, SiGe).

(reference: src/diffusion_for_multi_scale_molecular_dynamics/utils/reference_configurations.py:6-80)
"""

from typing import Tuple

import numpy as np

# Conventional diamond cell: 8 atoms in fractional coordinates.
DIAMOND_FRACTIONAL_COORDINATES = np.array(
    [
        [0.00, 0.00, 0.00],
        [0.00, 0.50, 0.50],
        [0.50, 0.00, 0.50],
        [0.50, 0.50, 0.00],
        [0.25, 0.25, 0.25],
        [0.25, 0.75, 0.75],
        [0.75, 0.25, 0.75],
        [0.75, 0.75, 0.25],
    ]
)

SILICON_LATTICE_CONSTANT = 5.43  # Angstrom


def get_silicon_supercell(
    supercell_factor: int = 1, lattice_constant: float = SILICON_LATTICE_CONSTANT
) -> Tuple[np.ndarray, np.ndarray]:
    """Perfect diamond-Si supercell.

    Returns:
        relative_coordinates: [8 * f^3, 3] fractional coordinates,
        cell: [3, 3] row-stacked supercell vectors.
    """
    f = supercell_factor
    shifts = np.array(
        [[i, j, k] for i in range(f) for j in range(f) for k in range(f)],
        dtype=np.float64,
    )
    coords = (DIAMOND_FRACTIONAL_COORDINATES[None] + shifts[:, None]) / f
    coords = coords.reshape(-1, 3)
    cell = np.eye(3) * lattice_constant * f
    return coords, cell


def create_equilibrium_sige_structure(
    supercell_factor: int = 1, lattice_constant: float = 5.543
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Zincblende SiGe: Si on one diamond sublattice, Ge on the other.

    Returns:
        relative_coordinates [n, 3], atom_types [n] (0 = Ge, 1 = Si, by the
        sorted-element convention of ElementTypes(["Si", "Ge"])), cell [3, 3].
    """
    coords, cell = get_silicon_supercell(supercell_factor, lattice_constant)
    n_per_cell = 8
    base_types = np.array([1, 1, 1, 1, 0, 0, 0, 0], dtype=np.int64)  # Si, then Ge
    atom_types = np.tile(base_types, len(coords) // n_per_cell)
    return coords, atom_types, cell
