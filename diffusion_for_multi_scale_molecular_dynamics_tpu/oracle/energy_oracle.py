"""Energy-oracle interface: ground-truth energies/forces on generated samples.

The reference calls in-process C++ LAMMPS once per configuration
(src/diffusion_for_multi_scale_molecular_dynamics/oracle/{energy_oracle,
lammps_energy_oracle}.py). The TPU-native flagship implementation is the
vectorized JAX Stillinger-Weber oracle (stillinger_weber.py): a whole batch
of samples is scored in one jitted call without leaving the device. A
subprocess LAMMPS oracle with the same interface remains available for
potentials outside SW (lammps_oracle.py).
"""

from abc import ABC, abstractmethod
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from ..namespace import AXL
from ..ops.geometry import (
    get_spatial_dimension_from_number_of_lattice_parameters,
)

MINIMAL_BOX_SIZE = 3.0  # Angstrom; tiny noisy boxes are meaningless to score


@dataclass(kw_only=True)
class OracleParameters:
    """Base oracle configuration."""

    name: str
    elements: List[str]


class EnergyOracle(ABC):
    """Computes reference energies and forces for sampled compositions."""

    def __init__(self, oracle_parameters: OracleParameters):
        self.parameters = oracle_parameters

    @abstractmethod
    def _compute_batch_energy_and_forces(
        self,
        cartesian_positions: np.ndarray,
        basis_vectors: np.ndarray,
        atom_types: np.ndarray,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """[b, n, d], [b, d, d], [b, n] -> energies [b], forces [b, n, d]."""

    def compute_oracle_energies_and_forces(
        self, samples: AXL, cartesian_positions: Optional[np.ndarray] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Score a batch of AXL samples.

        Lattice parameters are clipped to a minimal physical box before
        scoring (the reference skips boxes < 3 A, lammps_energy_oracle.py:125;
        clipping keeps the output shape static instead).
        """
        lattice = np.asarray(samples.L)
        d = get_spatial_dimension_from_number_of_lattice_parameters(
            lattice.shape[-1]
        )
        lengths = np.clip(lattice[:, :d], MINIMAL_BOX_SIZE, None)
        basis_vectors = lengths[:, :, None] * np.eye(d)[None]

        if cartesian_positions is None:
            cartesian_positions = np.einsum(
                "bnd,bde->bne", np.asarray(samples.X), basis_vectors
            )
        atom_types = np.asarray(samples.A)
        return self._compute_batch_energy_and_forces(
            cartesian_positions, basis_vectors, atom_types
        )
