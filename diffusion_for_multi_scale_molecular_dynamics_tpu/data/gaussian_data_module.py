"""Synthetic Gaussian dataset (in memory, no disk).

Relative coordinates are isotropic Gaussian displacements of width sigma_d
around fixed equilibrium coordinates, wrapped to the unit cell; a single
element type; unit box. Used for toy experiments and hermetic tests where
the analytical score network is exact.

Capability parity with the reference GaussianDataModule
(src/diffusion_for_multi_scale_molecular_dynamics/data/diffusion/gaussian_data_module.py:26-187).
TPU-first difference: batches are plain numpy dicts of *clean* data — the
noising transform runs inside the jitted train step, not in a dataloader.
"""

from dataclasses import dataclass
from typing import Dict, Iterator, List

import numpy as np

from ..namespace import (
    ATOM_TYPES,
    CARTESIAN_FORCES,
    LATTICE_PARAMETERS,
    RELATIVE_COORDINATES,
)
from ..ops.geometry import get_number_of_lattice_parameters
from .data_module_parameters import DataModuleParameters
from .element_types import ElementTypes


@dataclass(kw_only=True)
class GaussianDataModuleParameters(DataModuleParameters):
    """Hyperparameters of the in-memory Gaussian data module."""

    data_source: str = "gaussian"
    random_seed: int
    number_of_atoms: int
    sigma_d: float = 0.01
    equilibrium_relative_coordinates: List[List[float]] = None
    train_dataset_size: int = 8_192
    valid_dataset_size: int = 1_024

    def __post_init__(self):
        super().__post_init__()
        assert self.sigma_d > 0.0, "the sigma_d parameter should be positive."
        assert len(self.equilibrium_relative_coordinates) == self.number_of_atoms, (
            "one equilibrium coordinate list per atom is required"
        )
        for x in self.equilibrium_relative_coordinates:
            assert len(x) == self.spatial_dimension
        assert len(self.elements) == 1, (
            "the gaussian data module supports a single element type"
        )


class GaussianDataModule:
    """In-memory Gaussian blobs around equilibrium coordinates."""

    def __init__(self, hyper_params: GaussianDataModuleParameters):
        self.params = hyper_params
        self.element_types = ElementTypes(hyper_params.elements)
        self._rng = np.random.RandomState(hyper_params.random_seed)
        d = hyper_params.spatial_dimension
        self._n_lattice = get_number_of_lattice_parameters(d)
        self._equilibrium = np.asarray(
            hyper_params.equilibrium_relative_coordinates, dtype=np.float32
        )
        self.train_dataset = self._draw_dataset(hyper_params.train_dataset_size)
        self.valid_dataset = self._draw_dataset(hyper_params.valid_dataset_size)

    def _draw_dataset(self, size: int) -> Dict[str, np.ndarray]:
        p = self.params
        d = p.spatial_dimension
        x = self._equilibrium[None] + p.sigma_d * self._rng.randn(
            size, p.number_of_atoms, d
        ).astype(np.float32)
        x = np.mod(x, 1.0)
        x[x >= 1.0] = 0.0
        lattice = np.zeros((size, self._n_lattice), dtype=np.float32)
        lattice[:, :d] = 1.0  # unit box
        return {
            RELATIVE_COORDINATES: x,
            ATOM_TYPES: np.zeros((size, p.number_of_atoms), dtype=np.int32),
            LATTICE_PARAMETERS: lattice,
            CARTESIAN_FORCES: np.zeros_like(x),
        }

    @staticmethod
    def _iterate(dataset, batch_size: int, rng=None) -> Iterator[Dict[str, np.ndarray]]:
        size = dataset[RELATIVE_COORDINATES].shape[0]
        order = np.arange(size) if rng is None else rng.permutation(size)
        # Drop the ragged tail: static batch shapes keep one compiled step.
        for start in range(0, size - batch_size + 1, batch_size):
            idx = order[start : start + batch_size]
            yield {k: v[idx] for k, v in dataset.items()}

    def train_batches(self) -> Iterator[Dict[str, np.ndarray]]:
        return self._iterate(
            self.train_dataset, self.params.train_batch_size, self._rng
        )

    def valid_batches(self) -> Iterator[Dict[str, np.ndarray]]:
        return self._iterate(self.valid_dataset, self.params.valid_batch_size)
