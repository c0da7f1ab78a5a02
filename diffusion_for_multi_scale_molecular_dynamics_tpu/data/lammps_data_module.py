"""LAMMPS-backed data module: parquet cache -> padded numpy batches.

TPU-first differences from the reference
(src/diffusion_for_multi_scale_molecular_dynamics/data/diffusion/lammps_for_diffusion_data_module.py:41-288):
the reference wraps HuggingFace datasets with a per-worker noising transform
and NaN-pads to max_atom; here the whole (small) dataset is materialized once
as padded numpy arrays with an explicit boolean ATOM_MASK (NaNs would poison
jit), and batches of *clean* data stream to the device — noising happens
inside the compiled train step.
"""

import logging
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional

import numpy as np

from ..namespace import (
    ATOM_MASK,
    ATOM_TYPES,
    CARTESIAN_FORCES,
    LATTICE_PARAMETERS,
    RELATIVE_COORDINATES,
)
from .data_module_parameters import DataModuleParameters
from .element_types import ElementTypes
from .lammps_processor import LammpsProcessorForDiffusion

logger = logging.getLogger(__name__)


@dataclass(kw_only=True)
class LammpsDataModuleParameters(DataModuleParameters):
    """Hyperparameters of the LAMMPS data module."""

    data_source: str = "LAMMPS"
    lammps_run_dir: Optional[str] = None
    processed_dataset_dir: str = None
    seed: int = 42

    def __post_init__(self):
        super().__post_init__()
        assert self.processed_dataset_dir, "processed_dataset_dir is required"


class LammpsDataModule:
    """Padded in-memory dataset over the parquet cache."""

    def __init__(self, hyper_params: LammpsDataModuleParameters):
        self.params = hyper_params
        self.element_types = ElementTypes(hyper_params.elements)
        self._rng = np.random.RandomState(hyper_params.seed)

        processor = LammpsProcessorForDiffusion(
            hyper_params.lammps_run_dir,
            hyper_params.processed_dataset_dir,
            hyper_params.elements,
        )
        assert processor.train_files, "no training parquet files found"
        assert processor.valid_files, "no validation parquet files found"
        self.train_dataset = self._load(processor.train_files)
        self.valid_dataset = self._load(processor.valid_files)
        logger.info(
            "LAMMPS datamodule: %d train / %d valid configurations",
            len(self.train_dataset[RELATIVE_COORDINATES]),
            len(self.valid_dataset[RELATIVE_COORDINATES]),
        )

    def _load(self, parquet_files: List[str]) -> Dict[str, np.ndarray]:
        import pandas as pd

        frames = [pd.read_parquet(f) for f in parquet_files]
        frame = pd.concat(frames, ignore_index=True)

        max_atom = self.params.max_atom
        d = self.params.spatial_dimension
        n = len(frame)

        x = np.zeros((n, max_atom, d), dtype=np.float32)
        forces = np.zeros((n, max_atom, d), dtype=np.float32)
        atom_types = np.zeros((n, max_atom), dtype=np.int32)
        mask = np.zeros((n, max_atom), dtype=bool)
        lattice = np.stack(
            [np.asarray(row, dtype=np.float32) for row in frame["lattice_parameters"]]
        )

        for i, (natom, rel, force, elements) in enumerate(
            zip(
                frame["natom"],
                frame["relative_coordinates"],
                frame["cartesian_forces"],
                frame["element"],
            )
        ):
            natom = int(natom)
            assert natom <= max_atom, (
                f"configuration with {natom} atoms exceeds max_atom={max_atom}"
            )
            x[i, :natom] = np.asarray(rel, dtype=np.float32).reshape(natom, d)
            forces[i, :natom] = np.asarray(force, dtype=np.float32).reshape(natom, d)
            atom_types[i, :natom] = np.asarray(elements, dtype=np.int32)
            mask[i, :natom] = True

        return {
            RELATIVE_COORDINATES: x,
            ATOM_TYPES: atom_types,
            LATTICE_PARAMETERS: lattice,
            CARTESIAN_FORCES: forces,
            ATOM_MASK: mask,
            "potential_energy": np.asarray(
                frame["potential_energy"], dtype=np.float32
            ),
        }

    @staticmethod
    def _iterate(dataset, batch_size: int, rng=None) -> Iterator[Dict[str, np.ndarray]]:
        size = dataset[RELATIVE_COORDINATES].shape[0]
        order = np.arange(size) if rng is None else rng.permutation(size)
        for start in range(0, size - batch_size + 1, batch_size):
            idx = order[start : start + batch_size]
            yield {
                k: v[idx]
                for k, v in dataset.items()
                if k != "potential_energy"
            }

    def train_batches(self):
        return self._iterate(self.train_dataset, self.params.train_batch_size, self._rng)

    def valid_batches(self):
        return self._iterate(self.valid_dataset, self.params.valid_batch_size)

    @property
    def validation_reference_energies(self) -> np.ndarray:
        """Ground-truth potential energies of the validation set (KS reference)."""
        return self.valid_dataset["potential_energy"]
