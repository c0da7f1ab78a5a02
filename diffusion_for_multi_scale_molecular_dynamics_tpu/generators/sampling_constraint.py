"""Sampling constraints for RePaint-style inpainting.

(reference: src/diffusion_for_multi_scale_molecular_dynamics/generators/sampling_constraint.py:9-97;
serialization is a plain pickle of the field dict instead of torch.save)
"""

import dataclasses
import pickle
from dataclasses import dataclass
from typing import List, Optional

import numpy as np


@dataclass
class SamplingConstraint:
    """Constrained atoms for inpainting: coordinates, types and (optionally) slots."""

    elements: List[str]
    constrained_relative_coordinates: np.ndarray  # [n_constraints, d] float
    constrained_atom_types: np.ndarray  # [n_constraints] int
    constrained_indices: Optional[np.ndarray] = None  # [n_constraints] int

    def __post_init__(self):
        self.constrained_relative_coordinates = np.asarray(
            self.constrained_relative_coordinates, dtype=np.float32
        )
        self.constrained_atom_types = np.asarray(
            self.constrained_atom_types, dtype=np.int32
        )
        assert self.constrained_relative_coordinates.ndim == 2, (
            "constrained_relative_coordinates must be [n_constraints, d]"
        )
        assert self.constrained_atom_types.ndim == 1, (
            "constrained_atom_types must be one-dimensional"
        )
        assert (
            self.constrained_relative_coordinates.shape[0]
            == self.constrained_atom_types.shape[0]
        ), "The number of constrained atoms should match"
        number_of_atom_types = len(self.elements)
        assert (
            (self.constrained_atom_types >= 0)
            & (self.constrained_atom_types < number_of_atom_types)
        ).all(), "constrained atom types inconsistent with the elements list"
        if self.constrained_indices is not None:
            self.constrained_indices = np.asarray(
                self.constrained_indices, dtype=np.int32
            )
            assert self.constrained_indices.ndim == 1
            assert (
                self.constrained_indices.shape[0]
                == self.constrained_atom_types.shape[0]
            ), "The number of constrained atoms should match"


def write_sampling_constraint(sampling_constraint: SamplingConstraint, path) -> None:
    """Serialize a constraint as a dict pickle (robust to code changes)."""
    with open(path, "wb") as fh:
        pickle.dump(dataclasses.asdict(sampling_constraint), fh)


def read_sampling_constraint(path) -> SamplingConstraint:
    with open(path, "rb") as fh:
        data = pickle.load(fh)
    return SamplingConstraint(**data)
