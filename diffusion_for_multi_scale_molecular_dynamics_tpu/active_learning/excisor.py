"""Environment excisors: carve the atomic neighborhood around uncertain atoms.

(reference: active_learning_loop/excisor/{base_excisor,spherical_excisor,
nearest_neighbors_excisor,no_op_excisor,excisor_factory}.py)
"""

from abc import ABC, abstractmethod
from dataclasses import dataclass
from typing import Any, Dict, List, Tuple

import numpy as np

from ..namespace import AXL
from .structure import get_distances_from_reference_point


@dataclass(kw_only=True)
class BaseEnvironmentExcisionArguments:
    """Configuration of an excisor."""

    algorithm: str


class BaseEnvironmentExcision(ABC):
    """Extracts sub-environments around central atoms."""

    def __init__(self, excision_arguments: BaseEnvironmentExcisionArguments):
        self.arguments = excision_arguments

    def excise_environments(
        self, structure: AXL, central_atoms_indices: np.ndarray, center_atoms: bool = True
    ) -> Tuple[List[AXL], List[int]]:
        """Excise one environment per central atom (optionally box-centered)."""
        environments, central_indices = [], []
        for atom_index in central_atoms_indices:
            environment, new_index = self._excise_one_environment(
                structure, int(atom_index)
            )
            if center_atoms:
                environment = self.center_structure(environment, new_index)
            environments.append(environment)
            central_indices.append(new_index)
        return environments, central_indices

    @staticmethod
    def center_structure(structure: AXL, atom_index: int) -> AXL:
        """Translate so the central atom sits at the middle of the box."""
        translation = 0.5 - structure.X[atom_index]
        return structure._replace(X=np.mod(structure.X + translation, 1.0))

    @abstractmethod
    def _excise_one_environment(
        self, structure: AXL, central_atom_idx: int
    ) -> Tuple[AXL, int]:
        """Return (substructure, index of the central atom inside it)."""


def _slice_sorted_by_distance(structure: AXL, indices, distances):
    order = np.argsort(distances[indices])
    sorted_indices = np.asarray(indices)[order]
    substructure = AXL(
        A=np.asarray(structure.A)[sorted_indices],
        X=np.asarray(structure.X)[sorted_indices],
        L=structure.L,
    )
    # Sorted by distance => the central atom (distance 0) lands at slot 0.
    return substructure, 0


@dataclass(kw_only=True)
class SphericalExcisionArguments(BaseEnvironmentExcisionArguments):
    algorithm: str = "spherical_cutoff"
    radial_cutoff: float = 3.0

    def __post_init__(self):
        assert self.radial_cutoff > 0, "the radial cutoff must be positive"


class SphericalExcision(BaseEnvironmentExcision):
    """All atoms within a radial cutoff of the central atom."""

    def _excise_one_environment(self, structure, central_atom_idx):
        distances = get_distances_from_reference_point(
            np.asarray(structure.X), np.asarray(structure.X)[central_atom_idx], structure.L
        )
        within = np.where(distances < self.arguments.radial_cutoff)[0]
        return _slice_sorted_by_distance(structure, within, distances)


@dataclass(kw_only=True)
class NearestNeighborsExcisionArguments(BaseEnvironmentExcisionArguments):
    algorithm: str = "nearest_neighbors"
    number_of_neighbors: int = 8

    def __post_init__(self):
        assert self.number_of_neighbors > 0


class NearestNeighborsExcision(BaseEnvironmentExcision):
    """The central atom plus its k nearest neighbors."""

    def _excise_one_environment(self, structure, central_atom_idx):
        distances = get_distances_from_reference_point(
            np.asarray(structure.X), np.asarray(structure.X)[central_atom_idx], structure.L
        )
        k = min(self.arguments.number_of_neighbors + 1, len(distances))
        nearest = np.argsort(distances)[:k]
        return _slice_sorted_by_distance(structure, nearest, distances)


@dataclass(kw_only=True)
class NoOpExcisionArguments(BaseEnvironmentExcisionArguments):
    algorithm: str = "noop"


class NoOpExcision(BaseEnvironmentExcision):
    """Keep the whole structure (the 'excision' is the identity)."""

    def _excise_one_environment(self, structure, central_atom_idx):
        return (
            AXL(
                A=np.asarray(structure.A),
                X=np.asarray(structure.X),
                L=structure.L,
            ),
            central_atom_idx,
        )


_EXCISOR_ARGUMENTS = {
    "spherical_cutoff": SphericalExcisionArguments,
    "nearest_neighbors": NearestNeighborsExcisionArguments,
    "noop": NoOpExcisionArguments,
}
_EXCISORS = {
    "spherical_cutoff": SphericalExcision,
    "nearest_neighbors": NearestNeighborsExcision,
    "noop": NoOpExcision,
}


def create_excisor_arguments(config: Dict[str, Any]) -> BaseEnvironmentExcisionArguments:
    cfg = dict(config)
    algorithm = cfg.pop("algorithm")
    assert algorithm in _EXCISOR_ARGUMENTS, f"unknown excisor '{algorithm}'"
    return _EXCISOR_ARGUMENTS[algorithm](**cfg)


def create_excisor(arguments: BaseEnvironmentExcisionArguments) -> BaseEnvironmentExcision:
    return _EXCISORS[arguments.algorithm](arguments)
