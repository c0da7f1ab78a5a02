"""Lightweight crystal structure container and AXL conversion.

The reference leans on pymatgen.core.Structure for host-side bookkeeping;
this framework uses a minimal numpy container with exactly the operations the
active-learning loop needs (species, fractional/cartesian coordinates,
periodic distances, site properties) plus the AXL <-> structure converter
(reference: active_learning_loop/sample_maker/structure_converter.py:17).
"""

from dataclasses import dataclass, field
from typing import Any, Dict, List

import numpy as np

from ..namespace import AXL
from ..ops.geometry import get_number_of_lattice_parameters


@dataclass
class Structure:
    """Periodic crystal: species names, fractional coordinates, row-vector cell."""

    species: List[str]
    frac_coords: np.ndarray  # [n, d]
    cell: np.ndarray  # [d, d]
    site_properties: Dict[str, np.ndarray] = field(default_factory=dict)

    def __post_init__(self):
        self.frac_coords = np.asarray(self.frac_coords, dtype=np.float64)
        self.cell = np.asarray(self.cell, dtype=np.float64)
        assert len(self.species) == len(self.frac_coords)

    def __len__(self) -> int:
        return len(self.species)

    @property
    def cart_coords(self) -> np.ndarray:
        return self.frac_coords @ self.cell

    @property
    def lattice_lengths(self) -> np.ndarray:
        return np.linalg.norm(self.cell, axis=1)

    def add_site_property(self, name: str, values) -> None:
        values = np.asarray(values)
        assert len(values) == len(self), "one value per site is required"
        self.site_properties[name] = values

    def copy(self) -> "Structure":
        return Structure(
            species=list(self.species),
            frac_coords=self.frac_coords.copy(),
            cell=self.cell.copy(),
            site_properties={k: v.copy() for k, v in self.site_properties.items()},
        )


def get_distances_from_reference_point(
    relative_coordinates: np.ndarray,
    reference_point: np.ndarray,
    lattice_parameters: np.ndarray,
) -> np.ndarray:
    """Minimum-image distances from one reference point (orthogonal cells).

    (reference: active_learning_loop/utils.py)
    """
    d = relative_coordinates.shape[-1]
    lengths = np.asarray(lattice_parameters)[:d]
    delta = np.mod(relative_coordinates - reference_point, 1.0)
    delta = np.where(delta > 0.5, delta - 1.0, delta)
    return np.linalg.norm(delta * lengths, axis=-1)


class StructureConverter:
    """AXL (integer types) <-> Structure (species names)."""

    def __init__(self, list_of_element_symbols: List[str]):
        self.elements = list(list_of_element_symbols)

    def convert_axl_to_structure(self, axl: AXL) -> Structure:
        d = axl.X.shape[-1]
        lengths = np.asarray(axl.L)[:d]
        species = [self.elements[int(a)] for a in np.asarray(axl.A)]
        return Structure(
            species=species,
            frac_coords=np.asarray(axl.X),
            cell=np.diag(lengths),
        )

    def convert_structure_to_axl(self, structure: Structure) -> AXL:
        d = structure.cell.shape[0]
        n_lattice = get_number_of_lattice_parameters(d)
        lattice = np.zeros(n_lattice)
        lattice[:d] = np.diag(structure.cell)
        atom_types = np.array(
            [self.elements.index(s) for s in structure.species], dtype=np.int64
        )
        return AXL(A=atom_types, X=np.asarray(structure.frac_coords), L=lattice)
