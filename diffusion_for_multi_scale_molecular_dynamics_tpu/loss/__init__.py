"""Per-modality loss calculators (MSE, weighted MSE, D3PM) and their factory."""

from .loss_parameters import (
    AtomTypeLossParameters,
    LossParameters,
    MSELossParameters,
    WeightedMSELossParameters,
    create_loss_parameters,
)
from .loss_calculators import (
    calculate_atom_types_loss,
    calculate_coordinates_loss,
    calculate_lattice_loss,
    create_loss_calculator,
)

__all__ = [
    "LossParameters",
    "MSELossParameters",
    "WeightedMSELossParameters",
    "AtomTypeLossParameters",
    "create_loss_parameters",
    "calculate_coordinates_loss",
    "calculate_lattice_loss",
    "calculate_atom_types_loss",
    "create_loss_calculator",
]
