"""Active-learning campaign loop: selectors, excisors, sample makers, FLARE/ARTn drivers."""

from .active_learning import ActiveLearning
from .structure import Structure, StructureConverter

__all__ = ["ActiveLearning", "Structure", "StructureConverter"]
