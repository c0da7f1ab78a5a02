from .active_learning import ActiveLearning
from .structure import Structure, StructureConverter

__all__ = ["ActiveLearning", "Structure", "StructureConverter"]
