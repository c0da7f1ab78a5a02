"""Shared data-module hyperparameters.

(reference: src/diffusion_for_multi_scale_molecular_dynamics/data/diffusion/data_module_parameters.py:7)
"""

from dataclasses import dataclass, field
from typing import List, Optional


@dataclass(kw_only=True)
class DataModuleParameters:
    """Base hyperparameters for data modules."""

    data_source: Optional[str] = None
    batch_size: Optional[int] = None
    train_batch_size: Optional[int] = None
    valid_batch_size: Optional[int] = None
    num_workers: int = 0
    max_atom: int = 64
    spatial_dimension: int = 3
    use_fixed_lattice_parameters: bool = False
    elements: List[str] = field(default_factory=list)

    def __post_init__(self):
        assert self.elements, "elements are mandatory"
        both = self.batch_size and (self.train_batch_size or self.valid_batch_size)
        neither = not self.batch_size and not (
            self.train_batch_size and self.valid_batch_size
        )
        assert not both, "specify batch_size XOR train/valid batch sizes"
        assert not neither, "a batch size must be specified"
        if self.batch_size:
            self.train_batch_size = self.batch_size
            self.valid_batch_size = self.batch_size
