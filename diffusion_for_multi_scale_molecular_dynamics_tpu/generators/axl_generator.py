"""Generator interface and shared sampling hyperparameters.

(reference: src/diffusion_for_multi_scale_molecular_dynamics/generators/axl_generator.py:13-95)
"""

import warnings
from abc import ABC, abstractmethod
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from ..namespace import AXL
from ..ops.geometry import get_number_of_lattice_parameters


@dataclass(kw_only=True)
class SamplingParameters:
    """Hyperparameters common to all AXL generators."""

    algorithm: str
    spatial_dimension: int = 3
    num_atom_types: int
    number_of_atoms: int
    number_of_samples: int
    # Generate in chunks of this size (defaults to number_of_samples).
    sample_batchsize: Optional[int] = None

    use_fixed_lattice_parameters: bool = False
    cell_dimensions: Optional[List[float]] = None
    # Lattice prior for *diffusing*-lattice sampling (beyond-reference).
    # The reference initializes L ~ N(0, 1) (trajectory_initializer.py:115)
    # — but the VE forward process never moves L more than ~sigma_max/n^(1/d)
    # from the data, so a standard-normal start is far outside anything the
    # score network ever saw and the L-updates explode (round-4 lattice run:
    # NaN lattices). With a prior mean (e.g. the data's cell) the start is
    # the VE terminal marginal mean + prior_std * z. None keeps reference
    # behaviour.
    lattice_parameters_prior_mean: Optional[List[float]] = None
    lattice_parameters_prior_std: float = 1.0
    # Scale the lattice predictor/corrector step sizes to the lattice noise
    # process (beyond-reference; default on). The forward L process uses
    # sigma_n = sigma / n^(1/d), but the reference's reverse updates reuse
    # the *coordinate* increments g^2, g and tabulated eps unscaled
    # (reference langevin_generator.py:631-640 — two TODOs admit this is
    # untested). That makes the L updates linearly unstable: the predictor
    # drift overshoots by n^(2/d) and the corrector eps is ~5 n^(2/d)/8
    # times the sigma_n^2 stability bound — the round-4 NaN-lattice failure.
    # True scales the predictor weights by (sigma_n/sigma)^2 = n^(-2/d)
    # (noise by n^(-1/d)) and the tabulated corrector eps likewise; False
    # reproduces reference behaviour exactly.
    lattice_consistent_step_scaling: bool = True

    record_samples: bool = False
    record_samples_corrector_steps: bool = False
    record_atom_type_update: bool = False

    def __post_init__(self):
        if self.use_fixed_lattice_parameters:
            assert self.cell_dimensions is not None, (
                "use_fixed_lattice_parameters requires cell_dimensions."
            )
            cell = np.asarray(self.cell_dimensions, dtype=np.float32)
            if cell.ndim == 1:
                cell = np.diag(cell)
            assert cell.shape == (self.spatial_dimension, self.spatial_dimension), (
                "cell_dimensions must define a [d, d] cell."
            )
            n_params = get_number_of_lattice_parameters(self.spatial_dimension)
            lattice_parameters = np.zeros(n_params, dtype=np.float32)
            lattice_parameters[: self.spatial_dimension] = np.diag(cell)
            self.fixed_lattice_parameters = lattice_parameters
        else:
            warnings.warn(
                "Using diffusion on lattice parameters. This is experimental "
                "and not fully tested."
            )
            self.fixed_lattice_parameters = None

    @property
    def num_classes(self) -> int:
        return self.num_atom_types + 1


class AXLGenerator(ABC):
    """Interface for AXL generators (explicit-PRNG)."""

    @abstractmethod
    def sample(self, key, number_of_samples: int) -> AXL:
        """Draw configuration samples."""

    @abstractmethod
    def initialize(self, key, number_of_samples: int) -> AXL:
        """Initialize samples from the fully-noised distribution."""


def split_bound_network(axl_network):
    """Extract (apply_fn, params) from a partial-bound score network.

    Compiled sampling programs must take the network parameters as traced
    *arguments*: a ``functools.partial(net.apply, params)`` closure bakes
    every weight into the HLO as a literal constant (tens of MB of program
    text for production networks), and client-side lowering of that program
    costs minutes per variant. Returns (None, None) when the callable is not
    a recognizable single-positional-arg partial (closure fallback).
    """
    import functools

    if (
        isinstance(axl_network, functools.partial)
        and len(axl_network.args) == 1
        and not axl_network.keywords
    ):
        return axl_network.func, axl_network.args[0]
    return None, None
