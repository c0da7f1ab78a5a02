"""Trajectory initializers: where the reverse diffusion starts.

(reference: src/diffusion_for_multi_scale_molecular_dynamics/generators/trajectory_initializer.py:16-214)

Starting-configuration files are .npz/.pt-free: a plain pickle of a dict with
the noisy AXL arrays and the start index, written by
``write_starting_configuration``.
"""

import pickle
from abc import ABC, abstractmethod
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..namespace import AXL, NOISY_AXL_COMPOSITION
from ..ops.geometry import get_number_of_lattice_parameters

START_TIME_STEP_INDEX = "start_time_step_index"


@dataclass(kw_only=True)
class TrajectoryInitializerParameters:
    """Configuration of the trajectory initializer."""

    spatial_dimension: int = 3
    num_atom_types: int
    number_of_atoms: int
    use_fixed_lattice_parameters: bool = False
    fixed_lattice_parameters: Optional[np.ndarray] = None
    # Diffusing-lattice prior: L ~ N(prior_mean, prior_std) instead of the
    # reference's N(0, 1) (see SamplingParameters for the rationale).
    lattice_parameters_prior_mean: Optional[np.ndarray] = None
    lattice_parameters_prior_std: float = 1.0
    # Path to a starting-configuration pickle for partial denoising.
    path_to_starting_configuration_data_pickle: Optional[str] = None


class TrajectoryInitializer(ABC):
    """Base initializer: initial composition + start/end time indices."""

    def __init__(self, params: TrajectoryInitializerParameters):
        self.params = params
        self.masked_atom_type_index = params.num_atom_types  # MASK is last
        self.num_lattice_parameters = get_number_of_lattice_parameters(
            params.spatial_dimension
        )

    @abstractmethod
    def initialize(self, key, number_of_samples: int) -> AXL:
        """Build the initial composition."""

    @abstractmethod
    def create_start_time_step_index(self, number_of_discretization_steps: int) -> int:
        """One-based index where the reverse trajectory starts."""

    def create_end_time_step_index(self) -> int:
        return 0


class FullRandomTrajectoryInitializer(TrajectoryInitializer):
    """A = all MASK, X ~ U(0,1), L ~ N(0,1) (or the fixed cell)."""

    def initialize(self, key, number_of_samples: int) -> AXL:
        p = self.params
        key_x, key_l = jax.random.split(key)
        atom_types = jnp.full(
            (number_of_samples, p.number_of_atoms),
            self.masked_atom_type_index,
            dtype=jnp.int32,
        )
        x = jax.random.uniform(
            key_x, (number_of_samples, p.number_of_atoms, p.spatial_dimension)
        )
        if p.use_fixed_lattice_parameters:
            lattice = jnp.broadcast_to(
                jnp.asarray(p.fixed_lattice_parameters, dtype=x.dtype),
                (number_of_samples, self.num_lattice_parameters),
            )
        else:
            z = jax.random.normal(
                key_l, (number_of_samples, self.num_lattice_parameters), x.dtype
            )
            if p.lattice_parameters_prior_mean is not None:
                mean = jnp.asarray(
                    p.lattice_parameters_prior_mean, dtype=x.dtype
                )
                lattice = mean[None] + p.lattice_parameters_prior_std * z
            else:
                lattice = z  # reference parity: N(0, 1)
        return AXL(A=atom_types, X=x, L=lattice)

    def create_start_time_step_index(self, number_of_discretization_steps: int) -> int:
        return number_of_discretization_steps


class StartFromGivenConfigurationTrajectoryInitializer(TrajectoryInitializer):
    """Resume the reverse trajectory from a recorded noisy composition."""

    def __init__(self, params: TrajectoryInitializerParameters):
        super().__init__(params)
        assert params.path_to_starting_configuration_data_pickle is not None
        with open(params.path_to_starting_configuration_data_pickle, "rb") as fh:
            data = pickle.load(fh)
        self._start_index = int(data[START_TIME_STEP_INDEX])
        composition = data[NOISY_AXL_COMPOSITION]
        self._composition = AXL(
            A=jnp.asarray(composition.A, dtype=jnp.int32),
            X=jnp.asarray(composition.X, dtype=jnp.float32),
            L=jnp.asarray(composition.L, dtype=jnp.float32),
        )

    def initialize(self, key, number_of_samples: int) -> AXL:
        assert self._composition.X.shape[0] == number_of_samples, (
            f"the starting configuration holds {self._composition.X.shape[0]} "
            f"samples, but {number_of_samples} were requested"
        )
        return self._composition

    def create_start_time_step_index(self, number_of_discretization_steps: int) -> int:
        return self._start_index


def write_starting_configuration(
    path: str, composition: AXL, start_time_step_index: int
) -> None:
    """Persist a noisy composition for later partial denoising."""
    data = {
        NOISY_AXL_COMPOSITION: AXL(
            A=np.asarray(composition.A),
            X=np.asarray(composition.X),
            L=np.asarray(composition.L),
        ),
        START_TIME_STEP_INDEX: int(start_time_step_index),
    }
    with open(path, "wb") as fh:
        pickle.dump(data, fh)


def instantiate_trajectory_initializer(
    sampling_parameters,
    path_to_starting_configuration_data_pickle: Optional[str] = None,
) -> TrajectoryInitializer:
    """Build the initializer matching the sampling parameters."""
    params = TrajectoryInitializerParameters(
        spatial_dimension=sampling_parameters.spatial_dimension,
        num_atom_types=sampling_parameters.num_atom_types,
        number_of_atoms=sampling_parameters.number_of_atoms,
        use_fixed_lattice_parameters=sampling_parameters.use_fixed_lattice_parameters,
        fixed_lattice_parameters=sampling_parameters.fixed_lattice_parameters,
        lattice_parameters_prior_mean=getattr(
            sampling_parameters, "lattice_parameters_prior_mean", None
        ),
        lattice_parameters_prior_std=getattr(
            sampling_parameters, "lattice_parameters_prior_std", 1.0
        ),
        path_to_starting_configuration_data_pickle=(
            path_to_starting_configuration_data_pickle
        ),
    )
    if path_to_starting_configuration_data_pickle is not None:
        return StartFromGivenConfigurationTrajectoryInitializer(params)
    return FullRandomTrajectoryInitializer(params)
