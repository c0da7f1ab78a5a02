r"""Probability-flow ODE generator (deterministic, relative coordinates only).

The exploding-variance probability-flow ODE is

    dx/dt = -1/2 g(t)^2 Score = -(d sigma/dt) * (sigma * Score),

integrated from t = 1 down to t = time_delta. Atom types and lattice
parameters are held fixed at their initialization (matching the reference's
X-only ODE sampler, generators/ode_position_generator.py:43-320).

TPU-first: the reference drives torchode's Dopri5; here the trajectory is
integrated with jax.experimental.ode.odeint (adaptive Dopri5 under jit) after
the time reparameterization s = 1 - t so time increases. One compiled solve
per batch.
"""

import logging
from dataclasses import dataclass
from typing import Optional

import functools

import jax
import jax.numpy as jnp
from jax.experimental.ode import odeint

from ..namespace import AXL, CARTESIAN_FORCES, NOISE, NOISY_AXL_COMPOSITION, TIME
from ..noise_schedulers import NoiseParameters
from ..noise_schedulers.sigma_calculator import get_sigma_functions
from ..ops.geometry import map_relative_coordinates_to_unit_cell
from ..utils.sample_trajectory import SampleTrajectory
from .axl_generator import AXLGenerator, SamplingParameters
from .trajectory_initializer import (
    FullRandomTrajectoryInitializer,
    TrajectoryInitializerParameters,
)

logger = logging.getLogger(__name__)


@dataclass(kw_only=True)
class ODESamplingParameters(SamplingParameters):
    """Hyperparameters of the ODE sampler."""

    algorithm: str = "ode"
    absolute_solver_tolerance: float = 1.0e-3
    relative_solver_tolerance: float = 1.0e-2


class ExplodingVarianceODEAXLGenerator(AXLGenerator):
    """Deterministic sampler via the probability-flow ODE."""

    def __init__(
        self,
        noise_parameters: NoiseParameters,
        sampling_parameters: ODESamplingParameters,
        axl_network,
        trajectory_initializer=None,
    ):
        self.noise_parameters = noise_parameters
        self.sampling_parameters = sampling_parameters
        self.axl_network = axl_network
        self.t0 = noise_parameters.time_delta
        self.tf = 1.0

        self._sigma_fn, self._sigma_dot_fn, _ = get_sigma_functions(
            noise_parameters.schedule_type,
            noise_parameters.sigma_min,
            noise_parameters.sigma_max,
        )

        if trajectory_initializer is None:
            trajectory_initializer = FullRandomTrajectoryInitializer(
                TrajectoryInitializerParameters(
                    spatial_dimension=sampling_parameters.spatial_dimension,
                    num_atom_types=sampling_parameters.num_atom_types,
                    number_of_atoms=sampling_parameters.number_of_atoms,
                    use_fixed_lattice_parameters=(
                        sampling_parameters.use_fixed_lattice_parameters
                    ),
                    fixed_lattice_parameters=(
                        sampling_parameters.fixed_lattice_parameters
                    ),
                )
            )
        self.trajectory_initializer = trajectory_initializer
        self.record = sampling_parameters.record_samples
        self.sample_trajectory_recorder = SampleTrajectory()
        from .axl_generator import split_bound_network

        self._apply_fn, self._network_params = split_bound_network(axl_network)
        self._compiled_sample = jax.jit(self._sample_impl, static_argnums=(1,))
        self._compiled_sample_with_params = jax.jit(
            self._sample_with_params, static_argnums=(2,)
        )

    def initialize(self, key, number_of_samples: int) -> AXL:
        return self.trajectory_initializer.initialize(key, number_of_samples)

    def _score_fn(self, x, diffusion_time, atom_types, lattice_parameters):
        """sigma-normalized X score at a scalar diffusion time."""
        batch_size = x.shape[0]
        sigma = self._sigma_fn(diffusion_time)
        ones = jnp.ones((batch_size, 1), x.dtype)
        batch = {
            NOISY_AXL_COMPOSITION: AXL(
                A=atom_types,
                X=map_relative_coordinates_to_unit_cell(x),
                L=lattice_parameters,
            ),
            NOISE: sigma * ones,
            TIME: diffusion_time * ones,
            CARTESIAN_FORCES: jnp.zeros_like(x),
        }
        return self.axl_network(batch).X

    def _sample_impl(self, key, number_of_samples: int):
        composition = self.initialize(key, number_of_samples)
        composition = composition._replace(
            X=map_relative_coordinates_to_unit_cell(composition.X)
        )

        def flow(x, s):
            # s = 1 - t  =>  dx/ds = + (d sigma/dt)(t) * (sigma * Score).
            t = self.tf - s
            score = self._score_fn(x, t, composition.A, composition.L)
            return self._sigma_dot_fn(t) * score

        s_grid = jnp.linspace(
            0.0, self.tf - self.t0, self.noise_parameters.total_time_steps
        )
        trajectory = odeint(
            flow,
            composition.X,
            s_grid,
            rtol=self.sampling_parameters.relative_solver_tolerance,
            atol=self.sampling_parameters.absolute_solver_tolerance,
        )
        final_x = map_relative_coordinates_to_unit_cell(trajectory[-1])
        return composition._replace(X=final_x), trajectory

    def _sample_with_params(self, params, key, number_of_samples: int):
        """_sample_impl with network parameters as a traced argument (keeps
        the weights out of the compiled HLO; see split_bound_network)."""
        previous = self.axl_network
        self.axl_network = functools.partial(self._apply_fn, params)
        try:
            return self._sample_impl(key, number_of_samples)
        finally:
            self.axl_network = previous

    def sample(self, key, number_of_samples: int) -> AXL:
        if self._apply_fn is not None:
            composition, trajectory = self._compiled_sample_with_params(
                self._network_params, key, number_of_samples
            )
        else:
            composition, trajectory = self._compiled_sample(
                key, number_of_samples
            )
        if self.record:
            self.sample_trajectory_recorder.record(
                "ode_trajectory", dict(relative_coordinates=trajectory)
            )
        return composition
