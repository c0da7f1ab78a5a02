r"""Reverse-SDE generator (stochastic, relative coordinates only).

The reverse-time SDE of the exploding-variance process, written in the
forward SDE time s = 1 - t, is

    dx = [g(t)^2 / sigma(t)] (sigma * Score) ds + g(t) dW,

integrated with Euler-Maruyama over total_time_steps equal steps. Atom types
and lattice parameters are held fixed at initialization, matching the
reference's X-only SDE sampler
(generators/sde_position_generator.py:44-403, default method="euler").

TPU-first: the reference calls torchsde.sdeint from the host; here the whole
Euler-Maruyama trajectory is one lax.scan inside jit.
"""

import logging
from dataclasses import dataclass

import functools

import jax
import jax.numpy as jnp

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
class SDESamplingParameters(SamplingParameters):
    """Hyperparameters of the SDE sampler."""

    algorithm: str = "sde"
    sde_type: str = "ito"
    method: str = "euler"
    adaptive: bool = False
    absolute_solver_tolerance: float = 1.0e-7
    relative_solver_tolerance: float = 1.0e-5


class ExplodingVarianceSDEPositionGenerator(AXLGenerator):
    """Stochastic sampler via the reverse SDE (Euler-Maruyama scan)."""

    def __init__(
        self,
        noise_parameters: NoiseParameters,
        sampling_parameters: SDESamplingParameters,
        axl_network,
        trajectory_initializer=None,
    ):
        assert sampling_parameters.method == "euler", (
            "Only the Euler-Maruyama method is implemented."
        )
        self.noise_parameters = noise_parameters
        self.sampling_parameters = sampling_parameters
        self.axl_network = axl_network
        self.t0 = noise_parameters.time_delta
        self.tf = 1.0

        self._sigma_fn, _, self._g_squared_fn = get_sigma_functions(
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
        key_init, key_scan = jax.random.split(key)
        composition = self.initialize(key_init, number_of_samples)
        composition = composition._replace(
            X=map_relative_coordinates_to_unit_cell(composition.X)
        )

        n_steps = self.noise_parameters.total_time_steps
        ds = (self.tf - self.t0) / n_steps
        s_grid = jnp.linspace(0.0, self.tf - self.t0, n_steps, endpoint=False)

        def body(carry, s):
            x, key = carry
            key, noise_key = jax.random.split(key)
            t = self.tf - s
            g_squared = self._g_squared_fn(t)
            sigma = self._sigma_fn(t)
            score = self._score_fn(x, t, composition.A, composition.L)
            drift = g_squared / sigma * score
            dw = jnp.sqrt(ds) * jax.random.normal(noise_key, x.shape, x.dtype)
            x_next = x + drift * ds + jnp.sqrt(g_squared) * dw
            return (x_next, key), x_next

        (x_final, _), trajectory = jax.lax.scan(
            body, (composition.X, key_scan), s_grid
        )
        final_x = map_relative_coordinates_to_unit_cell(x_final)
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
                "sde_trajectory", dict(relative_coordinates=trajectory)
            )
        return composition
