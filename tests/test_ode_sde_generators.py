"""ODE and SDE generator tests with the analytical score network.

With an exact score, both samplers must pull random coordinates toward the
equilibrium positions (narrow data distribution => recognizable modes).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_for_multi_scale_molecular_dynamics_tpu.generators import (
    ExplodingVarianceODEAXLGenerator,
    ExplodingVarianceSDEPositionGenerator,
    ODESamplingParameters,
    SDESamplingParameters,
    instantiate_generator,
    load_sampling_parameters,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.models import (
    AnalyticalScoreNetwork,
    AnalyticalScoreNetworkConfig,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.noise_schedulers import (
    NoiseParameters,
)

NATOMS, D = 2, 3
EQUILIBRIUM = [[0.25, 0.25, 0.25], [0.75, 0.75, 0.75]]


@pytest.fixture(scope="module")
def analytical_network():
    config = AnalyticalScoreNetworkConfig(
        num_atom_types=1,
        number_of_atoms=NATOMS,
        kmax=4,
        equilibrium_relative_coordinates=EQUILIBRIUM,
        sigma_d=0.01,
        use_permutation_invariance=True,
    )
    network = AnalyticalScoreNetwork(config)
    return lambda batch: network.apply({}, batch, False)


def _distance_to_equilibrium(x):
    """Min over permuted equilibrium images of the max atom displacement."""
    eq = np.asarray(EQUILIBRIUM)
    best = np.inf
    for perm in ([0, 1], [1, 0]):
        delta = np.mod(x - eq[perm], 1.0)
        delta = np.where(delta > 0.5, delta - 1.0, delta)
        best = min(best, np.abs(delta).max())
    return best


def make_params(cls, **kwargs):
    defaults = dict(
        num_atom_types=1,
        number_of_atoms=NATOMS,
        number_of_samples=4,
        use_fixed_lattice_parameters=True,
        cell_dimensions=[1.0, 1.0, 1.0],
    )
    defaults.update(kwargs)
    return cls(**defaults)


def test_ode_generator_denoises_to_equilibrium(analytical_network, rng_key):
    noise = NoiseParameters(total_time_steps=20, sigma_min=0.001, sigma_max=0.5)
    generator = ExplodingVarianceODEAXLGenerator(
        noise, make_params(ODESamplingParameters), analytical_network
    )
    samples = generator.sample(rng_key, 4)
    x = np.asarray(samples.X)
    assert ((x >= 0) & (x < 1)).all()
    for sample in x:
        assert _distance_to_equilibrium(sample) < 0.05


def test_sde_generator_denoises_to_equilibrium(analytical_network, rng_key):
    noise = NoiseParameters(total_time_steps=200, sigma_min=0.001, sigma_max=0.5)
    generator = ExplodingVarianceSDEPositionGenerator(
        noise, make_params(SDESamplingParameters), analytical_network
    )
    samples = generator.sample(rng_key, 4)
    x = np.asarray(samples.X)
    assert ((x >= 0) & (x < 1)).all()
    for sample in x:
        assert _distance_to_equilibrium(sample) < 0.1


def test_generator_factory_dispatch(analytical_network):
    noise = NoiseParameters(total_time_steps=5)
    for algorithm, expected in [
        ("ode", ExplodingVarianceODEAXLGenerator),
        ("sde", ExplodingVarianceSDEPositionGenerator),
    ]:
        params = load_sampling_parameters(
            dict(
                algorithm=algorithm,
                num_atom_types=1,
                number_of_atoms=NATOMS,
                number_of_samples=2,
                use_fixed_lattice_parameters=True,
                cell_dimensions=[1.0, 1.0, 1.0],
            )
        )
        generator = instantiate_generator(params, noise, analytical_network)
        assert isinstance(generator, expected)
