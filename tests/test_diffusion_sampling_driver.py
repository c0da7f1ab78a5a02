"""Unit tests for the batch sampling driver (sampling/diffusion_sampling.py).

Translation of the reference's tests/sampling/test_diffusion_sampling.py:
chunked generation must concatenate all requested samples in order and
produce cartesian positions consistent with the (clipped) sampled cells.
"""

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from diffusion_for_multi_scale_molecular_dynamics_tpu.namespace import (
    AXL,
    AXL_COMPOSITION,
    CARTESIAN_POSITIONS,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.ops.geometry import (
    map_noisy_lattice_parameters_to_unit_cell_vectors,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.sampling.diffusion_sampling import (
    create_batch_of_samples,
)

NUMBER_OF_SAMPLES, NATOMS, D = 16, 8, 3


class DummyGenerator:
    """Hands out pre-drawn samples in order, like the reference's dummy."""

    def __init__(self, relative_coordinates, lattice_parameters):
        self._x = relative_coordinates
        self._l = lattice_parameters
        self.calls = []

    def sample(self, key, number_of_samples):
        start = sum(self.calls)
        self.calls.append(number_of_samples)
        x = self._x[start:start + number_of_samples]
        lattice = self._l[start:start + number_of_samples]
        return AXL(
            A=jnp.zeros(x.shape[:2], dtype=jnp.int32),
            X=jnp.asarray(x),
            L=jnp.asarray(lattice),
        )


@dataclass
class FakeSamplingParameters:
    number_of_samples: int = NUMBER_OF_SAMPLES
    sample_batchsize: int = 4


def make_generator(seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 1, (NUMBER_OF_SAMPLES, NATOMS, D)).astype(np.float32)
    lattice = np.concatenate(
        [rng.uniform(5, 8, (NUMBER_OF_SAMPLES, D)), np.zeros((NUMBER_OF_SAMPLES, D))],
        axis=-1,
    ).astype(np.float32)
    return DummyGenerator(x, lattice), x, lattice


def test_chunked_generation_concatenates_in_order():
    generator, x, lattice = make_generator()
    batch = create_batch_of_samples(
        generator, FakeSamplingParameters(), jax.random.PRNGKey(0)
    )
    assert generator.calls == [4, 4, 4, 4]
    np.testing.assert_allclose(
        np.asarray(batch[AXL_COMPOSITION].X), x, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(batch[AXL_COMPOSITION].L), lattice, atol=1e-7
    )


def test_ragged_final_chunk():
    generator, _, _ = make_generator()
    params = FakeSamplingParameters(number_of_samples=10, sample_batchsize=4)
    batch = create_batch_of_samples(generator, params, jax.random.PRNGKey(0))
    assert generator.calls == [4, 4, 2]
    assert batch[AXL_COMPOSITION].X.shape[0] == 10


def test_cartesian_positions_match_cells():
    """positions = X @ cell for each sample's own (clipped) cell
    (reference test_diffusion_sampling.py's consistency assertion)."""
    generator, x, lattice = make_generator()
    batch = create_batch_of_samples(
        generator, FakeSamplingParameters(), jax.random.PRNGKey(0)
    )
    cells = np.asarray(
        map_noisy_lattice_parameters_to_unit_cell_vectors(jnp.asarray(lattice))
    )
    expected = np.einsum("bni,bij->bnj", x, cells)
    np.testing.assert_allclose(
        np.asarray(batch[CARTESIAN_POSITIONS]), expected, atol=1e-5
    )


def test_negative_lattice_parameters_are_clipped():
    """Noisy sampled cells can have tiny/negative box lengths; the cartesian
    conversion must clip them to a positive minimum (the reference's
    map_noisy_axl_lattice_parameters_to_unit_cell_vectors behavior)."""
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (2, NATOMS, D)).astype(np.float32)
    bad_lattice = np.asarray(
        [[-1.0, 4.0, 5.0, 0, 0, 0], [0.0, 3.0, 6.0, 0, 0, 0]], np.float32
    )
    generator = DummyGenerator(x, bad_lattice)
    batch = create_batch_of_samples(
        generator,
        FakeSamplingParameters(number_of_samples=2, sample_batchsize=2),
        jax.random.PRNGKey(0),
    )
    positions = np.asarray(batch[CARTESIAN_POSITIONS])
    assert np.isfinite(positions).all()
    cells = np.asarray(
        map_noisy_lattice_parameters_to_unit_cell_vectors(
            jnp.asarray(bad_lattice)
        )
    )
    assert (np.diagonal(cells, axis1=1, axis2=2) > 0).all()
