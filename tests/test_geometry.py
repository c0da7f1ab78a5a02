import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_for_multi_scale_molecular_dynamics_tpu.ops.geometry import (
    get_number_of_lattice_parameters,
    get_positions_from_coordinates,
    get_reciprocal_basis_vectors,
    get_relative_coordinates_from_cartesian_positions,
    get_spatial_dimension_from_number_of_lattice_parameters,
    map_lattice_parameters_to_unit_cell_vectors,
    map_noisy_lattice_parameters_to_unit_cell_vectors,
    map_relative_coordinates_to_unit_cell,
    map_unit_cell_to_lattice_parameters,
)


def test_wrap_to_unit_cell_basic():
    x = jnp.array([0.0, 0.25, 0.999, 1.0, 1.5, -0.25, -1.75, 3.25])
    wrapped = map_relative_coordinates_to_unit_cell(x)
    np.testing.assert_allclose(
        np.asarray(wrapped), [0.0, 0.25, 0.999, 0.0, 0.5, 0.75, 0.25, 0.25], atol=1e-6
    )
    assert (np.asarray(wrapped) >= 0).all() and (np.asarray(wrapped) < 1).all()


def test_wrap_to_unit_cell_tiny_negative_edge_case():
    # remainder(-1e-9, 1.0) == 1.0 in float32; must be snapped to 0.
    x = jnp.array([-1e-9, -1e-8], dtype=jnp.float32)
    wrapped = map_relative_coordinates_to_unit_cell(x)
    assert (np.asarray(wrapped) < 1.0).all()
    assert (np.asarray(wrapped) >= 0.0).all()


def test_fractional_cartesian_round_trip(rng_key):
    k1, k2 = jax.random.split(rng_key)
    cell = jnp.diag(jnp.array([5.4, 6.1, 7.3])) + 0.1 * jax.random.normal(
        k1, (3, 3)
    )
    cell = cell[None]  # batch of 1
    x = jax.random.uniform(k2, (1, 16, 3))
    pos = get_positions_from_coordinates(x, cell)
    recip = get_reciprocal_basis_vectors(cell)
    x_back = get_relative_coordinates_from_cartesian_positions(pos, recip)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-5)


@pytest.mark.parametrize("d,n", [(1, 1), (2, 3), (3, 6)])
def test_lattice_parameter_counts(d, n):
    assert get_number_of_lattice_parameters(d) == n
    assert get_spatial_dimension_from_number_of_lattice_parameters(n) == d


def test_lattice_parameters_cell_round_trip():
    params = jnp.array([[5.4, 6.1, 7.3, 0.0, 0.0, 0.0]])
    cell = map_lattice_parameters_to_unit_cell_vectors(params)
    np.testing.assert_allclose(
        np.asarray(cell[0]), np.diag([5.4, 6.1, 7.3]), atol=1e-6
    )
    back = map_unit_cell_to_lattice_parameters(cell)
    np.testing.assert_allclose(np.asarray(back), np.asarray(params), atol=1e-6)


def test_noisy_lattice_parameters_clipped():
    params = jnp.array([[-3.0, 2.0, 10.0, 0.5, 0.0, 0.0]])
    cell = map_noisy_lattice_parameters_to_unit_cell_vectors(params, min_box_size=4.0)
    np.testing.assert_allclose(np.asarray(cell[0]), np.diag([4.0, 4.0, 10.0]), atol=1e-6)
