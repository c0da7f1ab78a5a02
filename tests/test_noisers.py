import jax
import jax.numpy as jnp
import numpy as np

from diffusion_for_multi_scale_molecular_dynamics_tpu.namespace import AXL
from diffusion_for_multi_scale_molecular_dynamics_tpu.noise_schedulers import (
    NoiseParameters,
    build_noise_schedule,
    get_noise_at_indices,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.noisers import (
    get_noisy_atom_types_sample,
    get_noisy_lattice_parameters_sample,
    get_noisy_relative_coordinates_sample,
    noise_axl_composition,
)


def test_noisy_coordinates_in_unit_cell(rng_key):
    x0 = jax.random.uniform(jax.random.PRNGKey(0), (8, 16, 3))
    sigmas = jnp.full_like(x0, 0.5)
    xt = get_noisy_relative_coordinates_sample(rng_key, x0, sigmas)
    xt_np = np.asarray(xt)
    assert (xt_np >= 0).all() and (xt_np < 1).all()
    # small sigma => xt close to x0 modulo wrap
    sigmas_small = jnp.full_like(x0, 1e-4)
    xt_small = get_noisy_relative_coordinates_sample(rng_key, x0, sigmas_small)
    delta = np.abs(np.asarray(xt_small) - np.asarray(x0))
    delta = np.minimum(delta, 1 - delta)
    assert delta.max() < 1e-3


def test_atom_types_noising_distribution(rng_key):
    # With Qbar at the final step (beta_N = 1), everything must be MASK.
    params = NoiseParameters(total_time_steps=10)
    schedule = build_noise_schedule(params, num_classes=3)
    q_bar_last = schedule.noise.q_bar_matrix[-1]
    a0 = jax.nn.one_hot(jnp.zeros((4, 8), dtype=jnp.int32), 3)
    at = get_noisy_atom_types_sample(rng_key, a0, q_bar_last)
    assert (np.asarray(at) == 2).all()

    # With Qbar near t=0, most atoms stay in their original class.
    q_bar_first = schedule.noise.q_bar_matrix[0]
    at0 = get_noisy_atom_types_sample(rng_key, a0, q_bar_first)
    assert (np.asarray(at0) == 0).mean() > 0.8


def test_lattice_noising_fixed_and_free(rng_key):
    l0 = jnp.ones((4, 6)) * 5.0
    sig = jnp.full((4, 1), 0.1)
    fixed = get_noisy_lattice_parameters_sample(rng_key, l0, sig, True)
    np.testing.assert_array_equal(np.asarray(fixed), np.asarray(l0))
    free = get_noisy_lattice_parameters_sample(rng_key, l0, sig, False)
    assert not np.allclose(np.asarray(free), np.asarray(l0))
    assert np.abs(np.asarray(free) - 5.0).max() < 1.0


def test_noise_axl_composition_shapes(rng_key):
    batch, natoms, d = 4, 8, 3
    params = NoiseParameters(total_time_steps=10)
    schedule = build_noise_schedule(params, num_classes=3)
    idx = jnp.array([0, 3, 5, 9])
    noise = get_noise_at_indices(schedule.noise, idx)

    composition = AXL(
        A=jnp.zeros((batch, natoms), dtype=jnp.int32),
        X=jax.random.uniform(jax.random.PRNGKey(1), (batch, natoms, d)),
        L=jnp.concatenate([jnp.ones((batch, d)) * 5.0, jnp.zeros((batch, d))], -1),
    )
    noisy = noise_axl_composition(
        rng_key, composition, noise.sigma, noise.q_bar_matrix,
        num_classes=3, spatial_dimension=d,
    )
    assert noisy.A.shape == (batch, natoms)
    assert noisy.X.shape == (batch, natoms, d)
    assert noisy.L.shape == (batch, 2 * d)
    # Sample with index 9 (t=1) must be fully masked.
    assert (np.asarray(noisy.A[3]) == 2).all()
