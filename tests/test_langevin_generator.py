"""Langevin generator unit tests with a mocked score network.

(mirrors the reference's mock-based sampler tests,
tests/generators/test_langevin_generator.py)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_for_multi_scale_molecular_dynamics_tpu.namespace import (
    AXL,
    NOISY_AXL_COMPOSITION,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.noise_schedulers import (
    NoiseParameters,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.generators import (
    AdaptiveCorrectorGenerator,
    LangevinGenerator,
    PredictorCorrectorSamplingParameters,
)

NUM_TYPES = 2
NATOMS = 4
D = 3
N_STEPS = 8


def mock_network(batch):
    """Favors class 0 strongly; zero X/L scores; MASK logit -inf."""
    composition = batch[NOISY_AXL_COMPOSITION]
    b, n = composition.A.shape
    logits = jnp.zeros((b, n, NUM_TYPES + 1))
    logits = logits.at[..., 0].set(10.0)
    logits = logits.at[..., -1].set(-jnp.inf)
    return AXL(
        A=logits,
        X=jnp.zeros_like(composition.X),
        L=jnp.zeros_like(composition.L),
    )


def make_generator(cls=LangevinGenerator, **kwargs):
    defaults = dict(
        algorithm="predictor_corrector",
        num_atom_types=NUM_TYPES,
        number_of_atoms=NATOMS,
        number_of_samples=6,
        number_of_corrector_steps=1,
        use_fixed_lattice_parameters=True,
        cell_dimensions=[5.43] * D,
        record_samples=False,
    )
    defaults.update(kwargs)
    params = PredictorCorrectorSamplingParameters(**defaults)
    noise = NoiseParameters(total_time_steps=N_STEPS, sigma_min=0.001, sigma_max=0.4)
    return cls(noise, params, mock_network)


def test_sample_shapes_and_no_masks(rng_key):
    generator = make_generator()
    samples = generator.sample(rng_key, 6)
    a = np.asarray(samples.A)
    x = np.asarray(samples.X)
    lattice = np.asarray(samples.L)
    assert a.shape == (6, NATOMS)
    assert x.shape == (6, NATOMS, D)
    assert lattice.shape == (6, 2 * D)
    # After the full reverse trajectory no MASK may remain.
    assert (a != NUM_TYPES).all()
    # With class-0-favoring logits, everything should unmask to class 0.
    assert (a == 0).all()
    assert (x >= 0).all() and (x < 1).all()
    np.testing.assert_allclose(lattice[:, :D], 5.43, atol=1e-6)
    np.testing.assert_allclose(lattice[:, D:], 0.0, atol=1e-6)


def test_sampling_is_deterministic_per_key(rng_key):
    generator = make_generator()
    s1 = generator.sample(rng_key, 6)
    s2 = generator.sample(rng_key, 6)
    np.testing.assert_array_equal(np.asarray(s1.A), np.asarray(s2.A))
    np.testing.assert_allclose(np.asarray(s1.X), np.asarray(s2.X))
    other = generator.sample(jax.random.PRNGKey(7), 6)
    assert not np.allclose(np.asarray(s1.X), np.asarray(other.X))


def test_one_atom_type_transition_per_step(rng_key):
    generator = make_generator(number_of_corrector_steps=0)
    composition = generator.initialize(rng_key, 5)
    # Predictor at a middle step: at most one atom may change type.
    updated, _ = generator.predictor_step(
        jax.random.PRNGKey(3), composition, jnp.asarray(N_STEPS // 2)
    )
    changes = (np.asarray(updated.A) != np.asarray(composition.A)).sum(axis=-1)
    assert (changes <= 1).all()


def test_last_step_unmasks_everything(rng_key):
    generator = make_generator(number_of_corrector_steps=0)
    composition = generator.initialize(rng_key, 5)  # all MASK
    updated, _ = generator.predictor_step(
        jax.random.PRNGKey(3), composition, jnp.asarray(0)
    )
    assert (np.asarray(updated.A) != NUM_TYPES).all()


def test_relative_coordinates_update_formula():
    generator = make_generator()
    x = jnp.array([[[0.5, 0.5, 0.5]]])
    scores = jnp.array([[[0.1, -0.2, 0.3]]])
    sigma, w_score, w_noise = 0.2, 0.04, 0.1
    z = jnp.array([[[1.0, -1.0, 4.9]]])
    updated = generator._relative_coordinates_update(
        x, scores, sigma, w_score, w_noise, z
    )
    expected = np.mod(
        np.asarray(x) + w_score * np.asarray(scores) / sigma + w_noise * np.asarray(z),
        1.0,
    )
    np.testing.assert_allclose(np.asarray(updated), expected, rtol=1e-5)
    assert (np.asarray(updated) < 1.0).all()


def test_greedy_sampling_unmasks_deterministically(rng_key):
    generator = make_generator(number_of_corrector_steps=0)
    # One sample where one atom is already unmasked: greedy path active.
    a = jnp.array([[NUM_TYPES, 1, NUM_TYPES, NUM_TYPES]])
    probs = jnp.ones((1, NATOMS, NUM_TYPES + 1)) / (NUM_TYPES + 1)
    gumbel = jax.random.gumbel(rng_key, probs.shape)
    new_probs, new_gumbel = generator._adjust_for_greedy_sampling(
        jax.random.PRNGKey(0), probs, a, gumbel
    )
    # Not all masked => gumbel zeroed (deterministic argmax).
    np.testing.assert_allclose(np.asarray(new_gumbel), 0.0)

    all_masked = jnp.full((1, NATOMS), NUM_TYPES)
    _, gumbel_kept = generator._adjust_for_greedy_sampling(
        jax.random.PRNGKey(0), probs, all_masked, gumbel
    )
    np.testing.assert_allclose(np.asarray(gumbel_kept), np.asarray(gumbel))


def test_adaptive_corrector_predictor_keeps_coordinates(rng_key):
    generator = make_generator(cls=AdaptiveCorrectorGenerator)
    composition = generator.initialize(rng_key, 4)
    updated, _ = generator.predictor_step(
        jax.random.PRNGKey(1), composition, jnp.asarray(3)
    )
    np.testing.assert_array_equal(np.asarray(updated.X), np.asarray(composition.X))
    np.testing.assert_array_equal(np.asarray(updated.L), np.asarray(composition.L))
    # but atom types still evolve toward unmasking over the full run
    samples = generator.sample(rng_key, 4)
    assert (np.asarray(samples.A) != NUM_TYPES).all()


def test_trajectory_recording(rng_key):
    generator = make_generator(record_samples=True)
    generator.sample(rng_key, 2)
    data = generator.sample_trajectory_recorder.data
    assert "predictor_step" in data and "noise" in data
    record = data["predictor_step"][0]
    # stacked over the N_STEPS scan steps
    assert record.composition_i.X.shape == (N_STEPS, 2, NATOMS, D)
    assert record.time_step_index.shape == (N_STEPS,)
    assert int(record.time_step_index[0]) == N_STEPS
    assert int(record.time_step_index[-1]) == 1
