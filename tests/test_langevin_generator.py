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


# --------------------------------------------------------------------------
# 1:1 translations of the reference's D3PM sampler edge-case tests
# (reference tests/generators/test_langevin_generator.py:208-530).


def test_adjust_atom_types_probabilities_for_greedy_sampling(rng_key):
    """Fully-masked rows are untouched; unmasked rows get greedy adjustment.

    (reference test_adjust_atom_types_probabilities_for_greedy_sampling:208)
    """
    generator = make_generator(atom_type_greedy_sampling=True)
    mask_index = generator.masked_atom_type_index

    fully_masked_row = jnp.full((NATOMS,), mask_index, jnp.int32)
    partially_unmasked_row = fully_masked_row.at[0].set(0)
    atom_types_i = jnp.stack([fully_masked_row, partially_unmasked_row])

    key_probs, key_gumbel, key_binary = jax.random.split(rng_key, 3)
    probs = jax.nn.softmax(
        jax.random.normal(key_probs, (2, NATOMS, NUM_TYPES + 1)), axis=-1
    )
    gumbel = jax.random.gumbel(key_gumbel, probs.shape)

    new_probs, new_gumbel = generator._adjust_for_greedy_sampling(
        key_binary, probs, atom_types_i, gumbel
    )

    # Fully-masked sample: unaffected.
    np.testing.assert_allclose(new_probs[0], probs[0], rtol=1e-6)
    np.testing.assert_allclose(new_gumbel[0], gumbel[0], rtol=1e-6)

    # Partially-unmasked sample: real-class probabilities unchanged; MASK
    # probability unchanged or zeroed; Gumbel noise zeroed (greedy argmax).
    np.testing.assert_allclose(new_probs[1, :, :-1], probs[1, :, :-1], rtol=1e-6)
    unchanged = np.isclose(np.asarray(new_probs[1, :, -1]), np.asarray(probs[1, :, -1]))
    zeroed = np.asarray(new_probs[1, :, -1]) == 0.0
    assert np.logical_or(unchanged, zeroed).all()
    np.testing.assert_array_equal(np.asarray(new_gumbel[1]), 0.0)


def test_one_transition_per_step_is_idempotent(rng_key):
    """No proposed changes -> atom types unchanged.

    (reference test_get_updated_atom_types_for_one_transition_per_step_is_idempotent:257)
    """
    generator = make_generator()
    nsamples = 6
    key_types, key_gumbel = jax.random.split(rng_key)
    current = jax.random.randint(key_types, (nsamples, NATOMS), 0, NUM_TYPES)
    max_gumbel = jax.random.uniform(key_gumbel, (nsamples, NATOMS))

    updated = generator._restrict_to_one_transition(current, max_gumbel, current)
    np.testing.assert_array_equal(np.asarray(updated), np.asarray(current))


def test_one_transition_per_step_picks_max_gumbel(rng_key):
    """Exactly one change per sample, at the argmax Gumbel among proposals.

    (reference test_get_updated_atom_types_for_one_transition_per_step:281)
    """
    generator = make_generator()
    nsamples = 6
    key_cur, key_samp, key_gumbel = jax.random.split(rng_key, 3)
    current = jax.random.randint(key_cur, (nsamples, NATOMS), 0, NUM_TYPES)
    sampled = jax.random.randint(key_samp, (nsamples, NATOMS), 0, NUM_TYPES)
    # Ensure at least one difference per sample.
    sampled = sampled.at[:, 0].set((current[:, 0] + 1) % NUM_TYPES)
    max_gumbel = jax.random.uniform(key_gumbel, (nsamples, NATOMS))

    updated = generator._restrict_to_one_transition(current, max_gumbel, sampled)
    change_mask = np.asarray(updated != current)
    np.testing.assert_array_equal(change_mask.sum(axis=-1), 1)

    proposed = np.asarray(sampled != current)
    gumbel = np.asarray(max_gumbel).copy()
    gumbel[~proposed] = -np.inf
    expected_atoms = gumbel.argmax(axis=-1)
    np.testing.assert_array_equal(np.where(change_mask)[1], expected_atoms)


@pytest.mark.parametrize("greedy", [True, False])
@pytest.mark.parametrize("one_transition", [True, False])
def test_atom_types_update_full_unmasking_walk(rng_key, greedy, one_transition):
    """Walk the full reverse chain through _atom_types_update with random
    logits: changes are MASK->real only, at most one per step when restricted,
    greedy picks the argmax class, and no MASK remains at the end.

    (reference test_atom_types_update:345)
    """
    generator = make_generator(
        atom_type_greedy_sampling=greedy,
        one_atom_type_transition_per_step=one_transition,
    )
    mask_index = generator.masked_atom_type_index
    noise = generator.schedule.noise
    nsamples = 6

    a_i = jnp.full((nsamples, NATOMS), mask_index, jnp.int32)
    key = rng_key
    for time_index in range(N_STEPS, 0, -1):
        idx = time_index - 1
        is_last = time_index == 1
        key, key_logits, key_update = jax.random.split(key, 3)
        logits = jax.random.uniform(key_logits, (nsamples, NATOMS, NUM_TYPES + 1))
        logits = logits.at[..., -1].set(-jnp.inf)

        restrict = one_transition and not is_last
        a_im1 = generator._atom_types_update(
            key_update,
            logits,
            a_i,
            noise.q_matrix[idx],
            noise.q_bar_matrix[idx],
            noise.q_bar_tm1_matrix[idx],
            one_atom_type_transition_per_step=jnp.asarray(restrict),
        )

        changed = np.asarray(a_im1 != a_i)
        # Changes only unmask.
        assert (np.asarray(a_i)[changed] == mask_index).all()
        assert (np.asarray(a_im1)[changed] != mask_index).all()
        if restrict:
            assert (changed.sum(axis=-1) <= 1).all()
        if greedy:
            # Greedy applies once a sample has >= 1 real atom.
            for sample_idx, atom_idx in zip(*np.where(changed)):
                if (np.asarray(a_i)[sample_idx] == mask_index).all():
                    continue
                expected = np.asarray(logits[sample_idx, atom_idx]).argmax()
                assert np.asarray(a_im1)[sample_idx, atom_idx] == expected
        a_i = a_im1

    assert not (np.asarray(a_i) == mask_index).any()


def test_predictor_step_atom_types_walk(rng_key):
    """Full predictor-step walk with injected logits: unmask-only transitions,
    at most one per non-final step, none left at the end.

    (reference test_predictor_step_atom_types:430)
    """
    injected = {}

    def injectable_network(batch):
        composition = batch[NOISY_AXL_COMPOSITION]
        return AXL(
            A=injected["logits"],
            X=jnp.zeros_like(composition.X),
            L=jnp.zeros_like(composition.L),
        )

    params = PredictorCorrectorSamplingParameters(
        algorithm="predictor_corrector",
        num_atom_types=NUM_TYPES,
        number_of_atoms=NATOMS,
        number_of_samples=6,
        number_of_corrector_steps=0,
        use_fixed_lattice_parameters=True,
        cell_dimensions=[5.43] * D,
        record_samples=False,
    )
    noise_params = NoiseParameters(
        total_time_steps=N_STEPS, sigma_min=0.001, sigma_max=0.4
    )
    generator = LangevinGenerator(noise_params, params, injectable_network)
    mask_index = generator.masked_atom_type_index
    nsamples = 6

    key = rng_key
    key, key_x = jax.random.split(key)
    composition = AXL(
        A=jnp.full((nsamples, NATOMS), mask_index, jnp.int32),
        X=jax.random.uniform(key_x, (nsamples, NATOMS, D)),
        L=jnp.zeros((nsamples, 6)),
    )

    for idx in range(N_STEPS - 1, -1, -1):
        key, key_logits, key_step = jax.random.split(key, 3)
        logits = jax.random.uniform(key_logits, (nsamples, NATOMS, NUM_TYPES + 1))
        injected["logits"] = logits.at[..., -1].set(-jnp.inf)

        new_composition, _ = generator.predictor_step(
            key_step, composition, jnp.asarray(idx)
        )
        changed = np.asarray(new_composition.A != composition.A)
        assert (np.asarray(composition.A)[changed] == mask_index).all()
        assert (np.asarray(new_composition.A)[changed] != mask_index).all()
        if idx != 0:
            assert (changed.sum(axis=-1) <= 1).all()
        composition = new_composition

    assert not (np.asarray(composition.A) == mask_index).any()


def test_corrector_step_formula(rng_key):
    """Corrector X update is x + eps*s/sigma + sqrt(2 eps) z with the
    tabulated eps, and the i=0 corrector extrapolates to sigma_min.

    (reference test_corrector_step:505)
    """
    generator = make_generator()
    noise_params = generator.noise_parameters
    schedule = generator.schedule
    nsamples = 6

    key_x, key_step = jax.random.split(rng_key)
    x = jax.random.uniform(key_x, (nsamples, NATOMS, D))
    composition = AXL(
        A=jnp.zeros((nsamples, NATOMS), jnp.int32),
        X=x,
        L=jnp.zeros((nsamples, 6)),
    )

    for idx in (0, 1, N_STEPS - 1):
        corrected, predictions = generator.corrector_step(
            key_step, composition, jnp.asarray(idx)
        )
        # Reproduce the exact update using the same derived key for z.
        key_a, key_xn, key_l = jax.random.split(key_step, 3)
        z = jax.random.normal(key_xn, x.shape, x.dtype)
        eps = schedule.langevin.epsilon[idx]
        sigma_expected = (
            noise_params.sigma_min if idx == 0 else schedule.noise.sigma[idx - 1]
        )
        from diffusion_for_multi_scale_molecular_dynamics_tpu.ops.geometry import (
            map_relative_coordinates_to_unit_cell,
        )

        expected = map_relative_coordinates_to_unit_cell(
            x + eps * predictions.X / sigma_expected + jnp.sqrt(2.0 * eps) * z
        )
        np.testing.assert_allclose(
            np.asarray(corrected.X), np.asarray(expected), rtol=1e-5, atol=1e-6
        )


def test_corrector_temperature_scales_noise(rng_key):
    """corrector_temperature multiplies only the corrector noise: T=0 makes
    the corrector deterministic drift, T=1 is the reference update."""
    cold = make_generator(corrector_temperature=0.0)
    x = jax.random.uniform(rng_key, (6, NATOMS, D))
    composition = AXL(
        A=jnp.zeros((6, NATOMS), jnp.int32), X=x, L=jnp.zeros((6, 6))
    )
    idx = jnp.asarray(1)
    corrected, predictions = cold.corrector_step(rng_key, composition, idx)
    schedule = cold.schedule
    eps = schedule.langevin.epsilon[1]
    sigma = schedule.noise.sigma[0]
    from diffusion_for_multi_scale_molecular_dynamics_tpu.ops.geometry import (
        map_relative_coordinates_to_unit_cell,
    )

    expected = map_relative_coordinates_to_unit_cell(
        x + eps * predictions.X / sigma
    )
    np.testing.assert_allclose(
        np.asarray(corrected.X), np.asarray(expected), rtol=1e-5, atol=1e-6
    )

    # T=1 differs from T=0 by exactly sqrt(2 eps) z; hotter scales that z.
    unit = make_generator(corrector_temperature=1.0)
    hot = make_generator(corrector_temperature=2.0)
    corrected_unit, _ = unit.corrector_step(rng_key, composition, idx)
    corrected_hot, _ = hot.corrector_step(rng_key, composition, idx)
    noise_unit = np.asarray(corrected_unit.X) - np.asarray(corrected.X)
    noise_unit -= np.round(noise_unit)
    noise_hot = np.asarray(corrected_hot.X) - np.asarray(corrected.X)
    noise_hot -= np.round(noise_hot)
    np.testing.assert_allclose(noise_hot, 2.0 * noise_unit, rtol=1e-4, atol=1e-6)


def test_lattice_consistent_step_scaling_weights(rng_key):
    """With lattice_consistent_step_scaling (default), the L predictor uses
    (g_n^2, g_n) = (g^2, g) * n^(-2/d, -1/d) and the tabulated corrector eps
    is rescaled by n^(-2/d); with it off, weights match X (reference parity,
    reference langevin_generator.py:631-640 TODO behaviour)."""
    z = jnp.zeros((6, NATOMS, D))
    z_l = jnp.zeros((6, 6))
    for scaled in (True, False):
        generator = make_generator(
            use_fixed_lattice_parameters=False,
            cell_dimensions=None,
            lattice_consistent_step_scaling=scaled,
        )
        c = NATOMS ** (-1.0 / D) if scaled else 1.0
        noise = generator.schedule.noise
        idx = jnp.asarray(3)
        sigma_i = noise.sigma[idx]
        predictions = mock_network(
            {
                NOISY_AXL_COMPOSITION: AXL(
                    A=jnp.zeros((6, NATOMS), jnp.int32),
                    X=jnp.zeros((6, NATOMS, D)),
                    L=jnp.zeros((6, 6)),
                )
            }
        )
        ws_x, wn_x, ws_l, wn_l = generator._substep_xl_weights(
            True, idx, sigma_i, generator._sigma_n(sigma_i), predictions, z, z_l, 1.0
        )
        np.testing.assert_allclose(float(ws_x), float(noise.g_squared[idx]), rtol=1e-6)
        np.testing.assert_allclose(
            float(ws_l), float(noise.g_squared[idx]) * c**2, rtol=1e-6
        )
        np.testing.assert_allclose(float(wn_l), float(noise.g[idx]) * c, rtol=1e-6)
        eps = float(generator.schedule.langevin.epsilon[idx])
        ws_x, wn_x, ws_l, wn_l = generator._substep_xl_weights(
            False, idx, sigma_i, generator._sigma_n(sigma_i), predictions, z, z_l, 1.0
        )
        np.testing.assert_allclose(float(ws_x), eps, rtol=1e-6)
        np.testing.assert_allclose(float(ws_l), eps * c**2, rtol=1e-6)
        np.testing.assert_allclose(
            float(wn_l), np.sqrt(2.0 * eps) * c, rtol=1e-6
        )


def test_adaptive_corrector_step_size_guard(rng_key):
    """A vanishing learned score must not produce a divergent adaptive step
    (the reference-default failure mode); a healthy harmonic-scale score
    must be left untouched by the cap."""
    from diffusion_for_multi_scale_molecular_dynamics_tpu.generators.adaptive_corrector import (
        AdaptiveCorrectorGenerator,
    )

    params = PredictorCorrectorSamplingParameters(
        number_of_corrector_steps=1,
        num_atom_types=NUM_TYPES,
        number_of_atoms=NATOMS,
        number_of_samples=4,
        use_fixed_lattice_parameters=True,
        cell_dimensions=[5.43] * D,
        adaptive_corrector_mode_std=0.005,
    )
    noise_params = NoiseParameters(
        total_time_steps=N_STEPS, sigma_min=1e-4, sigma_max=0.2
    )
    generator = AdaptiveCorrectorGenerator(noise_params, params, lambda b: None)

    sigma = 0.1
    z = jax.random.normal(rng_key, (4, NATOMS, D))
    tiny_scores = jnp.full((4, NATOMS, D), 1e-12)
    eps_guarded = generator._coordinates_corrector_step_size(
        jnp.asarray(5), sigma, tiny_scores, z
    )
    # Cap: length <= 4 * z_norm * sqrt(sigma^2 + mode^2) / sqrt(3N).
    z_norm = float(jnp.mean(jnp.linalg.norm(z, axis=-1)))
    r = noise_params.corrector_r
    max_len = 4.0 * z_norm * np.sqrt((sigma**2 + 0.005**2) / (NATOMS * D))
    assert float(eps_guarded) <= 2.0 * (r * max_len) ** 2 * (1 + 1e-6)

    # A score at the exact harmonic magnitude is untouched by the cap.
    mode_std = 0.005
    variance = mode_std**2 + sigma**2
    d = jax.random.normal(jax.random.fold_in(rng_key, 1), (4, NATOMS, D)) * np.sqrt(variance)
    healthy = -sigma * d / variance
    eps_healthy = generator._coordinates_corrector_step_size(
        jnp.asarray(5), sigma, healthy, z
    )
    unguarded = PredictorCorrectorSamplingParameters(
        number_of_corrector_steps=1,
        num_atom_types=NUM_TYPES,
        number_of_atoms=NATOMS,
        number_of_samples=4,
        use_fixed_lattice_parameters=True,
        cell_dimensions=[5.43] * D,
        adaptive_corrector_max_length_over_sigma=0.0,
    )
    generator_unguarded = AdaptiveCorrectorGenerator(
        noise_params, unguarded, lambda b: None
    )
    eps_reference = generator_unguarded._coordinates_corrector_step_size(
        jnp.asarray(5), sigma, healthy, z
    )
    np.testing.assert_allclose(
        float(eps_healthy), float(eps_reference), rtol=1e-6
    )


def test_adaptive_corrector_default_is_inert(rng_key):
    """Default parameters (mode_std unset) must reproduce strict reference
    behavior even at freeze-out sigma, where a mode_std=0 cap would bind
    (the harmonic length collapses to z_norm*sigma/sqrt(dof) << the healthy
    step)."""
    from diffusion_for_multi_scale_molecular_dynamics_tpu.generators.adaptive_corrector import (
        AdaptiveCorrectorGenerator,
    )

    noise_params = NoiseParameters(
        total_time_steps=N_STEPS, sigma_min=1e-4, sigma_max=0.2
    )

    def make(**overrides):
        return AdaptiveCorrectorGenerator(
            noise_params,
            PredictorCorrectorSamplingParameters(
                number_of_corrector_steps=1,
                num_atom_types=NUM_TYPES,
                number_of_atoms=NATOMS,
                number_of_samples=4,
                use_fixed_lattice_parameters=True,
                cell_dimensions=[5.43] * D,
                **overrides,
            ),
            lambda b: None,
        )

    sigma = 1e-4  # freeze-out: healthy |s| ~ data width >> sigma
    mode_std = 0.005
    z = jax.random.normal(rng_key, (4, NATOMS, D))
    variance = mode_std**2 + sigma**2
    d = jax.random.normal(jax.random.fold_in(rng_key, 1), (4, NATOMS, D)) * np.sqrt(
        variance
    )
    healthy = -sigma * d / variance

    eps_default = make()._coordinates_corrector_step_size(
        jnp.asarray(5), sigma, healthy, z
    )
    eps_reference = make(
        adaptive_corrector_max_length_over_sigma=0.0
    )._coordinates_corrector_step_size(jnp.asarray(5), sigma, healthy, z)
    np.testing.assert_allclose(float(eps_default), float(eps_reference), rtol=1e-6)


def test_max_steps_per_call_auto_policy():
    """Auto chunking bounds network applications per compiled program at 1750
    (the largest class proven clean on v5e at n=216); explicit values win.

    Guards the round-5 fix for the reproducible c8 `UNAVAILABLE` fault
    (experiments/repro_c8_fault.py): 250-step x 9-application programs kill
    the device, so 8 correctors must auto-shorten the chunk.
    """
    assert make_generator(number_of_corrector_steps=6).max_steps_per_call == 250
    assert make_generator(number_of_corrector_steps=8).max_steps_per_call == 194
    assert make_generator(number_of_corrector_steps=0).max_steps_per_call == 250
    # Repaint resampling adds predictor calls to the program.
    assert (
        make_generator(number_of_corrector_steps=6, repaint_resample_steps=4)
        .max_steps_per_call
        == 159
    )
    assert (
        make_generator(number_of_corrector_steps=8, max_steps_per_call=77)
        .max_steps_per_call
        == 77
    )
    # Pathological corrector counts still yield a usable chunk.
    assert make_generator(number_of_corrector_steps=100).max_steps_per_call == 25


def test_chunked_sampling_matches_single_chunk(rng_key):
    """Chunk boundaries are numerics-neutral: the chained compiled scans
    produce bit-identical samples to one whole-trajectory scan."""
    chunked = make_generator(number_of_corrector_steps=2, max_steps_per_call=3)
    whole = make_generator(number_of_corrector_steps=2, max_steps_per_call=N_STEPS)
    s1 = chunked.sample(rng_key, 4)
    s2 = whole.sample(rng_key, 4)
    np.testing.assert_array_equal(np.asarray(s1.X), np.asarray(s2.X))
    np.testing.assert_array_equal(np.asarray(s1.A), np.asarray(s2.A))


def test_sample_window_partitions_trajectory(rng_key):
    """sample_window chains chunked scans over an index window; two windows
    (total -> k, k -> 0) partition the schedule exactly and produce valid
    final samples (the round-5 two-phase corrector schedule builds on this)."""
    import jax

    generator = make_generator(number_of_corrector_steps=1, max_steps_per_call=3)
    hot = make_generator(number_of_corrector_steps=4, max_steps_per_call=3)
    key_init, key_p1, key_p2 = jax.random.split(rng_key, 3)
    composition = generator.initialize(key_init, 5)
    composition = generator.sample_window(key_p1, composition, N_STEPS, 3)
    final = hot.sample_window(key_p2, composition, 3, 0)
    a = np.asarray(final.A)
    x = np.asarray(final.X)
    assert a.shape == (5, NATOMS)
    assert (a != NUM_TYPES).all(), "MASK survived the two-phase trajectory"
    assert (x >= 0).all() and (x < 1).all()
    # Deterministic per key.
    composition_2 = generator.initialize(key_init, 5)
    composition_2 = generator.sample_window(key_p1, composition_2, N_STEPS, 3)
    final_2 = hot.sample_window(key_p2, composition_2, 3, 0)
    np.testing.assert_array_equal(x, np.asarray(final_2.X))
