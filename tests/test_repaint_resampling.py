"""RePaint resampling (repaint_resample_steps) — structure and invariants.

The resampling loop (Lugmayr et al. 2022, Alg. 2) jumps back one noise
level after each predictor step and re-predicts, re-applying the constraint
overwrite each time. The reference has no counterpart (its
constrained_langevin_generator.py:94 overwrites once per level);
repaint_resample_steps=0 must reproduce the old program exactly.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_for_multi_scale_molecular_dynamics_tpu.generators import (
    LangevinGenerator,
    PredictorCorrectorSamplingParameters,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.generators.constrained_langevin_generator import (
    ConstrainedLangevinGenerator,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.generators.sampling_constraint import (
    SamplingConstraint,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.namespace import AXL
from diffusion_for_multi_scale_molecular_dynamics_tpu.noise_schedulers import (
    NoiseParameters,
)

N_ATOMS = 4
NOISE = NoiseParameters(
    total_time_steps=12, schedule_type="linear", sigma_min=1e-3, sigma_max=0.3
)


def fake_network(batch):
    from diffusion_for_multi_scale_molecular_dynamics_tpu.namespace import (
        NOISY_AXL_COMPOSITION,
    )

    composition = batch[NOISY_AXL_COMPOSITION]
    logits = jnp.zeros(composition.A.shape + (2,))
    logits = logits.at[..., 1].set(-1e9)  # always predict type 0
    return AXL(
        A=logits,
        X=-0.1 * jnp.sin(2 * jnp.pi * composition.X),
        L=jnp.zeros_like(composition.L),
    )


def make_params(resample_steps):
    return PredictorCorrectorSamplingParameters(
        num_atom_types=1,
        number_of_atoms=N_ATOMS,
        number_of_samples=3,
        number_of_corrector_steps=1,
        use_fixed_lattice_parameters=True,
        cell_dimensions=[5.0, 5.0, 5.0],
        repaint_resample_steps=resample_steps,
    )


def test_zero_resample_steps_reproduce_previous_samples():
    """U=0 must be bit-identical to the pre-resampling scan program."""
    baseline = LangevinGenerator(NOISE, make_params(0), fake_network)
    samples = baseline.sample(jax.random.PRNGKey(0), 3)
    again = LangevinGenerator(NOISE, make_params(0), fake_network).sample(
        jax.random.PRNGKey(0), 3
    )
    np.testing.assert_array_equal(np.asarray(samples.X), np.asarray(again.X))
    assert not (np.asarray(samples.A) == 1).any()


def test_resampling_runs_and_keeps_invariants():
    generator = LangevinGenerator(NOISE, make_params(2), fake_network)
    samples = generator.sample(jax.random.PRNGKey(1), 3)
    x = np.asarray(samples.X)
    assert np.isfinite(x).all() and (x >= 0).all() and (x < 1).all()
    assert not (np.asarray(samples.A) == 1).any(), "MASK atoms left"


def test_constrained_resampling_satisfies_constraints_exactly():
    constraint = SamplingConstraint(
        elements=["Si"],
        constrained_relative_coordinates=np.asarray(
            [[0.25, 0.25, 0.25], [0.75, 0.75, 0.75]], np.float32
        ),
        constrained_atom_types=np.zeros(2, np.int32),
        constrained_indices=np.asarray([0, 2], np.int32),
    )
    generator = ConstrainedLangevinGenerator(
        NOISE, make_params(2), fake_network, constraint
    )
    samples = generator.sample(jax.random.PRNGKey(2), 3)
    x = np.asarray(samples.X)
    np.testing.assert_array_equal(
        x[:, [0, 2]],
        np.broadcast_to(
            constraint.constrained_relative_coordinates, (3, 2, 3)
        ),
    )
    assert not (np.asarray(samples.A) == 1).any()


def test_record_path_supports_resampling():
    params = make_params(1)
    params = type(params)(
        **{
            **{f: getattr(params, f) for f in params.__dataclass_fields__},
            "record_samples": True,
        }
    )
    generator = LangevinGenerator(NOISE, params, fake_network)
    samples = generator.sample(jax.random.PRNGKey(3), 3)
    assert np.isfinite(np.asarray(samples.X)).all()


def make_coherent_params(**kw):
    defaults = dict(
        num_atom_types=1,
        number_of_atoms=N_ATOMS,
        number_of_samples=3,
        number_of_corrector_steps=1,
        use_fixed_lattice_parameters=True,
        cell_dimensions=[5.0, 5.0, 5.0],
        repaint_coherent_renoising=True,
    )
    defaults.update(kw)
    return PredictorCorrectorSamplingParameters(**defaults)


CONSTRAINT = SamplingConstraint(
    elements=["Si"],
    constrained_relative_coordinates=np.asarray(
        [[0.25, 0.25, 0.25], [0.75, 0.75, 0.75]], np.float32
    ),
    constrained_atom_types=np.zeros(2, np.int32),
    constrained_indices=np.asarray([0, 2], np.int32),
)


def test_coherent_renoising_constraint_follows_frozen_z():
    """With repaint_coherent_renoising, the post-predictor constrained slots
    sit at wrap(x0 + sigma_i * z) with ONE z across the whole chunk, and the
    constrained A-masking is monotone (atoms unmask once, stay unmasked)."""
    small_noise = NoiseParameters(
        total_time_steps=12, schedule_type="linear", sigma_min=1e-3,
        sigma_max=0.08,
    )
    generator = ConstrainedLangevinGenerator(
        small_noise, make_coherent_params(), fake_network, CONSTRAINT
    )
    n_steps = small_noise.total_time_steps
    init = generator.initialize(jax.random.PRNGKey(7), 3)
    indices = jnp.arange(n_steps - 1, -1, -1)
    _, _, records = generator._scan_chunk(
        init, jax.random.PRNGKey(3), indices, True
    )
    x_rec = np.asarray(records.composition_im1.X)[:, :, [0, 2], :]
    a_rec = np.asarray(records.composition_im1.A)[:, :, [0, 2]]
    sigma = np.asarray(generator.schedule.noise.sigma)
    x0 = np.asarray(CONSTRAINT.constrained_relative_coordinates)

    z_hats = []
    for step in range(n_steps):
        idx = int(indices[step])
        if idx == 0:
            np.testing.assert_allclose(
                x_rec[step], np.broadcast_to(x0, (3, 2, 3)), atol=1e-6
            )
            continue
        delta = x_rec[step] - x0
        delta -= np.round(delta)
        z_hats.append(delta / sigma[idx - 1])
    z_hats = np.stack(z_hats)
    np.testing.assert_allclose(
        z_hats, np.broadcast_to(z_hats[0], z_hats.shape), rtol=1e-3, atol=1e-4
    )

    # Monotone unmasking over reverse time on the constrained slots.
    unmasked = a_rec != 1
    assert unmasked[-1].all()
    regressions = unmasked[:-1] & ~unmasked[1:]
    assert not regressions.any(), "a constrained atom re-masked"


@pytest.mark.slow
def test_coherent_renoising_deterministic_and_distinct():
    generator = ConstrainedLangevinGenerator(
        NOISE, make_coherent_params(), fake_network, CONSTRAINT
    )
    s1 = generator.sample(jax.random.PRNGKey(5), 3)
    s2 = ConstrainedLangevinGenerator(
        NOISE, make_coherent_params(), fake_network, CONSTRAINT
    ).sample(jax.random.PRNGKey(5), 3)
    np.testing.assert_array_equal(np.asarray(s1.X), np.asarray(s2.X))

    # Fresh mode redraws the constraint noise per substep: the implied z of
    # the recorded constrained slots varies across steps (the coherent mode's
    # z is constant — pinned by the test above). The final samples can agree
    # (the fake network is per-slot), so distinctness must be checked
    # mid-trajectory.
    fresh_gen = ConstrainedLangevinGenerator(
        NOISE, make_coherent_params(repaint_coherent_renoising=False),
        fake_network, CONSTRAINT,
    )
    init = fresh_gen.initialize(jax.random.PRNGKey(9), 3)
    n_steps = NOISE.total_time_steps
    indices = jnp.arange(n_steps - 1, -1, -1)
    _, _, records = fresh_gen._scan_chunk(
        init, jax.random.PRNGKey(9), indices, True
    )
    x_rec = np.asarray(records.composition_im1.X)[:, :, [0, 2], :]
    sigma = np.asarray(fresh_gen.schedule.noise.sigma)
    x0 = np.asarray(CONSTRAINT.constrained_relative_coordinates)
    z_hats = []
    for step in range(n_steps - 1):  # skip idx == 0 (clean overwrite)
        idx = int(indices[step])
        delta = x_rec[step] - x0
        delta -= np.round(delta)
        z_hats.append(delta / sigma[idx - 1])
    z_hats = np.stack(z_hats)
    step_spread = np.abs(z_hats - z_hats[0]).max()
    assert step_spread > 0.1, "fresh mode should redraw z per substep"

    # Constraints still satisfied exactly at the end.
    np.testing.assert_array_equal(
        np.asarray(s1.X)[:, [0, 2]],
        np.broadcast_to(CONSTRAINT.constrained_relative_coordinates, (3, 2, 3)),
    )
    assert not (np.asarray(s1.A) == 1).any()


def test_coherent_renoising_is_whole_trajectory_across_chunks(rng_key):
    """Chunk boundaries must not redraw the frozen constraint noise: chunked
    coherent sampling is bit-identical to one whole-trajectory scan (the
    advisor's round-4 finding — the frozen z used to refresh every
    max_steps_per_call chunk, making long trajectories only
    piecewise-coherent)."""
    constraint = SamplingConstraint(
        elements=["Si"],
        constrained_relative_coordinates=np.array(
            [[0.1, 0.2, 0.3], [0.6, 0.7, 0.8]], dtype=np.float32
        ),
        constrained_atom_types=np.array([0, 0]),
    )

    def build(chunk):
        params = PredictorCorrectorSamplingParameters(
            num_atom_types=1,
            number_of_atoms=N_ATOMS,
            number_of_samples=3,
            number_of_corrector_steps=1,
            use_fixed_lattice_parameters=True,
            cell_dimensions=[5.0, 5.0, 5.0],
            repaint_coherent_renoising=True,
            max_steps_per_call=chunk,
        )
        return ConstrainedLangevinGenerator(NOISE, params, fake_network, constraint)

    chunked = build(3).sample(rng_key, 3)
    whole = build(12).sample(rng_key, 3)
    np.testing.assert_array_equal(np.asarray(chunked.X), np.asarray(whole.X))
    np.testing.assert_array_equal(np.asarray(chunked.A), np.asarray(whole.A))
