import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_for_multi_scale_molecular_dynamics_tpu.noise_schedulers import (
    NoiseParameters,
    build_noise_schedule,
    get_noise_at_indices,
)

N = 17
C = 4


@pytest.fixture(params=["exponential", "linear"])
def schedule(request):
    # Reference-exact epsilon pinned explicitly: the convention test below
    # checks the reference's 2e-5 tabulation (the dataclass default is now
    # "auto", covered by tests/test_noise_schedule_guard.py).
    params = NoiseParameters(
        total_time_steps=N, schedule_type=request.param, sigma_min=0.01,
        sigma_max=0.5, corrector_step_epsilon=2e-5,
    )
    return build_noise_schedule(params, num_classes=C)


def test_time_grid(schedule):
    time = np.asarray(schedule.noise.time)
    assert time.shape == (N,)
    np.testing.assert_allclose(time[0], 1e-5, rtol=1e-5)
    np.testing.assert_allclose(time[-1], 1.0, rtol=1e-6)


def test_sigma_monotone_and_bounds(schedule):
    sigma = np.asarray(schedule.noise.sigma)
    assert (np.diff(sigma) > 0).all()
    assert sigma[0] >= 0.0099 and sigma[-1] == pytest.approx(0.5, rel=1e-5)


def test_g_squared_telescopes(schedule):
    sigma_sq = np.asarray(schedule.noise.sigma_squared)
    g_sq = np.asarray(schedule.noise.g_squared)
    np.testing.assert_allclose(g_sq[0], sigma_sq[0] - 0.01**2, rtol=1e-4)
    np.testing.assert_allclose(g_sq[1:], np.diff(sigma_sq), rtol=1e-4)
    assert (g_sq > 0).all()


def test_epsilon_convention(schedule):
    # eps_i = 0.5 eps sigma_i^2 / sigma_1^2 for i = 0..N-1, sigma_0 = sigma_min.
    sigma_sq = np.asarray(schedule.noise.sigma_squared)
    eps = np.asarray(schedule.langevin.epsilon)
    assert eps.shape == (N,)
    base = 2e-5
    np.testing.assert_allclose(eps[0], 0.5 * base * 0.01**2 / sigma_sq[0], rtol=1e-5)
    np.testing.assert_allclose(
        eps[1:], 0.5 * base * sigma_sq[:-1] / sigma_sq[0], rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(schedule.langevin.sqrt_2_epsilon), np.sqrt(2 * eps), rtol=1e-5
    )


def test_beta_and_alpha_bar(schedule):
    beta = np.asarray(schedule.noise.beta)
    np.testing.assert_allclose(beta, 1.0 / (N - np.arange(1, N + 1) + 1), rtol=1e-6)
    assert beta[-1] == pytest.approx(1.0)
    np.testing.assert_allclose(
        np.asarray(schedule.noise.alpha_bar), np.cumprod(1 - beta), rtol=1e-5
    )


def test_q_matrices_are_absorbing_stochastic(schedule):
    q = np.asarray(schedule.noise.q_matrix)
    assert q.shape == (N, C, C)
    np.testing.assert_allclose(q.sum(-1), 1.0, atol=1e-6)
    # MASK row is absorbing.
    np.testing.assert_allclose(q[:, -1, -1], 1.0, atol=1e-6)
    # Final step fully absorbs (beta_N = 1).
    np.testing.assert_allclose(q[-1, :, -1], 1.0, atol=1e-6)


def test_q_bar_is_cumulative_product(schedule):
    q = np.asarray(schedule.noise.q_matrix, dtype=np.float64)
    q_bar = np.asarray(schedule.noise.q_bar_matrix)
    expected = np.empty_like(q)
    expected[0] = q[0]
    for i in range(1, N):
        expected[i] = expected[i - 1] @ q[i]
    np.testing.assert_allclose(q_bar, expected, atol=1e-5)


def test_q_bar_tm1_shift(schedule):
    q_bar = np.asarray(schedule.noise.q_bar_matrix)
    q_bar_tm1 = np.asarray(schedule.noise.q_bar_tm1_matrix)
    np.testing.assert_allclose(q_bar_tm1[0], np.eye(C), atol=1e-6)
    np.testing.assert_allclose(q_bar_tm1[1:], q_bar[:-1], atol=1e-6)


def test_gather_at_indices(schedule):
    idx = jnp.array([0, 3, N - 1])
    gathered = get_noise_at_indices(schedule.noise, idx)
    np.testing.assert_allclose(
        np.asarray(gathered.sigma), np.asarray(schedule.noise.sigma)[[0, 3, N - 1]]
    )
    assert gathered.q_matrix.shape == (3, C, C)
    np.testing.assert_array_equal(np.asarray(gathered.indices), [0, 3, N - 1])
