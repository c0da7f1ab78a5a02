import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_for_multi_scale_molecular_dynamics_tpu.ops.wrapped_gaussian_score import (
    get_coordinates_sigma_normalized_score,
    get_log_wrapped_gaussians,
    get_sigma_normalized_score_brute_force,
)

SIGMAS = [0.001, 0.01, 0.1, 0.3, 0.398, 0.4, 0.5, 1.0, 2.0, 5.0]
US = [0.0, 0.01, 0.25, 0.49, 0.5, 0.51, 0.75, 0.99, 0.999]


@pytest.mark.parametrize("sigma,u", list(itertools.product(SIGMAS, US)))
def test_score_matches_brute_force(sigma, u):
    if sigma < 0.02:
        # The float64 brute-force sum underflows to 0/0 here; analytically all
        # the probability mass sits in the nearest image: sigma*S = -wrap(u)/sigma
        # with wrap(u) in (-1/2, 1/2] (and S = 0 exactly at u = 1/2).
        centered = u if u < 0.5 else u - 1.0
        expected = 0.0 if u == 0.5 else -centered / sigma
    else:
        expected = get_sigma_normalized_score_brute_force(u, sigma, kmax=50)
    got = get_coordinates_sigma_normalized_score(
        jnp.array([u], dtype=jnp.float64 if jax.config.jax_enable_x64 else jnp.float32),
        jnp.array([sigma]),
        kmax=4,
    )
    scale = max(1.0, abs(expected))
    assert abs(float(got[0]) - expected) / scale < 2e-4, (
        f"sigma={sigma} u={u}: got {float(got[0])}, expected {expected}"
    )


def test_score_is_finite_and_jittable(rng_key):
    k1, k2 = jax.random.split(rng_key)
    u = jax.random.uniform(k1, (4, 8, 3))
    sigma = jax.random.uniform(k2, (4, 8, 3), minval=1e-3, maxval=3.0)
    fn = jax.jit(lambda a, b: get_coordinates_sigma_normalized_score(a, b, kmax=4))
    out = fn(u, sigma)
    assert out.shape == u.shape
    assert np.isfinite(np.asarray(out)).all()


def test_score_gradients_finite(rng_key):
    # The double-where construction must keep gradients finite across regimes.
    u = jnp.array([0.1, 0.49, 0.51, 0.9])
    sigma = jnp.array([0.01, 0.39, 0.41, 2.0])

    def total(s):
        return jnp.sum(get_coordinates_sigma_normalized_score(u, s, kmax=4))

    grad = jax.grad(total)(sigma)
    assert np.isfinite(np.asarray(grad)).all()


def test_score_antisymmetry():
    # score(1 - u) = -score(u) by the symmetry of the wrapped Gaussian.
    u = jnp.array([0.1, 0.2, 0.3, 0.45])
    sigma = jnp.full_like(u, 0.25)
    s_u = get_coordinates_sigma_normalized_score(u, sigma, kmax=6)
    s_1mu = get_coordinates_sigma_normalized_score(1.0 - u, sigma, kmax=6)
    np.testing.assert_allclose(np.asarray(s_u), -np.asarray(s_1mu), atol=1e-4)


def test_log_wrapped_gaussians_matches_numpy():
    rng = np.random.RandomState(0)
    x = rng.uniform(size=(2, 3, 2)).astype(np.float32)
    sigmas = np.full_like(x, 0.3)
    kmax = 8

    expected = np.zeros(2)
    for b in range(2):
        for a in range(3):
            for d in range(2):
                z = sum(
                    np.exp(-0.5 * (x[b, a, d] + k) ** 2 / 0.3**2)
                    for k in range(-kmax, kmax + 1)
                )
                expected[b] += np.log(z / (np.sqrt(2 * np.pi) * 0.3))

    got = get_log_wrapped_gaussians(jnp.asarray(x), jnp.asarray(sigmas), kmax)
    # fp32 exp/log accumulation over (atoms x dims x k) terms: ~1e-3 agreement
    # against the float64 oracle is the expected precision.
    np.testing.assert_allclose(np.asarray(got), expected, rtol=3e-3, atol=1e-4)
