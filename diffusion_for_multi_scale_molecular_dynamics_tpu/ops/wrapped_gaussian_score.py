r"""Sigma-normalized score of the wrapped Gaussian (torus perturbation kernel).

The wrapped Gaussian kernel is

    K(u) ~ sum_{k in Z} exp[-(u + k)^2 / (2 sigma^2)],   u in [0, 1),

and the quantity computed here is sigma * d/du log K(u) (the
"sigma-normalized score"), which is the training target for relative
coordinates.

Numerical strategy (same three-regime stabilization as the reference,
src/diffusion_for_multi_scale_molecular_dynamics/score/wrapped_gaussian_score.py:131-419,
rebuilt branchlessly for XLA):

  * regime 1a — sigma <= 1/sqrt(2 pi), u < 1/2: real-space sum with the k=0
    term factored out, exp[-(k^2 + 2uk)/(2 sigma^2)];
  * regime 1b — sigma <= 1/sqrt(2 pi), u >= 1/2: the k=-1 term factored out,
    exp[-((k^2-1) + 2u(k+1))/(2 sigma^2)];
  * regime 2 — sigma > 1/sqrt(2 pi): Poisson-resummed ("Ewald") form that
    converges fast for large sigma.

Instead of boolean-mask gathers (jit-hostile dynamic shapes), all three
formulas are evaluated on *sanitized* inputs — each regime's inputs are
clamped into its numerically safe domain before evaluation — and the result
is selected with jnp.where. This is the standard "double-where" pattern: the
unselected lanes never produce inf/nan, so both values and gradients stay
finite.
"""

import math

import jax.numpy as jnp
import numpy as np

SIGMA_THRESHOLD = 1.0 / math.sqrt(2.0 * math.pi)
U_THRESHOLD = 0.5


def get_sigma_normalized_score_brute_force(u, sigma, kmax=None):
    """Slow, obviously-correct reference implementation (host-side numpy).

    Only converges when summed far enough; used by tests as ground truth
    (mirrors the brute-force oracle the reference ships for its own tests).
    """
    if kmax is None:
        kmax = max(1, int(round(10 * sigma)))
    z = 0.0
    sigma2_derivative_z = 0.0
    for k in np.arange(-kmax, kmax + 1):
        upk = u + k
        e = np.exp(-0.5 * upk**2 / sigma**2)
        z += e
        sigma2_derivative_z += -upk * e
    return sigma2_derivative_z / z / sigma


def get_log_wrapped_gaussians(
    relative_coordinates: jnp.ndarray, sigmas: jnp.ndarray, kmax: int
) -> jnp.ndarray:
    """Log of the wrapped Gaussian density, summed over atoms and dimensions.

    Args:
        relative_coordinates: [..., natoms, d], values in [0, 1).
        sigmas: same shape as relative_coordinates.
        kmax: the image sum runs over k in [-kmax, kmax].

    Returns:
        log densities with the last two axes (atoms, dimensions) summed out,
        shape [...].
    """
    list_k = jnp.arange(-kmax, kmax + 1, dtype=relative_coordinates.dtype)
    u = relative_coordinates[..., None]
    sig = sigmas[..., None]
    exponentials = -0.5 * (u + list_k) ** 2 / sig**2
    log_norm = jnp.log(jnp.sqrt(2.0 * jnp.pi) * sigmas)
    log_gaussians = jax_logsumexp(exponentials) - log_norm
    return jnp.sum(log_gaussians, axis=(-2, -1))


def jax_logsumexp(x):
    """logsumexp over the last axis (small helper, keeps imports local)."""
    m = jnp.max(x, axis=-1, keepdims=True)
    return jnp.squeeze(m, -1) + jnp.log(jnp.sum(jnp.exp(x - m), axis=-1))


def _score_small_sigma(u, sigma, list_k, shift_k: bool):
    """Real-space regimes 1a (shift_k=False) and 1b (shift_k=True).

    sigma^2 * score = -u - sum_k k e_k / sum_k e_k, with the dominant term
    of the image sum factored out of the exponentials so every exponent is
    <= 0 on the regime's domain.
    """
    u_col = u[..., None]
    sig_col = sigma[..., None]
    if shift_k:
        exponent = -0.5 * ((list_k**2 - 1.0) + 2.0 * u_col * (list_k + 1.0)) / sig_col**2
    else:
        exponent = -0.5 * (list_k**2 + 2.0 * u_col * list_k) / sig_col**2
    exponential = jnp.exp(exponent)
    numerator = jnp.sum(list_k * exponential, axis=-1)
    denominator = jnp.sum(exponential, axis=-1)
    sigma2_score = -u - numerator / denominator
    return sigma2_score / sigma


def _score_large_sigma(u, sigma, list_k):
    """Poisson-resummed regime 2 (fast convergence for sigma > 1/sqrt(2 pi))."""
    pi = jnp.pi
    u_col = u[..., None]
    sig_col = sigma[..., None]

    upk = u_col + list_k
    gu = u_col * list_k
    sigma_g = sig_col * list_k
    g = jnp.broadcast_to(list_k, upk.shape)
    sig = jnp.broadcast_to(sig_col, upk.shape)

    exp_upk = jnp.exp(-pi * upk**2)
    exp_sigma_g = jnp.exp(-2.0 * pi**2 * sigma_g**2)
    exp_g = jnp.exp(-pi * g**2)

    g_exponential_combination = jnp.sqrt(2.0 * pi) * sig * exp_sigma_g - exp_g

    cos = jnp.cos(2.0 * pi * gu)
    sin = jnp.sin(2.0 * pi * gu)

    z2 = jnp.sum(exp_upk, axis=-1) + jnp.sum(g_exponential_combination * cos, axis=-1)
    deriv_z2 = -2.0 * pi * (
        jnp.sum(upk * exp_upk, axis=-1)
        + jnp.sum(g * g_exponential_combination * sin, axis=-1)
    )
    return sigma * deriv_z2 / z2


def get_coordinates_sigma_normalized_score(
    relative_coordinates: jnp.ndarray,
    sigmas: jnp.ndarray,
    kmax: int,
) -> jnp.ndarray:
    """Branchless sigma-normalized wrapped-Gaussian score.

    Args:
        relative_coordinates: u in [0, 1), arbitrary shape.
        sigmas: positive, same shape as relative_coordinates.
        kmax: image sum over k in [-kmax, kmax] (static).

    Returns:
        sigma * score, same shape as the inputs.
    """
    dtype = relative_coordinates.dtype
    list_k = jnp.arange(-kmax, kmax + 1, dtype=dtype)

    u = relative_coordinates
    sigma = sigmas

    small_sigma = sigma <= SIGMA_THRESHOLD
    small_u = u < U_THRESHOLD

    # Sanitize inputs per regime so the unselected lanes stay finite.
    sigma_small = jnp.where(small_sigma, sigma, SIGMA_THRESHOLD)
    sigma_large = jnp.where(small_sigma, SIGMA_THRESHOLD, sigma)
    u_1a = jnp.where(small_u, u, 0.0)
    u_1b = jnp.where(small_u, 0.75, u)

    s1a = _score_small_sigma(u_1a, sigma_small, list_k, shift_k=False)
    s1b = _score_small_sigma(u_1b, sigma_small, list_k, shift_k=True)
    s2 = _score_large_sigma(u, sigma_large, list_k)

    s1 = jnp.where(small_u, s1a, s1b)
    return jnp.where(small_sigma, s1, s2)
