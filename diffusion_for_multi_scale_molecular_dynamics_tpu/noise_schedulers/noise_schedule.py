r"""Precomputed noise tables for training and sampling.

One pure builder produces every schedule-derived array once; afterwards both
the (jitted) training noising transform and the (scanned) samplers only ever
*gather* from these tables, so the whole noise process lives on-device as
constants folded into the compiled programs.

Index conventions follow the reference exactly
(src/diffusion_for_multi_scale_molecular_dynamics/noise_schedulers/noise_scheduler.py:91-109):

  * the abstract time index i runs 1..N with t_1 = time_delta, t_N = 1;
  * arrays are zero-based, so quantity_i lives at array[i-1];
  * epsilon / sqrt_2_epsilon are the exception: epsilon[i] = eps_i for
    i = 0..N-1 (eps_0 is needed by the corrector), with
    eps_i = 0.5 * corrector_step_epsilon * sigma_i^2 / sigma_1^2 and
    sigma_0 := sigma_min;
  * g^2_i = sigma_i^2 - sigma_{i-1}^2 with sigma_0 := sigma_min;
  * VP side: beta_t = 1/(N - t + 1), alpha_bar = cumprod(1 - beta),
    Q_t = (1 - beta_t) I + beta_t 1 e_M^T (absorbing MASK state),
    Qbar_t = Q_1 ... Q_t, Qbar_{t-1} with identity at t = 1.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .noise_parameters import NoiseParameters
from .sigma_calculator import get_sigma_functions


class Noise(NamedTuple):
    """Noise-process quantities, either full tables or gathered per-sample."""

    time: jnp.ndarray
    sigma: jnp.ndarray
    sigma_squared: jnp.ndarray
    g: jnp.ndarray
    g_squared: jnp.ndarray
    beta: jnp.ndarray
    alpha_bar: jnp.ndarray
    q_matrix: jnp.ndarray
    q_bar_matrix: jnp.ndarray
    q_bar_tm1_matrix: jnp.ndarray
    indices: jnp.ndarray


class LangevinDynamics(NamedTuple):
    """Corrector-step Langevin step sizes, indexed 0..N-1."""

    epsilon: jnp.ndarray
    sqrt_2_epsilon: jnp.ndarray


class NoiseSchedule(NamedTuple):
    """All noise tables; a pytree of jnp arrays (safe to close over in jit)."""

    noise: Noise
    langevin: LangevinDynamics
    num_classes: int
    total_time_steps: int
    sigma_min: float


def _build_q_matrices(beta: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Absorbing-state D3PM transition matrices, [N, C, C].

    Q_t[i, j] = (1 - beta_t) delta_ij + beta_t delta_{j, MASK}.
    """
    eye = jnp.eye(num_classes)
    mask_column = jnp.zeros((num_classes, num_classes)).at[:, -1].set(1.0)
    return (1.0 - beta)[:, None, None] * eye + beta[:, None, None] * mask_column


def build_noise_schedule(
    noise_parameters: NoiseParameters, num_classes: int
) -> NoiseSchedule:
    """Build every noise table from the hyperparameters (host-side, once)."""
    n = noise_parameters.total_time_steps
    sigma_min = noise_parameters.sigma_min

    sigma_fn, _, _ = get_sigma_functions(
        noise_parameters.schedule_type,
        sigma_min,
        noise_parameters.sigma_max,
    )

    time = jnp.linspace(noise_parameters.time_delta, 1.0, n)
    sigma = sigma_fn(time)
    sigma_squared = sigma**2

    # g^2_i = sigma_i^2 - sigma_{i-1}^2, sigma_0 := sigma_min.
    prev_sigma_squared = jnp.concatenate(
        [jnp.array([sigma_min**2]), sigma_squared[:-1]]
    )
    g_squared = sigma_squared - prev_sigma_squared
    g = jnp.sqrt(g_squared)

    # eps_i = 0.5 * eps * sigma_i^2 / sigma_1^2, i = 0..N-1 (sigma_0 := sigma_min).
    eps = noise_parameters.resolve_corrector_step_epsilon()
    epsilon = 0.5 * eps * prev_sigma_squared / sigma_squared[0]
    sqrt_2_epsilon = jnp.sqrt(2.0 * epsilon)

    # Corrector-stability guard: eps_i / sigma_i^2 = 0.5 eps / sigma_1^2 is
    # constant across the table; unadjusted Langevin on a Gaussian mode of
    # width ~sigma_i diverges when that ratio exceeds 2 (|1 - eps/sigma^2|
    # > 1). corrector_step_epsilon is calibrated against sigma_min — the
    # reference default 2e-5 assumes its sigma_min=0.005 and silently turns
    # divergent when a config tightens sigma_min (at 1e-4 the ratio is 1000:
    # the round-4 repaint-collapse root cause). Warn loudly instead.
    stability_ratio = float(0.5 * eps / float(sigma_squared[0]))
    if stability_ratio > 2.0:
        import logging

        logging.getLogger(__name__).warning(
            "corrector_step_epsilon=%.3g with sigma_min=%.3g gives corrector "
            "steps eps_i = %.0f * sigma_i^2 — overdamped-Langevin diverges "
            "above eps_i = 2 sigma_i^2, so every corrector substep will "
            "scramble, not equilibrate. Set corrector_step_epsilon below "
            "%.3g (production configs use 2.5e-8 with sigma_min=1e-4).",
            eps,
            sigma_min,
            stability_ratio,
            4.0 * float(sigma_squared[0]),
        )

    # Variance-preserving side for atom-type diffusion.
    beta = 1.0 / (n - jnp.arange(1, n + 1) + 1.0)
    alpha_bar = jnp.cumprod(1.0 - beta)

    q_matrix = _build_q_matrices(beta, num_classes)
    # Cumulative products Qbar_t = Q_1 ... Q_t via a parallel associative scan
    # (left-to-right matmul order preserved).
    q_bar_matrix = jax.lax.associative_scan(
        lambda a, b: jnp.einsum(
            "...ij,...jk->...ik", a, b, precision=jax.lax.Precision.HIGHEST
        ),
        q_matrix,
        axis=0,
    )
    q_bar_tm1_matrix = jnp.concatenate(
        [jnp.eye(num_classes)[None], q_bar_matrix[:-1]], axis=0
    )

    noise = Noise(
        time=time,
        sigma=sigma,
        sigma_squared=sigma_squared,
        g=g,
        g_squared=g_squared,
        beta=beta,
        alpha_bar=alpha_bar,
        q_matrix=q_matrix,
        q_bar_matrix=q_bar_matrix,
        q_bar_tm1_matrix=q_bar_tm1_matrix,
        indices=jnp.arange(n),
    )
    langevin = LangevinDynamics(epsilon=epsilon, sqrt_2_epsilon=sqrt_2_epsilon)

    return NoiseSchedule(
        noise=noise,
        langevin=langevin,
        num_classes=num_classes,
        total_time_steps=n,
        sigma_min=sigma_min,
    )


def get_noise_at_indices(noise: Noise, indices: jnp.ndarray) -> Noise:
    """Gather per-sample noise quantities from the full tables.

    Args:
        noise: full tables (arrays of leading dimension N).
        indices: integer array, any shape (typically [batch]).

    Returns:
        Noise with each field gathered at ``indices``; matrix fields pick up
        trailing [C, C] axes.
    """
    return Noise(
        time=noise.time[indices],
        sigma=noise.sigma[indices],
        sigma_squared=noise.sigma_squared[indices],
        g=noise.g[indices],
        g_squared=noise.g_squared[indices],
        beta=noise.beta[indices],
        alpha_bar=noise.alpha_bar[indices],
        q_matrix=noise.q_matrix[indices],
        q_bar_matrix=noise.q_bar_matrix[indices],
        q_bar_tm1_matrix=noise.q_bar_tm1_matrix[indices],
        indices=indices,
    )


def sample_random_time_indices(key, schedule: NoiseSchedule, shape) -> jnp.ndarray:
    """Uniform random time-step indices in [0, N)."""
    return jax.random.randint(key, shape, 0, schedule.total_time_steps)
