"""sigma(t) schedules and their analytic time derivatives.

Pure functions of (t, sigma_min, sigma_max); dispatch happens once at
configuration time, so nothing here branches inside jit.

(reference: src/diffusion_for_multi_scale_molecular_dynamics/noise_schedulers/sigma_calculator.py,
exploding_variance.py)
"""

import math
from typing import Callable, Tuple

import jax.numpy as jnp


def exponential_sigma(times, sigma_min: float, sigma_max: float):
    """sigma(t) = sigma_min * (sigma_max / sigma_min)^t."""
    ratio = sigma_max / sigma_min
    return sigma_min * ratio**times


def exponential_sigma_time_derivative(times, sigma_min: float, sigma_max: float):
    """d sigma / dt for the exponential schedule."""
    return math.log(sigma_max / sigma_min) * exponential_sigma(
        times, sigma_min, sigma_max
    )


def linear_sigma(times, sigma_min: float, sigma_max: float):
    """sigma(t) = sigma_min + (sigma_max - sigma_min) * t."""
    return sigma_min + (sigma_max - sigma_min) * times


def linear_sigma_time_derivative(times, sigma_min: float, sigma_max: float):
    """d sigma / dt for the linear schedule."""
    return (sigma_max - sigma_min) * jnp.ones_like(times)


_SCHEDULES = {
    "exponential": (exponential_sigma, exponential_sigma_time_derivative),
    "linear": (linear_sigma, linear_sigma_time_derivative),
}


def get_sigma_functions(
    schedule_type: str, sigma_min: float, sigma_max: float
) -> Tuple[Callable, Callable, Callable]:
    """Return (sigma, d sigma/dt, g^2) as closures over the hyperparameters.

    g(t)^2 = d sigma^2(t) / dt = 2 sigma(t) sigma'(t) is the squared SDE
    diffusion coefficient of the exploding-variance process.
    """
    if schedule_type not in _SCHEDULES:
        raise NotImplementedError(
            f"The schedule type {schedule_type} is not implemented"
        )
    sigma_fn_raw, sigma_dot_fn_raw = _SCHEDULES[schedule_type]

    def sigma_fn(times):
        return sigma_fn_raw(times, sigma_min, sigma_max)

    def sigma_dot_fn(times):
        return sigma_dot_fn_raw(times, sigma_min, sigma_max)

    def g_squared_fn(times):
        return 2.0 * sigma_fn(times) * sigma_dot_fn(times)

    return sigma_fn, sigma_dot_fn, g_squared_fn
