r"""Derive the reheat temperature (and window) from the noise schedule.

Annealed-Langevin predictor-corrector sampling systematically *quenches* a
thermal ensemble: the finite-step chain ends colder than the data it was
trained on (round-2 diagnosis: Si 2x2x2 sampled at an effective ~250 K from
300 K data; experiments/si_2x2x2_round2_results.md). The fix is the
sigma-windowed reheat (``noise_temperature`` applied where
sigma <= ``temperature_sigma_max``), but round 2 calibrated its value by a
per-system sample sweep. This module predicts it from first principles, so a
new system needs no sweep.

Round-3 measurement (experiments/reheat_si.json): the trained Si 2x2x2
score's gain alpha(sigma) is 0.97-1.04 across the freeze-out window, so this
linear recursion predicts an *unbiased* chain (terminal ratio 0.9985) — yet
the empirical quench needed tau ~ 1.22 (round-2 sweep), and the response to
tau is itself nonlinear (tau=1.05 left the mean energy unmoved). Conclusion:
the quench is driven by the learned score's nonlinearity (stiffening beyond
typical displacements), not by its linear gain or by the schedule. The
recursion below remains the correct *linear-response diagnostic*; the
production calibration is the empirical bracketing probe
(experiments/probe_reheat.py — 3-5 sixty-four-sample runs on the measured
effective temperature), which this module's window default feeds.

Model: one effective harmonic mode of the data with per-coordinate standard
deviation ``mode_std`` (fractional units, COM motion removed — the
energy-carrying internal displacements). Under the VE forward process the
time-t marginal is N(0, s^2 + sigma_t^2) with exact sigma-normalized score
-sigma x / (s^2 + sigma^2), so every predictor/corrector update
(generators/langevin_generator.py) is *linear* in x and the sampled variance
obeys a closed recursion:

    predictor i:  v <- (1 - alpha_i g_i^2 / (s^2 + sigma_i^2))^2 v
                       + (tau_i g_i)^2
    corrector i:  v <- (1 - alpha_i eps_i / (s^2 + sigma_c^2))^2 v
                       + (T_c tau_i)^2 2 eps_i            (x n_correctors)

iterated down the exact schedule tables (sigma, g, eps come straight from
``build_noise_schedule``; sigma_c is the corrector's shifted table with the
i=0 extrapolation to sigma_min). No stationarity assumption: the recursion
captures exactly how far the finitely-many in-window steps get. The
calibration solves for the windowed ``noise_temperature`` tau that makes the
terminal standard deviation match the data's (bisection; the terminal std is
monotone in tau).

``alpha_i = score_gain(sigma_i)`` is the *learned* score's gain relative to
the exact harmonic score. With an exact score (alpha = 1) the recursion
shows the PC chain is nearly unbiased (terminal ratio ~1.02 at the Si
production settings) — the observed cold quench is a property of the trained
network, not the schedule: regression toward the lattice sites makes the
predicted score over-contract at small sigma (alpha > 1), and the corrector
equilibrates each mode to ~ (s^2 + sigma^2) tau^2 / alpha. So the chain's
effective temperature deficit is alpha(sigma_freeze), and the calibration
needs alpha measured once per checkpoint: :func:`measured_score_gain` fits
alpha(sigma) = -<s_model . d> (s^2+sigma^2) / (sigma <|d|^2>) over noised
validation frames (a handful of network forwards — hundreds of times cheaper
than the 64-sample-per-point temperature sweeps it replaces).

The window itself sits at the freeze-out scale: reheating is only safe once
sigma is at the thermal-displacement scale (larger-sigma noise kicks atoms
between wells — the hot-tail failure of unwindowed reheating mapped in round
2). Default: ``temperature_sigma_max = 3.5 * mode_std``, matching the
empirically stable 0.02 window for Si 2x2x2 (mode_std 0.0054).

The reference has no counterpart (its sampler runs reference-default
temperatures: src/diffusion_for_multi_scale_molecular_dynamics/generators/
langevin_generator.py); this is a beyond-reference fidelity knob with its
calibration automated.
"""

import dataclasses
import math
from typing import Optional

import numpy as np

from ..noise_schedulers import build_noise_schedule

_WINDOW_OVER_MODE_STD = 3.5


@dataclasses.dataclass(frozen=True)
class ReheatCalibration:
    """Result of :func:`calibrate_reheat`."""

    noise_temperature: float
    temperature_sigma_max: float
    mode_std: float
    # Terminal sampled-std / data-std before (tau=1) and after calibration.
    quench_ratio: float
    calibrated_ratio: float

    @property
    def effective_temperature_ratio(self) -> float:
        """T_quench / T_data implied by the un-reheated chain (harmonic)."""
        return self.quench_ratio**2


def measured_mode_std(relative_coordinates: np.ndarray) -> float:
    """Per-coordinate internal displacement std from data frames.

    Args:
        relative_coordinates: [frames, natoms, d] fractional coordinates of
            one MD run (consistent atom ordering).

    Removes the per-atom mean site (circular mean, wrap-safe) and the
    per-frame center-of-mass drift: COM motion carries no potential energy,
    and including it would overestimate the thermal scale several-fold.
    """
    x = np.asarray(relative_coordinates, dtype=np.float64)
    angles = np.exp(2j * np.pi * x)
    mean_site = np.angle(angles.mean(axis=0)) / (2.0 * np.pi)
    displacement = x - mean_site[None]
    displacement -= np.round(displacement)
    displacement -= displacement.mean(axis=1, keepdims=True)
    return float(displacement.std())


def terminal_std_ratio(
    noise_parameters,
    number_of_corrector_steps: int,
    mode_std: float,
    noise_temperature: float = 1.0,
    temperature_sigma_max: float = math.inf,
    corrector_temperature: float = 1.0,
    score_gain=None,
) -> float:
    """Terminal sampled-std / data-std of the harmonic-mode PC recursion.

    ``score_gain``: callable sigma -> alpha, the trained network's score
    magnitude relative to the exact harmonic score (1.0 = exact; see
    :func:`measured_score_gain`). Default: exact score.
    """
    schedule = build_noise_schedule(noise_parameters, num_classes=2)
    sigma = np.asarray(schedule.noise.sigma, dtype=np.float64)
    g = np.asarray(schedule.noise.g, dtype=np.float64)
    g_squared = np.asarray(schedule.noise.g_squared, dtype=np.float64)
    epsilon = np.asarray(schedule.langevin.epsilon, dtype=np.float64)
    corrector_sigma = np.concatenate([[noise_parameters.sigma_min], sigma[:-1]])
    if score_gain is None:
        score_gain = lambda s: 1.0  # noqa: E731

    s2 = float(mode_std) ** 2
    v = s2 + sigma[-1] ** 2
    for i in range(len(sigma) - 1, -1, -1):
        tau_p = noise_temperature if sigma[i] <= temperature_sigma_max else 1.0
        alpha_p = float(score_gain(sigma[i]))
        shrink = 1.0 - alpha_p * g_squared[i] / (s2 + sigma[i] ** 2)
        v = shrink**2 * v + (tau_p * g[i]) ** 2

        sigma_c = corrector_sigma[i]
        tau_c = noise_temperature if sigma_c <= temperature_sigma_max else 1.0
        alpha_c = float(score_gain(sigma_c))
        for _ in range(number_of_corrector_steps):
            shrink = 1.0 - alpha_c * epsilon[i] / (s2 + sigma_c**2)
            v = shrink**2 * v + (corrector_temperature * tau_c) ** 2 * 2.0 * epsilon[i]
    return float(np.sqrt(v / s2))


def measured_score_gain(
    axl_network,
    relative_coordinates: np.ndarray,
    atom_types: np.ndarray,
    lattice_parameters: np.ndarray,
    sigma: float,
    time: float,
    mode_std: float,
    key,
    num_noise_draws: int = 4,
) -> float:
    """Measure the trained score's gain alpha at one noise level.

    Noises ``relative_coordinates`` (clean validation frames, [F, N, d],
    consistent atom ordering) to x_t = wrap(x0 + sigma z), runs the network,
    and regresses the predicted sigma-normalized score onto the exact
    harmonic score direction -(x_t - mean_site):

        alpha = -<s_model . d> (s^2 + sigma^2) / (sigma <|d|^2>),

    d = COM-free wrapped displacement from the per-atom mean sites. COM
    components carry no information (the data's COM marginal is uniform, so
    both the exact and any translation-equivariant learned score vanish
    there) and are projected out of d.

    Returns a scalar alpha; 1.0 means the network matches the exact harmonic
    score at this sigma, >1 over-contraction (the cold-quench driver).
    """
    import jax
    import jax.numpy as jnp

    from ..namespace import (
        AXL,
        CARTESIAN_FORCES,
        NOISE,
        NOISY_AXL_COMPOSITION,
        TIME,
    )

    x0 = jnp.asarray(relative_coordinates)
    frames, natoms, d = x0.shape
    angles = np.exp(2j * np.pi * np.asarray(relative_coordinates, np.float64))
    mean_site = jnp.asarray(np.angle(angles.mean(axis=0)) / (2.0 * np.pi))

    a = jnp.asarray(atom_types, dtype=jnp.int32)
    if a.ndim == 1:
        a = jnp.broadcast_to(a[None], (frames, natoms))
    lattice = jnp.asarray(lattice_parameters)
    if lattice.ndim == 1:
        lattice = jnp.broadcast_to(lattice[None], (frames, lattice.shape[-1]))

    variance = float(mode_std) ** 2 + float(sigma) ** 2
    num, den = 0.0, 0.0
    for _ in range(num_noise_draws):
        key, key_z = jax.random.split(key)
        z = jax.random.normal(key_z, x0.shape, x0.dtype)
        x_t = (x0 + sigma * z) % 1.0
        batch = {
            NOISY_AXL_COMPOSITION: AXL(A=a, X=x_t, L=lattice),
            TIME: jnp.full((frames, 1), time, x0.dtype),
            NOISE: jnp.full((frames, 1), sigma, x0.dtype),
            CARTESIAN_FORCES: jnp.zeros_like(x_t),
        }
        scores = axl_network(batch).X
        displacement = x_t - mean_site[None]
        displacement -= jnp.round(displacement)
        displacement -= displacement.mean(axis=1, keepdims=True)
        num += float(jnp.sum(scores * displacement))
        den += float(jnp.sum(displacement**2))
    return -num * variance / (float(sigma) * den)


def calibrate_reheat(
    noise_parameters,
    number_of_corrector_steps: int,
    mode_std: float,
    temperature_sigma_max: Optional[float] = None,
    corrector_temperature: float = 1.0,
    tolerance: float = 1e-4,
    score_gain=None,
) -> ReheatCalibration:
    """Solve for the windowed noise_temperature that undoes the quench.

    Returns the calibration with ``noise_temperature`` such that the
    harmonic-mode terminal std equals the data std (ratio 1), with the
    window defaulted to 3.5 x mode_std. Pass ``score_gain`` (sigma -> alpha,
    e.g. interpolated from :func:`measured_score_gain` points) to account
    for the trained network's bias — with the default exact score the
    recursion is nearly unbiased and tau stays ~1.
    """
    window = (
        temperature_sigma_max
        if temperature_sigma_max is not None
        else _WINDOW_OVER_MODE_STD * float(mode_std)
    )

    def ratio(tau: float) -> float:
        return terminal_std_ratio(
            noise_parameters,
            number_of_corrector_steps,
            mode_std,
            noise_temperature=tau,
            temperature_sigma_max=window,
            corrector_temperature=corrector_temperature,
            score_gain=score_gain,
        )

    quench_ratio = ratio(1.0)
    low, high = 1.0, 1.0
    if quench_ratio < 1.0:
        while ratio(high) < 1.0:
            high *= 1.5
            assert high < 16.0, "reheat calibration failed to bracket tau"
    else:
        while ratio(low) > 1.0 and low > 1.0 / 16.0:
            low /= 1.5
        # Mirror the hot-branch guard: exiting on the 1/16 floor without a
        # sign change means no tau quenches this schedule/score — bisecting
        # an unbracketed interval would silently return the floor.
        assert ratio(low) <= 1.0, "reheat calibration failed to bracket tau"
    for _ in range(64):
        mid = 0.5 * (low + high)
        if ratio(mid) < 1.0:
            low = mid
        else:
            high = mid
        if high - low < tolerance:
            break
    tau = 0.5 * (low + high)
    return ReheatCalibration(
        noise_temperature=float(tau),
        temperature_sigma_max=float(window),
        mode_std=float(mode_std),
        quench_ratio=float(quench_ratio),
        calibrated_ratio=float(ratio(tau)),
    )
