"""Schedule-derived reheat calibration (sampling/reheat_calibration.py).

Validates the harmonic-mode variance recursion, the score-gain measurement,
and the closed loop: a synthetic over-contracting score (alpha > 1) produces
a cold quench whose calibrated noise_temperature restores the data width.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_for_multi_scale_molecular_dynamics_tpu.namespace import (
    NOISE,
    NOISY_AXL_COMPOSITION,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.noise_schedulers import (
    NoiseParameters,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.sampling.reheat_calibration import (
    calibrate_reheat,
    measured_mode_std,
    measured_score_gain,
    terminal_std_ratio,
)

SI_PRODUCTION = NoiseParameters(
    total_time_steps=1000,
    sigma_min=1e-4,
    sigma_max=0.2,
    schedule_type="linear",
    corrector_step_epsilon=2.5e-8,
)
SI_MODE_STD = 0.0054  # Si 2x2x2, 300 K, COM-free (measured from the dataset)


def test_exact_score_is_nearly_unbiased():
    """With the exact harmonic score the PC chain lands within a few percent
    of the data width — the cold quench is NOT a schedule artifact."""
    ratio = terminal_std_ratio(SI_PRODUCTION, 3, SI_MODE_STD)
    assert 0.95 < ratio < 1.10


def test_overcontracting_score_quenches_and_calibration_undoes_it():
    """alpha > 1 quenches toward sqrt(1/alpha); the calibrated windowed tau
    restores ratio 1 and sits near sqrt(alpha) (stationary-limit value)."""
    alpha = 1.45
    gain = lambda sigma: alpha  # noqa: E731
    quenched = terminal_std_ratio(SI_PRODUCTION, 3, SI_MODE_STD, score_gain=gain)
    assert quenched < 0.92
    np.testing.assert_allclose(quenched, 1.0 / np.sqrt(alpha), rtol=0.05)

    calibration = calibrate_reheat(
        SI_PRODUCTION, 3, SI_MODE_STD, score_gain=gain
    )
    assert abs(calibration.calibrated_ratio - 1.0) < 1e-3
    np.testing.assert_allclose(
        calibration.noise_temperature, np.sqrt(alpha), rtol=0.05
    )
    # The default window matches the empirically stable Si window (~0.02).
    assert 0.015 < calibration.temperature_sigma_max < 0.025


def test_calibration_monotone_in_alpha():
    taus = [
        calibrate_reheat(
            SI_PRODUCTION, 3, SI_MODE_STD, score_gain=lambda s, a=a: a
        ).noise_temperature
        for a in (1.0, 1.2, 1.5)
    ]
    assert taus[0] == pytest.approx(1.0, abs=0.03)
    assert taus[0] < taus[1] < taus[2]


def test_measured_mode_std_recovers_synthetic_width():
    rng = np.random.default_rng(0)
    sites = rng.uniform(size=(16, 3))
    s = 0.006
    frames = sites[None] + s * rng.standard_normal((400, 16, 3))
    # Add COM drift that must be projected out.
    frames += 0.03 * rng.standard_normal((400, 1, 3))
    measured = measured_mode_std(frames % 1.0)
    expected = s * np.sqrt(15.0 / 16.0)  # COM removal eats 1/N of variance
    np.testing.assert_allclose(measured, expected, rtol=0.05)


def test_measured_score_gain_recovers_synthetic_alpha():
    """A linear 'network' with known gain alpha is recovered by the fit."""
    rng = np.random.default_rng(1)
    natoms, frames, s, sigma, alpha_true = 8, 200, 0.006, 0.004, 1.37
    sites = rng.uniform(size=(natoms, 3))
    x0 = (sites[None] + s * rng.standard_normal((frames, natoms, 3))) % 1.0
    mode_std = s * np.sqrt((natoms - 1) / natoms)  # COM removal eats 1/N
    variance = mode_std**2 + sigma**2
    sites_j = jnp.asarray(sites)

    def network(batch):
        # Translation-equivariant linear score with gain alpha_true on the
        # COM-free displacement (real score networks have no COM component).
        x_t = batch[NOISY_AXL_COMPOSITION].X
        sig = batch[NOISE][0, 0]
        d = x_t - sites_j[None]
        d -= jnp.round(d)
        d -= d.mean(axis=1, keepdims=True)
        from types import SimpleNamespace

        return SimpleNamespace(X=-alpha_true * sig * d / variance)

    alpha = measured_score_gain(
        network,
        x0,
        atom_types=np.zeros(natoms, np.int32),
        lattice_parameters=np.array([5.43, 5.43, 5.43, 0.0, 0.0, 0.0]),
        sigma=sigma,
        time=0.02,
        mode_std=mode_std,
        key=jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(alpha, alpha_true, rtol=0.08)
