"""Corrector-stability guard in build_noise_schedule (round-4 repaint
root cause: eps ~ 1000 sigma^2 from a sigma_min-mismatched epsilon)."""
import logging

from diffusion_for_multi_scale_molecular_dynamics_tpu.noise_schedulers import (
    NoiseParameters,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.noise_schedulers.noise_schedule import (
    build_noise_schedule,
)


def test_unstable_corrector_epsilon_warns(caplog):
    with caplog.at_level(logging.WARNING):
        build_noise_schedule(
            NoiseParameters(
                total_time_steps=10, sigma_min=1e-4, sigma_max=0.2,
                corrector_step_epsilon=2e-5,
            ),
            2,
        )
    assert any("diverges" in r.message for r in caplog.records)


def test_stable_corrector_epsilon_silent(caplog):
    with caplog.at_level(logging.WARNING):
        build_noise_schedule(
            NoiseParameters(
                total_time_steps=10, sigma_min=1e-4, sigma_max=0.2,
                corrector_step_epsilon=2.5e-8,
            ),
            2,
        )
    assert not any("diverges" in r.message for r in caplog.records)


def test_auto_corrector_epsilon_resolves_from_sigma_min(caplog):
    """'auto' (the default) derives eps = 2.5 sigma_min^2 at schedule build —
    reproducing the production-calibrated 2.5e-8 at sigma_min=1e-4, always
    inside the ULA stability bound, for every sigma_min (VERDICT r4 #6)."""
    import numpy as np

    for sigma_min in (1e-4, 1e-3, 5e-3):
        params = NoiseParameters(
            total_time_steps=10, sigma_min=sigma_min, sigma_max=0.2
        )
        assert params.corrector_step_epsilon == "auto"
        resolved = params.resolve_corrector_step_epsilon()
        np.testing.assert_allclose(resolved, 2.5 * sigma_min**2)
        with caplog.at_level(logging.WARNING):
            schedule = build_noise_schedule(params, 2)
        assert not any("diverges" in r.message for r in caplog.records)
        # Tabulated eps_i must sit under the bound 2 sigma_i^2 everywhere.
        eps_i = np.asarray(schedule.langevin.epsilon)
        sigma = np.asarray(schedule.noise.sigma)
        prev_sigma = np.concatenate([[sigma_min], sigma[:-1]])
        assert (eps_i <= 2.0 * prev_sigma**2 + 1e-30).all()


def test_explicit_epsilon_path_unchanged():
    """Floats keep the reference-exact tabulation (golden tests rely on it)."""
    import numpy as np

    auto = NoiseParameters(total_time_steps=10, sigma_min=1e-4, sigma_max=0.2)
    explicit = NoiseParameters(
        total_time_steps=10, sigma_min=1e-4, sigma_max=0.2,
        corrector_step_epsilon=2.5e-8,
    )
    a = build_noise_schedule(auto, 2).langevin.epsilon
    b = build_noise_schedule(explicit, 2).langevin.epsilon
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
