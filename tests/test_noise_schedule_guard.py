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
