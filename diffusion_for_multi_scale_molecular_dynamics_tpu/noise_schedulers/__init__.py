"""Noise process tables: sigma schedules, variance scheduler, D3PM Q matrices."""

from .noise_parameters import NoiseParameters
from .noise_schedule import (
    LangevinDynamics,
    Noise,
    NoiseSchedule,
    build_noise_schedule,
    get_noise_at_indices,
)

__all__ = [
    "NoiseParameters",
    "Noise",
    "NoiseSchedule",
    "LangevinDynamics",
    "build_noise_schedule",
    "get_noise_at_indices",
]
