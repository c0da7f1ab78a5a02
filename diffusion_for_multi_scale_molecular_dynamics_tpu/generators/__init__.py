"""Samplers: predictor-corrector Langevin, adaptive, ODE/SDE, constrained (RePaint)."""

from .axl_generator import AXLGenerator, SamplingParameters
from .predictor_corrector_axl_generator import PredictorCorrectorSamplingParameters
from .langevin_generator import LangevinGenerator
from .adaptive_corrector import AdaptiveCorrectorGenerator
from .constrained_langevin_generator import ConstrainedLangevinGenerator
from .instantiate_generator import instantiate_generator, load_sampling_parameters
from .ode_position_generator import (
    ExplodingVarianceODEAXLGenerator,
    ODESamplingParameters,
)
from .sampling_constraint import (
    SamplingConstraint,
    read_sampling_constraint,
    write_sampling_constraint,
)
from .sde_position_generator import (
    ExplodingVarianceSDEPositionGenerator,
    SDESamplingParameters,
)
from .trajectory_initializer import (
    FullRandomTrajectoryInitializer,
    StartFromGivenConfigurationTrajectoryInitializer,
    TrajectoryInitializer,
    TrajectoryInitializerParameters,
    instantiate_trajectory_initializer,
)

__all__ = [
    "AXLGenerator",
    "ConstrainedLangevinGenerator",
    "ExplodingVarianceODEAXLGenerator",
    "ExplodingVarianceSDEPositionGenerator",
    "ODESamplingParameters",
    "SDESamplingParameters",
    "SamplingConstraint",
    "read_sampling_constraint",
    "write_sampling_constraint",
    "instantiate_generator",
    "load_sampling_parameters",
    "SamplingParameters",
    "PredictorCorrectorSamplingParameters",
    "LangevinGenerator",
    "AdaptiveCorrectorGenerator",
    "TrajectoryInitializer",
    "TrajectoryInitializerParameters",
    "FullRandomTrajectoryInitializer",
    "StartFromGivenConfigurationTrajectoryInitializer",
    "instantiate_trajectory_initializer",
]
