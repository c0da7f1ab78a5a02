"""Ground-truth energy oracles: native JAX Stillinger-Weber and LAMMPS fallback."""

from .energy_oracle import EnergyOracle, OracleParameters
from .energy_oracle_factory import create_energy_oracle, create_energy_oracle_parameters
from .stillinger_weber import (
    StillingerWeberOracle,
    StillingerWeberParameters,
    parse_stillinger_weber_coefficients,
)

__all__ = [
    "EnergyOracle",
    "OracleParameters",
    "create_energy_oracle",
    "create_energy_oracle_parameters",
    "StillingerWeberOracle",
    "StillingerWeberParameters",
    "parse_stillinger_weber_coefficients",
]
