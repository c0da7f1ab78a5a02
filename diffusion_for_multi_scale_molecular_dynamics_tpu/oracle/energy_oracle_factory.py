"""Oracle factory keyed on the configured name.

(reference: src/diffusion_for_multi_scale_molecular_dynamics/oracle/energy_oracle_factory.py:13-48)
The native JAX Stillinger-Weber oracle is the default; "lammps" selects the
subprocess fallback (requires the lmp binary).
"""

import os
from typing import Any, Dict, List

from .energy_oracle import EnergyOracle, OracleParameters
from .stillinger_weber import StillingerWeberOracle, StillingerWeberParameters

_SW_COEFF_SEARCH_PATHS = (
    os.path.join(os.path.dirname(__file__), "stillinger_weber_coefficients"),
)


def resolve_sw_coefficients_path(filename: str) -> str:
    """Find a .sw coefficient file by absolute path or bundled name."""
    if os.path.isabs(filename) and os.path.exists(filename):
        return filename
    for root in _SW_COEFF_SEARCH_PATHS:
        candidate = os.path.join(root, filename)
        if os.path.exists(candidate):
            return candidate
    if os.path.exists(filename):
        return os.path.abspath(filename)
    raise FileNotFoundError(f"Cannot locate SW coefficient file '{filename}'")


def create_energy_oracle_parameters(
    oracle_config: Dict[str, Any], elements: List[str]
) -> OracleParameters:
    """Build oracle parameters from the config dict and element list.

    The oracle's species table follows its ``elements`` list order, while
    atom-type ids everywhere else in the framework follow the
    sorted-element convention of ``ElementTypes`` (data/element_types.py).
    The config's raw element list is therefore sorted here — passing it
    through unsorted silently swaps species in every energy evaluation of a
    multi-species system (e.g. SiGe with ``elements: [Si, Ge]``).
    """
    cfg = dict(oracle_config)
    elements = sorted(elements)
    name = cfg.pop("name")
    if name in ("stillinger_weber", "lammps_sw", "lammps"):
        # "lammps" historically meant the SW potential through LAMMPS; the
        # native oracle computes the same numbers on device. The subprocess
        # path is selected explicitly with name="lammps_subprocess".
        return StillingerWeberParameters(
            elements=elements,
            sw_coeff_filename=resolve_sw_coefficients_path(
                cfg.pop("sw_coeff_filename")
            ),
            **cfg,
        )
    if name == "lammps_subprocess":
        from .lammps_oracle import LammpsOracleParameters

        return LammpsOracleParameters(
            elements=elements,
            sw_coeff_filename=resolve_sw_coefficients_path(
                cfg.pop("sw_coeff_filename")
            ),
            **cfg,
        )
    raise ValueError(f"Unknown oracle '{name}'")


def create_energy_oracle(oracle_parameters: OracleParameters) -> EnergyOracle:
    if isinstance(oracle_parameters, StillingerWeberParameters):
        return StillingerWeberOracle(oracle_parameters)
    from .lammps_oracle import LammpsEnergyOracle, LammpsOracleParameters

    if isinstance(oracle_parameters, LammpsOracleParameters):
        return LammpsEnergyOracle(oracle_parameters)
    raise ValueError(f"Unknown oracle parameters {type(oracle_parameters)}")
