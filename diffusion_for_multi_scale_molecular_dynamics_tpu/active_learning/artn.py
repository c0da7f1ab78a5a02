"""ARTn (saddle-point search) driver over LAMMPS, with strict output parsing.

The ARTn plugin (external Fortran library) runs inside LAMMPS; an
uncertainty-aware FLARE pair style interrupts the search when it reaches an
atomic environment the model is unsure about, dumping that structure for the
active-learning loop.

(reference: active_learning_loop/dynamic_driver/artn_driver.py:24-142,
 artn/{artn_outputs,calculation_state}.py)
"""

import enum
import logging
import os
import re
import shutil
from dataclasses import dataclass
from string import Template
from typing import Optional

from .lammps_io import LammpsRunner, generate_named_elements_blocks

logger = logging.getLogger(__name__)


class CalculationState(enum.Enum):
    """Outcome of an ARTn run."""

    SUCCESS = "success"
    INTERRUPTION = "interruption"


ARTN_TEMPLATE = Template(
    """# LAMMPS + ARTn saddle-point search driven by a mapped FLARE potential
units metal
atom_style atomic
boundary p p p

read_data ${initial_configuration}

${mass_block}

pair_style flare
pair_coeff * * ${pair_coeff_file}

compute unc all flare/std/atom ${uncertainty_file}
fix unc_check all halt 1 c_unc_max > ${uncertainty_threshold} error soft
compute unc_max all reduce max c_unc
variable c_unc_max equal c_unc_max

dump unc_dump all yaml 1 uncertain_dump.yaml id element x y z fx fy fz c_unc
dump_modify unc_dump sort id element ${element_list}

plugin load ${artn_library}
fix artn_fix all artn
min_style fire
minimize 1e-4 1e-5 5000 10000
"""
)


@dataclass(kw_only=True)
class ArtnDriverParameters:
    """Files defining the ARTn search."""

    reference_directory: str  # must contain artn.in + initial_configuration.dat
    artn_library_plugin: str  # path to the ARTn LAMMPS plugin library
    elements: list


class ArtnDriver:
    """Runs one ARTn search and reports SUCCESS or INTERRUPTION."""

    ARTN_OUTPUT_FILENAME = "artn.out"
    UNCERTAIN_DUMP_FILENAME = "uncertain_dump.yaml"

    def __init__(self, parameters: ArtnDriverParameters, lammps_runner: LammpsRunner):
        self.parameters = parameters
        self.lammps_runner = lammps_runner
        ref = parameters.reference_directory
        self.artn_in = os.path.join(ref, "artn.in")
        self.initial_configuration = os.path.join(ref, "initial_configuration.dat")
        assert os.path.exists(self.artn_in), f"missing {self.artn_in}"
        assert os.path.exists(self.initial_configuration), (
            f"missing {self.initial_configuration}"
        )

    def run(
        self,
        working_directory: str,
        uncertainty_threshold: float,
        pair_coeff_file_path: str,
        mapped_uncertainty_file_path: str,
    ) -> CalculationState:
        """Launch LAMMPS + ARTn; returns the terminal state of the search."""
        os.makedirs(working_directory, exist_ok=True)
        shutil.copy(self.artn_in, os.path.join(working_directory, "artn.in"))
        local_configuration = os.path.join(
            working_directory, "initial_configuration.dat"
        )
        shutil.copy(self.initial_configuration, local_configuration)

        mass_block, element_list = generate_named_elements_blocks(
            self.parameters.elements
        )
        script = ARTN_TEMPLATE.substitute(
            initial_configuration=local_configuration,
            mass_block=mass_block,
            pair_coeff_file=pair_coeff_file_path,
            uncertainty_file=mapped_uncertainty_file_path,
            uncertainty_threshold=uncertainty_threshold,
            element_list=element_list,
            artn_library=self.parameters.artn_library_plugin,
        )
        script_path = os.path.join(working_directory, "in.artn")
        with open(script_path, "w") as fh:
            fh.write(script)

        self.lammps_runner.run_lammps(script_path, working_directory)

        output_path = os.path.join(working_directory, self.ARTN_OUTPUT_FILENAME)
        return get_calculation_state_from_artn_output(output_path)


def get_calculation_state_from_artn_output(artn_output_path: str) -> CalculationState:
    """Strictly classify an artn.out file as SUCCESS or INTERRUPTION.

    ARTn prints a clear completion banner on success; an uncertainty halt
    leaves the file truncated. Anything ambiguous is an error — silent
    misclassification would corrupt the campaign.
    (reference: artn/artn_outputs.py:12-41)
    """
    assert os.path.exists(artn_output_path), f"missing {artn_output_path}"
    with open(artn_output_path, "r") as fh:
        content = fh.read()
    success = re.search(r"ARTn.*(converged|SADDLE POINT FOUND|SUCCESS)", content, re.IGNORECASE)
    interrupted = re.search(r"(halt|interrupt|uncertain)", content, re.IGNORECASE)
    if success and not interrupted:
        return CalculationState.SUCCESS
    if interrupted:
        return CalculationState.INTERRUPTION
    raise ValueError(
        f"cannot classify the ARTn output at {artn_output_path}; "
        "expected a convergence banner or an uncertainty halt marker"
    )


def get_saddle_energy(artn_output_path: str) -> Optional[float]:
    """Extract the saddle-point energy from artn.out (None if absent)."""
    with open(artn_output_path, "r") as fh:
        content = fh.read()
    match = re.search(r"saddle.*?energy.*?(-?\d+\.?\d*([eE][+-]?\d+)?)", content, re.IGNORECASE)
    return float(match.group(1)) if match else None
