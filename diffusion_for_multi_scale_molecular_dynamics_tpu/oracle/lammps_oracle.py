"""Subprocess LAMMPS energy oracle (optional fallback).

Kept for potentials outside the native JAX Stillinger-Weber implementation:
writes a data file + input script per batch item, runs the ``lmp`` binary,
parses the thermo output. Gated on the executable being available.

(reference equivalent: the in-process lammps python module oracle,
src/diffusion_for_multi_scale_molecular_dynamics/oracle/lammps_energy_oracle.py:30-179;
here the file/subprocess protocol is shared with the active-learning LAMMPS
runner.)
"""

import logging
import os
import shutil
import subprocess
import tempfile
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

from .energy_oracle import EnergyOracle, OracleParameters

logger = logging.getLogger(__name__)


@dataclass(kw_only=True)
class LammpsOracleParameters(OracleParameters):
    """Configuration of the subprocess LAMMPS oracle."""

    name: str = "lammps"
    sw_coeff_filename: str
    lammps_executable: str = "lmp"
    atomic_masses: Optional[list] = None


def lammps_is_available(executable: str = "lmp") -> bool:
    return shutil.which(executable) is not None


class LammpsEnergyOracle(EnergyOracle):
    """One LAMMPS single-point run per configuration (host subprocess)."""

    def __init__(self, oracle_parameters: LammpsOracleParameters):
        super().__init__(oracle_parameters)
        self.params = oracle_parameters
        if not lammps_is_available(oracle_parameters.lammps_executable):
            raise RuntimeError(
                f"LAMMPS executable '{oracle_parameters.lammps_executable}' not found;"
                " use the native stillinger_weber oracle instead."
            )

    def _write_data_file(self, path, positions, cell, atom_types):
        natoms = positions.shape[0]
        ntypes = len(self.params.elements)
        masses = self.params.atomic_masses or [28.0855 + 44.0 * t for t in range(ntypes)]
        with open(path, "w") as fh:
            fh.write("# single point configuration\n\n")
            fh.write(f"{natoms} atoms\n{ntypes} atom types\n\n")
            fh.write(f"0.0 {cell[0, 0]} xlo xhi\n")
            fh.write(f"0.0 {cell[1, 1]} ylo yhi\n")
            fh.write(f"0.0 {cell[2, 2]} zlo zhi\n\n")
            fh.write("Masses\n\n")
            for t in range(ntypes):
                fh.write(f"{t + 1} {masses[t]}\n")
            fh.write("\nAtoms\n\n")
            for i in range(natoms):
                fh.write(
                    f"{i + 1} {atom_types[i] + 1} "
                    f"{positions[i, 0]} {positions[i, 1]} {positions[i, 2]}\n"
                )

    def _single_point(self, positions, cell, atom_types) -> Tuple[float, np.ndarray]:
        elements = " ".join(self.params.elements)
        with tempfile.TemporaryDirectory() as work_dir:
            data_path = os.path.join(work_dir, "configuration.data")
            self._write_data_file(data_path, positions, cell, atom_types)
            input_script = "\n".join(
                [
                    "units metal",
                    "atom_style atomic",
                    "boundary p p p",
                    f"read_data {data_path}",
                    "pair_style sw",
                    f"pair_coeff * * {self.params.sw_coeff_filename} {elements}",
                    "dump d1 all custom 1 forces.dump id fx fy fz",
                    "dump_modify d1 sort id",
                    "run 0",
                    'print "ORACLE_ENERGY = $(pe)"',
                ]
            )
            script_path = os.path.join(work_dir, "in.single_point")
            with open(script_path, "w") as fh:
                fh.write(input_script)
            result = subprocess.run(
                [self.params.lammps_executable, "-i", script_path],
                cwd=work_dir,
                capture_output=True,
                text=True,
                check=True,
            )
            energy = None
            for line in result.stdout.splitlines():
                if line.startswith("ORACLE_ENERGY ="):
                    energy = float(line.split("=", 1)[1])
            assert energy is not None, "LAMMPS output did not contain the energy"
            forces = np.loadtxt(
                os.path.join(work_dir, "forces.dump"), skiprows=9
            ).reshape(-1, 4)[:, 1:]
            return energy, forces

    def _compute_batch_energy_and_forces(
        self, cartesian_positions, basis_vectors, atom_types
    ):
        energies, forces = [], []
        for pos, cell, types in zip(cartesian_positions, basis_vectors, atom_types):
            e, f = self._single_point(pos, cell, types)
            energies.append(e)
            forces.append(f)
        return np.asarray(energies), np.stack(forces)
