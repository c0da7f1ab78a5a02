"""LAMMPS subprocess orchestration: runner, data files, dump extraction.

(reference: active_learning_loop/lammps/{lammps_runner,inputs,outputs}.py)
"""

import logging
import os
import shutil
import subprocess
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np
import yaml

from .structure import Structure

logger = logging.getLogger(__name__)

# Atomic masses for the elements this framework works with (extensible).
ATOMIC_MASSES: Dict[str, float] = {
    "H": 1.008,
    "C": 12.011,
    "N": 14.007,
    "O": 15.999,
    "Si": 28.0855,
    "Ge": 72.63,
}


def sort_elements_by_atomic_mass(elements: List[str]) -> List[str]:
    """LAMMPS convention: element types ordered by increasing atomic mass."""
    return sorted(elements, key=lambda e: ATOMIC_MASSES.get(e, 0.0))


def generate_named_elements_blocks(elements: List[str]) -> Tuple[str, str]:
    """(mass block, element list string) for templated input files."""
    ordered = sort_elements_by_atomic_mass(elements)
    mass_lines = [
        f"mass {i + 1} {ATOMIC_MASSES.get(e, 1.0)}" for i, e in enumerate(ordered)
    ]
    return "\n".join(mass_lines), " ".join(ordered)


def write_lammps_data_file(path: str, structure: Structure, elements: List[str]) -> None:
    """Write an orthogonal-box LAMMPS data file for a structure."""
    cell = structure.cell
    natoms = len(structure)
    with open(path, "w") as fh:
        fh.write("# generated configuration\n\n")
        fh.write(f"{natoms} atoms\n{len(elements)} atom types\n\n")
        fh.write(f"0.0 {cell[0, 0]} xlo xhi\n")
        fh.write(f"0.0 {cell[1, 1]} ylo yhi\n")
        fh.write(f"0.0 {cell[2, 2]} zlo zhi\n\n")
        fh.write("Masses\n\n")
        for i, element in enumerate(elements):
            fh.write(f"{i + 1} {ATOMIC_MASSES.get(element, 1.0)}\n")
        fh.write("\nAtoms\n\n")
        cart = structure.cart_coords
        for i, species in enumerate(structure.species):
            t = elements.index(species) + 1
            fh.write(f"{i + 1} {t} {cart[i, 0]} {cart[i, 1]} {cart[i, 2]}\n")


@dataclass(kw_only=True)
class LammpsRunnerParameters:
    """Subprocess LAMMPS configuration."""

    lammps_executable: str = "lmp"
    mpi_processors: int = 1
    openmp_threads: int = 1
    mpi_command: str = "mpirun"


class LammpsRunner:
    """Runs LAMMPS input scripts via (optionally MPI-launched) subprocesses."""

    def __init__(self, parameters: LammpsRunnerParameters):
        self.parameters = parameters

    def is_available(self) -> bool:
        return shutil.which(self.parameters.lammps_executable) is not None

    def run_lammps(self, input_script_path: str, working_directory: str) -> None:
        p = self.parameters
        if p.mpi_processors > 1:
            command = [
                p.mpi_command,
                "-np",
                str(p.mpi_processors),
                p.lammps_executable,
                "-i",
                input_script_path,
            ]
        else:
            command = [p.lammps_executable, "-i", input_script_path]
        env = dict(os.environ, OMP_NUM_THREADS=str(p.openmp_threads))
        logger.info("Running: %s", " ".join(command))
        result = subprocess.run(
            command, cwd=working_directory, env=env, capture_output=True, text=True
        )
        if result.returncode != 0:
            raise RuntimeError(
                f"LAMMPS failed ({result.returncode}):\n{result.stderr[-2000:]}"
            )


def instantiate_lammps_runner(config: Dict) -> LammpsRunner:
    return LammpsRunner(LammpsRunnerParameters(**config))


def extract_all_fields_from_dump(
    dump_path: str, elements: Optional[List[str]] = None
) -> Tuple[List[Structure], List[np.ndarray], List[float], List[Optional[np.ndarray]]]:
    """Read a (possibly extended) yaml dump into structures/forces/uncertainties.

    Handles the uncertainty column written by the mapped-FLARE pair style
    (the 'uncertain_dump.yaml' convention, reference:
    active_learning_loop/lammps/outputs.py:112).

    Returns:
        (structures, forces, energies-if-present, per-atom uncertainties).
    """
    structures, forces_list, energies, uncertainties = [], [], [], []
    with open(dump_path, "r") as fh:
        for doc in yaml.safe_load_all(fh):
            if not isinstance(doc, dict) or "keywords" not in doc:
                continue
            keywords = list(doc["keywords"])
            box = np.asarray(doc["box"], dtype=np.float64)
            lengths = box[:, 1] - box[:, 0]
            rows = sorted(doc["data"], key=lambda r: r[0])

            def column(name):
                idx = keywords.index(name)
                return [row[idx] for row in rows]

            species = [str(s) for s in column("element")]
            positions = np.array(
                [column("x"), column("y"), column("z")], dtype=np.float64
            ).T
            forces = np.array(
                [column("fx"), column("fy"), column("fz")], dtype=np.float64
            ).T
            structure = Structure(
                species=species,
                frac_coords=np.mod(positions / lengths, 1.0),
                cell=np.diag(lengths),
            )
            uncertainty = None
            for unc_key in ("c_unc", "uncertainty", "c_flare_std"):
                if unc_key in keywords:
                    uncertainty = np.asarray(column(unc_key), dtype=np.float64)
                    break
            structures.append(structure)
            forces_list.append(forces)
            uncertainties.append(uncertainty)
            if "PotEng" in keywords:
                energies.append(float(column("PotEng")[0]))
    return structures, forces_list, energies, uncertainties
