"""Legacy MTP (moment tensor potential) wrapper around the MLIP-3 `mlp` binary.

The earlier-generation active-learning path (pre-FLARE): train an MTP with
`mlp train`, evaluate energies/forces with `mlp calculate_efs`, and get
MaxVol extrapolation grades (`nbh_grades`) with `mlp calculate_grade` —
all file/subprocess protocols against the external C++ binary.

(reference: src/diffusion_for_multi_scale_molecular_dynamics/models/mlip/mtp.py:31-461,
 mlip/mtp_train.py)
"""

import logging
import os
import shutil
import subprocess
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..active_learning.structure import Structure

logger = logging.getLogger(__name__)


@dataclass(kw_only=True)
class MTPArguments:
    """MLIP-3 configuration."""

    mlip_path: str  # root of the MLIP-3 installation (with an untrained .mtp)
    mlp_executable: str = "mlp"
    name: Optional[str] = None
    param: Dict = field(default_factory=dict)
    unfitted_mtp: str = "08.almtp"
    fitted_mtp_savedir: str = "../"
    max_dist: float = 5.0
    radial_basis_size: int = 8
    max_iter: int = 1000
    energy_weight: float = 1.0
    force_weight: float = 0.01
    stress_weight: float = 0.0
    init_params: str = "same"
    scale_by_force: float = 0.0
    bfgs_conv_tol: float = 1e-3
    weighting: str = "vibration"


def write_cfg_file(
    path: str,
    structures: List[Structure],
    energies: Optional[List[float]] = None,
    forces: Optional[List[np.ndarray]] = None,
    element_map: Optional[Dict[str, int]] = None,
) -> None:
    """Write structures (optionally labelled) in the MLIP .cfg format."""
    with open(path, "w") as fh:
        for idx, structure in enumerate(structures):
            cell = structure.cell
            fh.write("BEGIN_CFG\n")
            fh.write(" Size\n")
            fh.write(f"    {len(structure)}\n")
            fh.write(" Supercell\n")
            for row in cell:
                fh.write(f"    {row[0]:.9f} {row[1]:.9f} {row[2]:.9f}\n")
            has_forces = forces is not None
            header = " AtomData:  id type cartes_x cartes_y cartes_z"
            if has_forces:
                header += " fx fy fz"
            fh.write(header + "\n")
            cart = structure.cart_coords
            for a, species in enumerate(structure.species):
                t = element_map[species] if element_map else 0
                line = (
                    f"    {a + 1} {t} {cart[a, 0]:.9f} {cart[a, 1]:.9f} "
                    f"{cart[a, 2]:.9f}"
                )
                if has_forces:
                    f = forces[idx][a]
                    line += f" {f[0]:.9f} {f[1]:.9f} {f[2]:.9f}"
                fh.write(line + "\n")
            if energies is not None:
                fh.write(" Energy\n")
                fh.write(f"    {energies[idx]:.9f}\n")
            fh.write("END_CFG\n\n")


def read_cfg_file(path: str, element_map_inverse: Dict[int, str]) -> Tuple[
    List[Structure], List[float], List[np.ndarray], List[Optional[np.ndarray]]
]:
    """Parse a .cfg file (with optional nbh_grades column) back to structures."""
    structures, energies, forces_list, grades_list = [], [], [], []
    with open(path, "r") as fh:
        lines = fh.readlines()
    i = 0
    while i < len(lines):
        if not lines[i].strip().startswith("BEGIN_CFG"):
            i += 1
            continue
        i += 1
        size = cell = None
        species, positions, forces, grades = [], [], [], []
        energy = None
        while i < len(lines) and not lines[i].strip().startswith("END_CFG"):
            token = lines[i].strip()
            if token == "Size":
                size = int(lines[i + 1])
                i += 2
            elif token.startswith("Supercell"):
                cell = np.array(
                    [[float(v) for v in lines[i + 1 + r].split()] for r in range(3)]
                )
                i += 4
            elif token.startswith("AtomData"):
                columns = token.replace("AtomData:", "").split()
                i += 1
                for _ in range(size):
                    values = lines[i].split()
                    row = dict(zip(columns, values))
                    species.append(element_map_inverse[int(row["type"])])
                    positions.append(
                        [float(row["cartes_x"]), float(row["cartes_y"]), float(row["cartes_z"])]
                    )
                    if "fx" in row:
                        forces.append(
                            [float(row["fx"]), float(row["fy"]), float(row["fz"])]
                        )
                    if "nbh_grades" in row:
                        grades.append(float(row["nbh_grades"]))
                    i += 1
            elif token == "Energy":
                energy = float(lines[i + 1])
                i += 2
            else:
                i += 1
        positions = np.asarray(positions)
        structures.append(
            Structure(
                species=species,
                frac_coords=np.mod(positions @ np.linalg.inv(cell), 1.0),
                cell=cell,
            )
        )
        energies.append(energy)
        forces_list.append(np.asarray(forces) if forces else None)
        grades_list.append(np.asarray(grades) if grades else None)
        i += 1
    return structures, energies, forces_list, grades_list


class MTPWithMLIP3:
    """Subprocess lifecycle of an MLIP-3 moment tensor potential."""

    def __init__(self, mtp_arguments: MTPArguments, elements: List[str]):
        self.arguments = mtp_arguments
        self.elements = list(elements)
        self.element_map = {e: i for i, e in enumerate(self.elements)}
        self.element_map_inverse = {i: e for e, i in self.element_map.items()}
        self.fitted_mtp: Optional[str] = None
        if shutil.which(mtp_arguments.mlp_executable) is None:
            logger.warning(
                "the '%s' binary is not on PATH; MTP calls will fail",
                mtp_arguments.mlp_executable,
            )

    def _run_mlp(self, arguments: List[str], cwd: str) -> str:
        command = [self.arguments.mlp_executable] + arguments
        logger.info("Running: %s", " ".join(command))
        result = subprocess.run(command, cwd=cwd, capture_output=True, text=True)
        if result.returncode != 0:
            raise RuntimeError(
                f"mlp failed ({result.returncode}):\n{result.stderr[-2000:]}"
            )
        return result.stdout

    def train(
        self,
        structures: List[Structure],
        energies: List[float],
        forces: List[np.ndarray],
        working_directory: str,
    ) -> str:
        """`mlp train` on the labelled structures; returns the fitted .almtp path."""
        os.makedirs(working_directory, exist_ok=True)
        train_cfg = os.path.join(working_directory, "train.cfg")
        write_cfg_file(train_cfg, structures, energies, forces, self.element_map)

        untrained = os.path.join(self.arguments.mlip_path, self.arguments.unfitted_mtp)
        fitted = os.path.join(working_directory, "fitted.almtp")
        a = self.arguments
        self._run_mlp(
            [
                "train",
                untrained,
                train_cfg,
                f"--save_to={fitted}",
                f"--iteration_limit={a.max_iter}",
                f"--energy_weight={a.energy_weight}",
                f"--force_weight={a.force_weight}",
                f"--stress_weight={a.stress_weight}",
                f"--init_params={a.init_params}",
                f"--scale_by_force={a.scale_by_force}",
                f"--bfgs_conv_tol={a.bfgs_conv_tol}",
                f"--weighting={a.weighting}",
            ],
            cwd=working_directory,
        )
        self.fitted_mtp = fitted
        return fitted

    def evaluate(
        self, structures: List[Structure], working_directory: str
    ) -> Tuple[List[float], List[np.ndarray], List[np.ndarray]]:
        """`mlp calculate_efs` + `calculate_grade`: energies, forces, nbh grades."""
        assert self.fitted_mtp, "train (or load) an MTP before evaluating"
        os.makedirs(working_directory, exist_ok=True)
        eval_cfg = os.path.join(working_directory, "eval.cfg")
        write_cfg_file(eval_cfg, structures, element_map=self.element_map)

        efs_out = os.path.join(working_directory, "efs_output.cfg")
        self._run_mlp(
            ["calculate_efs", self.fitted_mtp, eval_cfg, f"--output_filename={efs_out}"],
            cwd=working_directory,
        )
        grade_out = os.path.join(working_directory, "grade_output.cfg")
        self._run_mlp(
            [
                "calculate_grade",
                self.fitted_mtp,
                eval_cfg,
                grade_out,
            ],
            cwd=working_directory,
        )
        _, energies, forces, _ = read_cfg_file(efs_out, self.element_map_inverse)
        _, _, _, grades = read_cfg_file(grade_out, self.element_map_inverse)
        return energies, forces, grades
