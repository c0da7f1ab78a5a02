"""Legacy ACE (atomic cluster expansion) wrapper around pacemaker.

Trains an ACE potential with the external `pacemaker` tool (yaml-config +
pickled dataframe protocol) and selects active sets / extrapolation grades
via MaxVol over B-basis projections (`pace_activeset`, or the in-repo MaxVol
when only projections are available).

(reference: src/diffusion_for_multi_scale_molecular_dynamics/models/mlip/ace.py:40-400,
 utils/pyace_utils.py; the pyace package is an optional external dependency.)
"""

import logging
import os
import pickle
import shutil
import subprocess
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..active_learning.structure import Structure
from ..utils.maxvol import get_extrapolation_grades, maxvol

logger = logging.getLogger(__name__)


@dataclass(kw_only=True)
class ACEArguments:
    """pacemaker configuration."""

    working_directory: str
    elements: List[str]
    cutoff: float = 5.0
    number_of_functions_per_element: int = 300
    pacemaker_executable: str = "pacemaker"
    activeset_executable: str = "pace_activeset"
    max_iterations: int = 500
    batch_size: int = 100
    energy_weight: float = 1.0
    force_weight: float = 0.99


def structures_to_dataframe(
    structures: List[Structure],
    energies: List[float],
    forces: List[np.ndarray],
):
    """pacemaker's expected pickled dataframe (ase Atoms + labels)."""
    import pandas as pd

    try:
        from ase import Atoms
    except ImportError as exc:
        raise RuntimeError("the ACE path needs the ase package") from exc

    rows = []
    for structure, energy, force in zip(structures, energies, forces):
        atoms = Atoms(
            symbols=structure.species,
            scaled_positions=structure.frac_coords,
            cell=structure.cell,
            pbc=True,
        )
        rows.append(
            dict(ase_atoms=atoms, energy=energy, forces=force, energy_corrected=energy)
        )
    return pd.DataFrame(rows)


class ACE_MLIP:
    """Subprocess lifecycle of a pacemaker ACE potential."""

    def __init__(self, arguments: ACEArguments):
        self.arguments = arguments
        os.makedirs(arguments.working_directory, exist_ok=True)
        self.potential_path: Optional[str] = None
        if shutil.which(arguments.pacemaker_executable) is None:
            logger.warning(
                "the '%s' binary is not on PATH; ACE calls will fail",
                arguments.pacemaker_executable,
            )

    def _write_pacemaker_config(self, dataframe_path: str) -> str:
        import yaml

        a = self.arguments
        config = {
            "cutoff": a.cutoff,
            "data": {"filename": dataframe_path},
            "potential": {
                "elements": a.elements,
                "functions": {
                    "number_of_functions_per_element": a.number_of_functions_per_element
                },
                "embeddings": {"ALL": {"npot": "FinnisSinclairShiftedScaled"}},
                "bonds": {"ALL": {"radbase": "SBessel", "rcut": a.cutoff}},
            },
            "fit": {
                "loss": {
                    "kappa": a.force_weight,
                },
                "maxiter": a.max_iterations,
            },
            "backend": {"evaluator": "tensorpot", "batch_size": a.batch_size},
        }
        path = os.path.join(a.working_directory, "pacemaker_input.yaml")
        with open(path, "w") as fh:
            yaml.safe_dump(config, fh)
        return path

    def train(
        self,
        structures: List[Structure],
        energies: List[float],
        forces: List[np.ndarray],
    ) -> str:
        """Run pacemaker; returns the fitted potential yaml path."""
        dataframe = structures_to_dataframe(structures, energies, forces)
        dataframe_path = os.path.join(
            self.arguments.working_directory, "train_data.pkl.gzip"
        )
        dataframe.to_pickle(dataframe_path, compression="gzip")
        config_path = self._write_pacemaker_config(dataframe_path)
        result = subprocess.run(
            [self.arguments.pacemaker_executable, config_path],
            cwd=self.arguments.working_directory,
            capture_output=True,
            text=True,
        )
        if result.returncode != 0:
            raise RuntimeError(
                f"pacemaker failed ({result.returncode}):\n{result.stderr[-2000:]}"
            )
        self.potential_path = os.path.join(
            self.arguments.working_directory, "output_potential.yaml"
        )
        return self.potential_path

    def compute_active_set(self) -> str:
        """`pace_activeset`: the MaxVol active set for extrapolation grades."""
        assert self.potential_path, "train before computing the active set"
        result = subprocess.run(
            [self.arguments.activeset_executable, self.potential_path],
            cwd=self.arguments.working_directory,
            capture_output=True,
            text=True,
        )
        if result.returncode != 0:
            raise RuntimeError(
                f"pace_activeset failed ({result.returncode}):\n"
                f"{result.stderr[-2000:]}"
            )
        return self.potential_path.replace(".yaml", ".asi")

    @staticmethod
    def select_structures_by_maxvol(
        basis_projections: np.ndarray, number_to_select: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """MaxVol selection over B-basis projection rows (in-repo fallback).

        Returns:
            (selected row indices, extrapolation grades of all rows).
        """
        selected, _ = maxvol(basis_projections[:, :number_to_select])
        grades = get_extrapolation_grades(
            basis_projections[:, :number_to_select],
            basis_projections[selected][:, :number_to_select],
        )
        return selected, grades
