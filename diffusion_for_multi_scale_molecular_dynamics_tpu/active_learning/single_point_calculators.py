"""Single-point calculators: energy/forces (+uncertainty) labels for structures.

Variants (reference: active_learning_loop/single_point_calculators/*.py):
  * stillinger_weber — the ground-truth "oracle", computed by the native JAX
    SW potential (the reference shells out to LAMMPS per structure;
    here a whole candidate list can be scored on device);
  * lammps_sw — the same quantity through the subprocess LAMMPS protocol
    (external-binary parity path);
  * mapped_flare — LAMMPS with the mapped FLARE pair style, returning
    per-atom uncertainties;
  * flare — in-process FLARE SGP calculator (gated on the flare package).
"""

import logging
import os
from abc import ABC, abstractmethod
from dataclasses import dataclass
from typing import Any, Dict, List, Optional

import numpy as np

from ..oracle.stillinger_weber import (
    StillingerWeberOracle,
    StillingerWeberParameters,
)
from .structure import Structure

logger = logging.getLogger(__name__)


@dataclass
class SinglePointCalculation:
    """One labelled structure."""

    calculation_type: str
    structure: Structure
    forces: np.ndarray
    energy: float
    uncertainties: Optional[np.ndarray] = None


class BaseSinglePointCalculator(ABC):
    """Computes energy/forces for a single structure."""

    calculation_type = "base"

    @abstractmethod
    def calculate(
        self, structure: Structure, results_path: Optional[str] = None
    ) -> SinglePointCalculation:
        """Label one structure (optionally writing raw outputs to disk)."""


class StillingerWeberSinglePointCalculator(BaseSinglePointCalculator):
    """Ground-truth SW labels via the vectorized JAX oracle."""

    calculation_type = "stillinger_weber"

    def __init__(self, sw_coeff_filename: str, elements: List[str],
                 neighbor_capacity: int = 32):
        self.elements = list(elements)
        self._oracle = StillingerWeberOracle(
            StillingerWeberParameters(
                elements=self.elements,
                sw_coeff_filename=sw_coeff_filename,
                neighbor_capacity=neighbor_capacity,
            )
        )

    def calculate(self, structure, results_path=None):
        types = np.array(
            [self.elements.index(s) for s in structure.species], dtype=np.int32
        )
        energies, forces = self._oracle._compute_batch_energy_and_forces(
            structure.cart_coords[None].astype(np.float32),
            structure.cell[None].astype(np.float32),
            types[None],
        )
        result = SinglePointCalculation(
            calculation_type=self.calculation_type,
            structure=structure.copy(),
            forces=forces[0],
            energy=float(energies[0]),
        )
        if results_path is not None:
            np.savez(
                str(results_path),
                energy=result.energy,
                forces=result.forces,
                frac_coords=structure.frac_coords,
                cell=structure.cell,
                species=np.asarray(structure.species),
            )
        return result


class LammpsSinglePointCalculator(BaseSinglePointCalculator):
    """Templated LAMMPS single-point run (subprocess protocol).

    (reference: base_lammps_single_point_calculator.py:24-160)
    """

    calculation_type = "lammps"

    def __init__(self, lammps_runner, elements: List[str],
                 pair_style_block: str, track_uncertainty: bool = False):
        self.lammps_runner = lammps_runner
        self.elements = list(elements)
        self.pair_style_block = pair_style_block
        self.track_uncertainty = track_uncertainty

    def _generate_input_script(self, structure: Structure, work_dir: str) -> str:
        from .lammps_io import write_lammps_data_file

        data_path = os.path.join(work_dir, "configuration.data")
        write_lammps_data_file(data_path, structure, self.elements)
        uncertainty_columns = (
            " c_unc" if self.track_uncertainty else ""
        )
        compute_block = (
            "compute unc all pair/local ptr\n" if self.track_uncertainty else ""
        )
        return "\n".join(
            [
                "units metal",
                "atom_style atomic",
                "boundary p p p",
                f"read_data {data_path}",
                self.pair_style_block,
                compute_block.rstrip(),
                "dump d1 all yaml 1 dump.yaml id element x y z fx fy fz"
                + uncertainty_columns,
                "dump_modify d1 sort id element "
                + " ".join(self.elements),
                "thermo_style yaml",
                "thermo 1",
                "run 0",
            ]
        )

    def calculate(self, structure, results_path=None):
        import shutil
        import tempfile

        from .lammps_io import extract_all_fields_from_dump
        from ..data.lammps_parser import parse_lammps_thermo_log

        with tempfile.TemporaryDirectory() as work_dir:
            script = self._generate_input_script(structure, work_dir)
            script_path = os.path.join(work_dir, "in.single_point")
            with open(script_path, "w") as fh:
                fh.write(script)
            self.lammps_runner.run_lammps(script_path, work_dir)

            dump_path = os.path.join(work_dir, "dump.yaml")
            structures, forces, _, uncertainties = extract_all_fields_from_dump(
                dump_path, self.elements
            )
            log_path = os.path.join(work_dir, "log.lammps")
            energy = _parse_potential_energy_from_log(log_path)
            if results_path is not None:
                shutil.copy(dump_path, str(results_path))
        return SinglePointCalculation(
            calculation_type=self.calculation_type,
            structure=structures[0],
            forces=forces[0],
            energy=energy,
            uncertainties=uncertainties[0] if uncertainties else None,
        )


def _parse_potential_energy_from_log(log_path: str) -> float:
    """Pull PotEng out of a yaml-style LAMMPS log."""
    import yaml

    with open(log_path, "r") as fh:
        text = fh.read()
    # keep only the yaml documents the thermo output writes
    docs = [d for d in yaml.safe_load_all(text) if isinstance(d, dict)]
    for doc in docs:
        if "keywords" in doc and "PotEng" in doc["keywords"]:
            idx = doc["keywords"].index("PotEng")
            return float(doc["data"][0][idx])
    raise ValueError(f"no PotEng found in {log_path}")


class FlareSinglePointCalculator(BaseSinglePointCalculator):
    """In-process FLARE SGP labels (+ per-atom uncertainties); gated on flare."""

    calculation_type = "flare"

    def __init__(self, sgp_calculator, elements: List[str]):
        self.sgp_calculator = sgp_calculator
        self.elements = list(elements)

    def calculate(self, structure, results_path=None):
        try:
            from ase import Atoms
        except ImportError as exc:
            raise RuntimeError(
                "the in-process FLARE calculator needs the ase + flare packages"
            ) from exc
        atoms = Atoms(
            symbols=structure.species,
            scaled_positions=structure.frac_coords,
            cell=structure.cell,
            pbc=True,
        )
        atoms.calc = self.sgp_calculator
        energy = float(atoms.get_potential_energy())
        forces = np.asarray(atoms.get_forces())
        uncertainties = np.asarray(atoms.calc.results.get("stds", []))
        return SinglePointCalculation(
            calculation_type=self.calculation_type,
            structure=structure.copy(),
            forces=forces,
            energy=energy,
            uncertainties=uncertainties if uncertainties.size else None,
        )


def instantiate_single_point_calculator(
    config: Dict[str, Any], elements: List[str], lammps_runner=None
) -> BaseSinglePointCalculator:
    """Factory keyed on the calculator name."""
    cfg = dict(config)
    name = cfg.pop("name")
    if name == "stillinger_weber":
        from ..oracle.energy_oracle_factory import resolve_sw_coefficients_path

        return StillingerWeberSinglePointCalculator(
            sw_coeff_filename=resolve_sw_coefficients_path(
                cfg.pop("sw_coeff_filename")
            ),
            elements=elements,
            **cfg,
        )
    if name == "lammps_sw":
        from ..oracle.energy_oracle_factory import resolve_sw_coefficients_path

        sw_path = resolve_sw_coefficients_path(cfg.pop("sw_coeff_filename"))
        pair_block = "pair_style sw\npair_coeff * * {} {}".format(
            sw_path, " ".join(elements)
        )
        return LammpsSinglePointCalculator(
            lammps_runner=lammps_runner,
            elements=elements,
            pair_style_block=pair_block,
            **cfg,
        )
    if name == "mapped_flare":
        pair_coeff_file = cfg.pop("pair_coeff_file_path")
        uncertainty_file = cfg.pop("mapped_uncertainty_file_path")
        pair_block = "\n".join(
            [
                "pair_style flare",
                f"pair_coeff * * {pair_coeff_file}",
                f"compute unc all flare/std/atom {uncertainty_file}",
            ]
        )
        return LammpsSinglePointCalculator(
            lammps_runner=lammps_runner,
            elements=elements,
            pair_style_block=pair_block,
            track_uncertainty=True,
            **cfg,
        )
    raise ValueError(f"unknown single-point calculator '{name}'")
