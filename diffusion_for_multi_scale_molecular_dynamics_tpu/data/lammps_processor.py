"""One-time ETL: raw LAMMPS runs -> cached parquet files.

Scans ``<raw_dir>/{train,valid}_run_*`` directories (each holding one yaml
dump + one thermo log), parses them (native C++ parser when available),
converts cartesian positions to relative coordinates, and writes one parquet
file per run into the processed directory. Existing parquet files are reused.

(reference: src/diffusion_for_multi_scale_molecular_dynamics/data/diffusion/lammps_processor_for_diffusion.py:25-276)
"""

import glob
import logging
import os
from typing import List, Optional, Tuple

import numpy as np

from ..ops.geometry import get_number_of_lattice_parameters
from .element_types import ElementTypes
from .lammps_parser import parse_lammps_dump, parse_lammps_thermo_log

logger = logging.getLogger(__name__)


class LammpsProcessorForDiffusion:
    """Raw LAMMPS output -> parquet cache."""

    def __init__(self, raw_data_dir: str, processed_data_dir: str, elements: List[str]):
        self.raw_data_dir = raw_data_dir
        self.data_dir = processed_data_dir
        self.element_types = ElementTypes(elements)
        os.makedirs(processed_data_dir, exist_ok=True)

        self.create_parquet_data_files(mode="train")
        self.create_parquet_data_files(mode="valid")
        self.train_files = self.get_paths_to_parquet_data_files("train")
        self.valid_files = self.get_paths_to_parquet_data_files("valid")

    def get_paths_to_parquet_data_files(self, mode: str) -> List[str]:
        return sorted(glob.glob(os.path.join(self.data_dir, f"{mode}_*.parquet")))

    @staticmethod
    def get_dump_and_thermo_files(
        run_dir: str,
    ) -> Tuple[Optional[str], Optional[str]]:
        """Locate exactly one dump file and one thermo log in a run directory."""
        dumps = glob.glob(os.path.join(run_dir, "*dump*.yaml")) + glob.glob(
            os.path.join(run_dir, "dump.*")
        )
        dumps = sorted(set(dumps))
        thermos = sorted(
            set(
                glob.glob(os.path.join(run_dir, "*thermo*.yaml"))
                + glob.glob(os.path.join(run_dir, "thermo*"))
            )
        )
        dump = dumps[0] if len(dumps) == 1 else None
        thermo = thermos[0] if len(thermos) == 1 else None
        return dump, thermo

    def create_parquet_data_files(self, mode: str) -> None:
        if self.raw_data_dir is None or not os.path.isdir(self.raw_data_dir):
            return
        run_dirs = sorted(
            d
            for d in os.listdir(self.raw_data_dir)
            if d.startswith(f"{mode}_run") and os.path.isdir(os.path.join(self.raw_data_dir, d))
        )
        for run_name in run_dirs:
            target = os.path.join(self.data_dir, f"{run_name}.parquet")
            if os.path.exists(target):
                continue
            logger.info("Processing %s ...", run_name)
            dump, thermo = self.get_dump_and_thermo_files(
                os.path.join(self.raw_data_dir, run_name)
            )
            if dump is None or thermo is None:
                logger.warning(
                    "Skipping %s: need exactly one dump and one thermo file.",
                    run_name,
                )
                continue
            frame = self.parse_lammps_run(dump, thermo)
            frame.to_parquet(target, engine="pyarrow", index=False)
            logger.info("Wrote %s", target)

    def parse_lammps_run(self, dump_path: str, thermo_path: str):
        """Parse one run into a dataframe of flat per-step arrays."""
        import pandas as pd

        parsed = parse_lammps_dump(dump_path)
        thermo = parse_lammps_thermo_log(thermo_path)

        n_steps, natoms, d = parsed.positions.shape
        assert len(thermo["energy"]) == n_steps, (
            "thermo log and dump have inconsistent step counts"
        )

        boxes = parsed.boxes  # [n_steps, 3]
        relative = parsed.positions / boxes[:, None, :]
        relative = np.mod(relative, 1.0)
        relative[relative >= 1.0] = 0.0

        n_lattice = get_number_of_lattice_parameters(d)
        lattice_parameters = np.zeros((n_steps, n_lattice))
        lattice_parameters[:, :d] = boxes

        element_ids = np.array(
            [
                [self.element_types.get_element_id(e) for e in step]
                for step in parsed.elements
            ],
            dtype=np.int64,
        )

        return pd.DataFrame(
            {
                "natom": [natoms] * n_steps,
                "box": list(boxes),
                "lattice_parameters": list(lattice_parameters),
                "element": list(element_ids),
                "cartesian_positions": [row.ravel() for row in parsed.positions],
                "relative_coordinates": [row.ravel() for row in relative],
                "cartesian_forces": [row.ravel() for row in parsed.forces],
                "potential_energy": thermo["potential_energy"],
                "energy": thermo["energy"],
            }
        )
