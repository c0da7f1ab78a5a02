"""OVITO exports: session-state files and MaxVol-annotated XYZ conversion.

Reproduces the reference's OVITO utilities
(src/diffusion_for_multi_scale_molecular_dynamics/analysis/ovito_utilities/
{ovito_utils.py:22, ovito_visualisation.py:15}):

* ``create_ovito_session_state`` builds a prepopulated OVITO pipeline (CIF
  frame sequence, optional reference structure overlay, cell scaling to mimic
  smaller atoms, pairwise bond creation) and saves a ``.ovito`` session-state
  file loadable by the free OVITO version. The ``ovito`` package is an
  optional dependency: the import is gated and a clear error is raised when
  it is absent.
* ``mtp_predictions_to_ovito`` converts legacy-MTP prediction CSVs (positions
  + MaxVol nbh_grades) into extended-XYZ files OVITO reads directly — no
  OVITO dependency needed.
"""

import logging
import os
from typing import Dict, Optional

import numpy as np

from .trajectory_io import CIF_DIRECTORY_TEMPLATE

logger = logging.getLogger(__name__)


def _read_orthogonal_cell_from_cif(cif_path: str) -> np.ndarray:
    """Cell matrix (rows = lattice vectors) from one of our P1 CIF files."""
    lengths = {}
    with open(cif_path) as fh:
        for line in fh:
            parts = line.split()
            if len(parts) == 2 and parts[0] in (
                "_cell_length_a",
                "_cell_length_b",
                "_cell_length_c",
            ):
                lengths[parts[0][-1]] = float(parts[1])
    assert set(lengths) == {"a", "b", "c"}, f"incomplete cell in {cif_path}"
    return np.diag([lengths["a"], lengths["b"], lengths["c"]])


def create_ovito_session_state(
    visualization_artifacts_path: str,
    trajectory_index: int,
    cell_scale_factor: int = 2,
    reference_cif_file: Optional[str] = None,
    cutoff_dict: Dict[str, float] = {"Si": 3.2, "H": 3.2},
) -> str:
    """Write a prepopulated OVITO session-state file for one trajectory.

    Args:
        visualization_artifacts_path: directory holding
            ``cif_files_trajectory_{index}/`` (see
            trajectory_io.create_trajectory_cif_files) and receiving the
            ``trajectory_{index}.ovito`` output.
        trajectory_index: which trajectory's CIF sequence to load.
        cell_scale_factor: cell blow-up factor (OVITO atom spheres cannot be
            resized from a script; a larger cell makes them look smaller).
        reference_cif_file: optional second structure overlaid via a
            combine-datasets modifier.
        cutoff_dict: per-species pairwise bond cutoffs (applied when a
            reference file is given, as in the reference implementation).

    Returns:
        the session-state file path.

    Raises:
        ImportError: when the optional ``ovito`` package is not installed.
    """
    try:
        import ovito
        from ovito.io import import_file
        from ovito.modifiers import (
            AffineTransformationModifier,
            CombineDatasetsModifier,
            CreateBondsModifier,
        )
    except ImportError as error:
        raise ImportError(
            "create_ovito_session_state requires the optional 'ovito' package "
            "(pip install ovito); XYZ/CIF exports in analysis/trajectory_io.py "
            "work without it"
        ) from error

    cif_directory = os.path.join(
        visualization_artifacts_path, f"cif_files_trajectory_{trajectory_index}"
    )
    first_frame = os.path.join(
        cif_directory, CIF_DIRECTORY_TEMPLATE.format(time_index=0)
    )
    cell = _read_orthogonal_cell_from_cif(first_frame)
    # Lattice vectors as columns, plus the origin column.
    target_cell = cell_scale_factor * np.vstack(
        [cell, np.zeros((1, 3))]
    ).transpose()

    pipeline = import_file(
        os.path.join(cif_directory, CIF_DIRECTORY_TEMPLATE.format(time_index="*"))
    )
    if reference_cif_file is not None:
        modifier = CombineDatasetsModifier()
        modifier.source.load(str(reference_cif_file))
        pipeline.modifiers.append(modifier)

    pipeline.modifiers.append(
        AffineTransformationModifier(
            operate_on={"particles", "cell"},
            relative_mode=False,
            target_cell=target_cell,
        )
    )
    bond_modifier = CreateBondsModifier()
    bond_modifier.cutoff *= cell_scale_factor
    bond_modifier.vis.width = 0.25
    bond_modifier.vis.color = (0.5, 0.5, 0.5)
    bond_modifier.vis.coloring_mode = ovito.vis.BondsVis.ColoringMode.ByParticle
    bond_modifier.mode = CreateBondsModifier.Mode.Pairwise
    if reference_cif_file is not None:
        for species, cutoff in cutoff_dict.items():
            bond_modifier.set_pairwise_cutoff(
                species, species, cutoff=cell_scale_factor * cutoff
            )
    pipeline.modifiers.append(bond_modifier)

    pipeline.add_to_scene()
    output_path = os.path.join(
        visualization_artifacts_path, f"trajectory_{trajectory_index}.ovito"
    )
    ovito.scene.save(output_path)
    # Remove, or subsequent calls superimpose pipelines in the same file.
    pipeline.remove_from_scene()
    logger.info("Wrote OVITO session state %s", output_path)
    return output_path


def get_lattice_from_lammps(lammps_output_file: str) -> np.ndarray:
    """Periodic bounding box (3x3, rectangular) from a LAMMPS yaml dump.

    (reference: ovito_visualisation.py:44-67)
    """
    import yaml

    with open(lammps_output_file) as fh:
        for document in yaml.safe_load_all(fh):
            lattice = np.zeros((3, 3))
            for i, bounds in enumerate(document["box"]):
                lattice[i, i] = bounds[1]
            return lattice
    raise ValueError(f"no documents in {lammps_output_file}")


def mtp_predictions_to_ovito(
    prediction_file: str, lattice: np.ndarray, output_name: str
) -> str:
    """Convert a legacy-MTP prediction CSV into an OVITO-readable XYZ file.

    Each structure_index becomes one frame carrying positions and the MaxVol
    ``nbh_grades`` as a per-atom property (``MaxVolGamma``), so OVITO can
    color atoms by model uncertainty. (reference: ovito_visualisation.py:69-100)
    """
    import pandas as pd

    lattice_str = (
        'Lattice="' + " ".join(map(str, np.asarray(lattice).flatten()))
        + '" Origin="0 0 0" pbc="T T T"'
    )
    frame = pd.read_csv(prediction_file)
    text = ""
    for structure_index in sorted(frame["structure_index"].unique()):
        rows = frame.loc[frame["structure_index"] == structure_index]
        positions = rows[["x", "y", "z"]].to_numpy()
        gammas = rows["nbh_grades"].to_numpy()
        text += f"{positions.shape[0]}\n"
        text += lattice_str + " Properties=pos:R:3:MaxVolGamma:R:1\n"
        for position, gamma in zip(positions, gammas):
            text += f"{' '.join(map(str, position))} {gamma}\n"

    if not output_name.endswith(".xyz"):
        output_name += ".xyz"
    with open(output_name, "w") as fh:
        fh.write(text)
    return output_name


def main(argv=None) -> None:
    """CLI: convert MTP predictions + LAMMPS box into an OVITO-readable XYZ."""
    import argparse

    parser = argparse.ArgumentParser(description=main.__doc__)
    parser.add_argument("--prediction_file", required=True)
    parser.add_argument("--lammps_output", required=True)
    parser.add_argument("--output_name", required=True)
    args = parser.parse_args(argv)

    assert os.path.exists(args.lammps_output), args.lammps_output
    assert os.path.exists(args.prediction_file), args.prediction_file
    lattice = get_lattice_from_lammps(args.lammps_output)
    mtp_predictions_to_ovito(args.prediction_file, lattice, args.output_name)


if __name__ == "__main__":
    main()
