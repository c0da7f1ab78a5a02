"""Trajectory export: sampled AXL trajectories -> extended-XYZ / CIF files.

Converts the recorded sampling-trajectory artifacts (stacked per-step AXL
compositions written by SampleTrajectory) into per-frame files that OVITO,
VESTA or ASE open directly. The extended-XYZ format carries the cell and
per-atom species; CIF covers single structures.

(reference: src/diffusion_for_multi_scale_molecular_dynamics/analysis/ovito_utilities/trajectory_io.py:24-320,
 xyz_utils.py, generated_samples_io.py — the reference goes through pymatgen
 and OVITO session states; here the writers are dependency-free.)
"""

import os
import pickle
from typing import Dict, List, Optional

import numpy as np

from ..namespace import AXL
from ..active_learning.structure import Structure, StructureConverter


def write_extended_xyz(
    path: str, structures: List[Structure], comments: Optional[List[str]] = None
) -> None:
    """Write frames as extended XYZ (Lattice + species + positions)."""
    with open(path, "w") as fh:
        for frame, structure in enumerate(structures):
            cell = structure.cell
            lattice = " ".join(f"{v:.8f}" for v in cell.ravel())
            comment = comments[frame] if comments else f"frame={frame}"
            fh.write(f"{len(structure)}\n")
            fh.write(
                f'Lattice="{lattice}" Properties=species:S:1:pos:R:3 {comment}\n'
            )
            cart = structure.cart_coords
            for species, position in zip(structure.species, cart):
                fh.write(
                    f"{species} {position[0]:.8f} {position[1]:.8f} "
                    f"{position[2]:.8f}\n"
                )


def write_cif(path: str, structure: Structure) -> None:
    """Write one structure as a (P1, orthogonal-cell) CIF file."""
    lengths = np.diag(structure.cell)
    with open(path, "w") as fh:
        fh.write("data_generated\n")
        fh.write(f"_cell_length_a {lengths[0]:.6f}\n")
        fh.write(f"_cell_length_b {lengths[1]:.6f}\n")
        fh.write(f"_cell_length_c {lengths[2]:.6f}\n")
        fh.write("_cell_angle_alpha 90.0\n_cell_angle_beta 90.0\n_cell_angle_gamma 90.0\n")
        fh.write("_symmetry_space_group_name_H-M 'P 1'\n")
        fh.write("loop_\n_atom_site_label\n_atom_site_type_symbol\n")
        fh.write("_atom_site_fract_x\n_atom_site_fract_y\n_atom_site_fract_z\n")
        for i, (species, frac) in enumerate(
            zip(structure.species, structure.frac_coords)
        ):
            fh.write(
                f"{species}{i + 1} {species} {frac[0]:.6f} {frac[1]:.6f} "
                f"{frac[2]:.6f}\n"
            )


def get_list_trajectory_axls(trajectory_pickle_path: str) -> List[AXL]:
    """Per-time-step batched AXLs from a recorded trajectory pickle."""
    with open(trajectory_pickle_path, "rb") as fh:
        data = pickle.load(fh)
    assert "predictor_step" in data, "not a predictor-corrector trajectory pickle"
    record = data["predictor_step"][0]
    compositions = record["composition_im1"] if isinstance(record, dict) else record.composition_im1
    n_steps = compositions.A.shape[0]
    return [
        AXL(
            A=np.asarray(compositions.A[t]),
            X=np.asarray(compositions.X[t]),
            L=np.asarray(compositions.L[t]),
        )
        for t in range(n_steps)
    ]


def create_xyz_files(
    elements: List[str],
    trajectory_axls: List[AXL],
    output_directory: str,
    sample_indices: Optional[List[int]] = None,
    prefix: str = "trajectory",
) -> List[str]:
    """One extended-XYZ trajectory file per requested sample index.

    MASK atoms (still undecided at early steps) are written as element 'X'.
    """
    os.makedirs(output_directory, exist_ok=True)
    converter = StructureConverter(list(elements) + ["X"])  # 'X' = MASK

    batch_size = trajectory_axls[0].A.shape[0]
    if sample_indices is None:
        sample_indices = list(range(batch_size))

    written = []
    for sample in sample_indices:
        frames = []
        comments = []
        for step, axl in enumerate(trajectory_axls):
            single = AXL(A=axl.A[sample], X=axl.X[sample], L=axl.L[sample])
            frames.append(converter.convert_axl_to_structure(single))
            comments.append(f"time_step={step}")
        path = os.path.join(output_directory, f"{prefix}_sample_{sample}.xyz")
        write_extended_xyz(path, frames, comments)
        written.append(path)
    return written


CIF_DIRECTORY_TEMPLATE = "diffusion_positions_{time_index}.cif"


def create_trajectory_cif_files(
    elements: List[str],
    trajectory_axls: List[AXL],
    output_directory: str,
    sample_index: int = 0,
) -> List[str]:
    """Per-time-step CIF files for one sample of a recorded trajectory.

    Written into ``cif_files_trajectory_{sample_index}/`` with the
    ``CIF_DIRECTORY_TEMPLATE`` naming so OVITO's file-sequence import (and
    ``create_ovito_session_state``) picks the frames up directly.
    (reference: analysis/ovito_utilities/trajectory_io.py:24)
    """
    directory = os.path.join(
        output_directory, f"cif_files_trajectory_{sample_index}"
    )
    os.makedirs(directory, exist_ok=True)
    converter = StructureConverter(list(elements) + ["X"])
    written = []
    for step, axl in enumerate(trajectory_axls):
        single = AXL(
            A=axl.A[sample_index], X=axl.X[sample_index], L=axl.L[sample_index]
        )
        path = os.path.join(
            directory, CIF_DIRECTORY_TEMPLATE.format(time_index=step)
        )
        write_cif(path, converter.convert_axl_to_structure(single))
        written.append(path)
    return written


def create_cif_files(
    elements: List[str],
    samples_pickle_path: str,
    output_directory: str,
    prefix: str = "sample",
) -> List[str]:
    """One CIF per generated sample in a samples.pkl artifact."""
    os.makedirs(output_directory, exist_ok=True)
    with open(samples_pickle_path, "rb") as fh:
        composition: AXL = pickle.load(fh)
    converter = StructureConverter(list(elements) + ["X"])
    written = []
    for i in range(composition.A.shape[0]):
        single = AXL(
            A=composition.A[i], X=composition.X[i], L=composition.L[i]
        )
        path = os.path.join(output_directory, f"{prefix}_{i}.cif")
        write_cif(path, converter.convert_axl_to_structure(single))
        written.append(path)
    return written
