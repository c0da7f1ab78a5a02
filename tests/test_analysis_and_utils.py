import os
import pickle

import numpy as np
import pytest

from diffusion_for_multi_scale_molecular_dynamics_tpu.namespace import AXL
from diffusion_for_multi_scale_molecular_dynamics_tpu.active_learning.structure import (
    Structure,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.analysis.trajectory_io import (
    create_cif_files,
    create_xyz_files,
    write_cif,
    write_extended_xyz,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.utils.closest_neighbors import (
    get_closest_relative_coordinates_and_index,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.utils.main_utils import (
    check_and_log_hp,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.utils.maxvol import (
    get_extrapolation_grades,
    maxvol,
)


def test_write_extended_xyz_and_cif(tmp_path):
    structure = Structure(
        species=["Si", "Si"],
        frac_coords=np.array([[0.0, 0.0, 0.0], [0.25, 0.25, 0.25]]),
        cell=np.eye(3) * 5.43,
    )
    xyz = tmp_path / "test.xyz"
    write_extended_xyz(str(xyz), [structure, structure])
    content = xyz.read_text().splitlines()
    assert content[0] == "2"
    assert "Lattice=" in content[1]
    assert content[2].startswith("Si 0.0")
    assert len(content) == 8  # two frames x (natoms + 2 header lines)

    cif = tmp_path / "test.cif"
    write_cif(str(cif), structure)
    text = cif.read_text()
    assert "_cell_length_a 5.430000" in text
    assert "Si2 Si 0.250000" in text


def test_create_xyz_and_cif_from_artifacts(tmp_path):
    n_steps, batch, natoms = 3, 2, 4
    rng = np.random.RandomState(0)
    composition = AXL(
        A=rng.randint(0, 2, size=(n_steps, batch, natoms)),
        X=rng.uniform(size=(n_steps, batch, natoms, 3)).astype(np.float32),
        L=np.tile(
            np.array([5.0, 5.0, 5.0, 0, 0, 0], dtype=np.float32),
            (n_steps, batch, 1),
        ),
    )
    trajectory_axls = [
        AXL(A=composition.A[t], X=composition.X[t], L=composition.L[t])
        for t in range(n_steps)
    ]
    written = create_xyz_files(
        ["Si"], trajectory_axls, str(tmp_path / "xyz"), sample_indices=[0]
    )
    assert len(written) == 1 and os.path.exists(written[0])
    frames = open(written[0]).read().count("Lattice=")
    assert frames == n_steps

    samples_path = tmp_path / "samples.pkl"
    with open(samples_path, "wb") as fh:
        pickle.dump(
            AXL(A=composition.A[0], X=composition.X[0], L=composition.L[0]), fh
        )
    cifs = create_cif_files(["Si"], str(samples_path), str(tmp_path / "cif"))
    assert len(cifs) == batch and all(os.path.exists(p) for p in cifs)


def test_maxvol_selects_informative_rows():
    rng = np.random.RandomState(0)
    # 3 informative directions + many nearly-duplicate rows.
    basis = np.eye(3) * 10
    noise_rows = 0.1 * rng.randn(20, 3)
    matrix = np.concatenate([noise_rows[:10], basis, noise_rows[10:]])
    indices, coefficients = maxvol(matrix)
    # the dominant rows (10, 11, 12) must be selected
    assert set(indices) == {10, 11, 12}
    np.testing.assert_allclose(coefficients @ matrix[indices], matrix, atol=1e-8)
    grades = get_extrapolation_grades(matrix, matrix[indices])
    assert (grades[[10, 11, 12]] >= grades.max() - 1e-9).all()


def test_closest_neighbors_wraps():
    coords = np.array([[0.05, 0.5, 0.5], [0.5, 0.5, 0.5]])
    distance, index = get_closest_relative_coordinates_and_index(
        coords, np.array([0.97, 0.5, 0.5])
    )
    assert index == 0
    assert distance == pytest.approx(0.08, abs=1e-6)


def test_check_and_log_hp():
    check_and_log_hp(["a"], {"a": 1, "b": 2})
    with pytest.raises(AssertionError):
        check_and_log_hp(["missing"], {"a": 1})
    with pytest.raises(AssertionError):
        check_and_log_hp(["a"], {"a": 1, "b": 2}, allow_extra=False)


def test_score_viewer_figure(tmp_path):
    from diffusion_for_multi_scale_molecular_dynamics_tpu.analysis.score_viewer import (
        ScoreViewer,
        ScoreViewerParameters,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.models import (
        AnalyticalScoreNetwork,
        AnalyticalScoreNetworkConfig,
    )

    config = AnalyticalScoreNetworkConfig(
        num_atom_types=1,
        number_of_atoms=2,
        kmax=2,
        equilibrium_relative_coordinates=[[0.25] * 3, [0.75] * 3],
        sigma_d=0.01,
    )
    viewer = ScoreViewer(
        ScoreViewerParameters(
            sigma_min=0.001,
            sigma_max=0.5,
            number_of_space_steps=10,
            starting_relative_coordinates=[[0.0] * 3, [1.0] * 3],
            ending_relative_coordinates=[[1.0] * 3, [0.0] * 3],
        ),
        config,
    )
    net = AnalyticalScoreNetwork(config)
    figure = viewer.create_figure(lambda batch: net.apply({}, batch, False))
    path = tmp_path / "scores.png"
    figure.savefig(str(path))
    assert path.exists() and path.stat().st_size > 0
    # The analytical network plotted against itself must coincide.
    projected = viewer._compute_projected_scores(
        lambda batch: net.apply({}, batch, False)
    )
    np.testing.assert_allclose(
        projected, viewer.projected_analytical_scores, atol=1e-6
    )


def test_mtp_cfg_round_trip(tmp_path):
    from diffusion_for_multi_scale_molecular_dynamics_tpu.mlip.mtp import (
        read_cfg_file,
        write_cfg_file,
    )

    structure = Structure(
        species=["Si", "Ge"],
        frac_coords=np.array([[0.1, 0.2, 0.3], [0.6, 0.7, 0.8]]),
        cell=np.eye(3) * 5.0,
    )
    forces = [np.array([[0.1, 0.0, 0.0], [0.0, -0.1, 0.0]])]
    path = tmp_path / "train.cfg"
    write_cfg_file(
        str(path), [structure], [1.5], forces, element_map={"Si": 0, "Ge": 1}
    )
    structures, energies, forces_out, grades = read_cfg_file(
        str(path), {0: "Si", 1: "Ge"}
    )
    assert structures[0].species == ["Si", "Ge"]
    np.testing.assert_allclose(structures[0].frac_coords, structure.frac_coords, atol=1e-7)
    assert energies[0] == pytest.approx(1.5)
    np.testing.assert_allclose(forces_out[0], forces[0], atol=1e-8)
    assert grades[0] is None


def test_create_trajectory_cif_files_and_cell_readback(tmp_path):
    from diffusion_for_multi_scale_molecular_dynamics_tpu.analysis.ovito_export import (
        _read_orthogonal_cell_from_cif,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.analysis.trajectory_io import (
        CIF_DIRECTORY_TEMPLATE,
        create_trajectory_cif_files,
    )

    rng = np.random.RandomState(0)
    batch, natoms, steps = 2, 4, 3
    axls = [
        AXL(
            A=np.zeros((batch, natoms), np.int64),
            X=rng.uniform(size=(batch, natoms, 3)),
            L=np.concatenate([5.43 * np.ones((batch, 3)), np.zeros((batch, 3))], -1),
        )
        for _ in range(steps)
    ]
    written = create_trajectory_cif_files(["Si"], axls, str(tmp_path), sample_index=1)
    assert len(written) == steps
    directory = tmp_path / "cif_files_trajectory_1"
    for step in range(steps):
        assert (directory / CIF_DIRECTORY_TEMPLATE.format(time_index=step)).exists()
    cell = _read_orthogonal_cell_from_cif(str(written[0]))
    np.testing.assert_allclose(cell, np.eye(3) * 5.43, atol=1e-6)


def test_ovito_session_state_requires_ovito(tmp_path):
    from diffusion_for_multi_scale_molecular_dynamics_tpu.analysis.ovito_export import (
        create_ovito_session_state,
    )

    try:
        import ovito  # noqa: F401

        pytest.skip("ovito installed; the gate does not apply")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="optional 'ovito' package"):
        create_ovito_session_state(str(tmp_path), trajectory_index=0)


def test_mtp_predictions_to_ovito(tmp_path):
    import pandas as pd

    from diffusion_for_multi_scale_molecular_dynamics_tpu.analysis.ovito_export import (
        get_lattice_from_lammps,
        main as ovito_main,
    )

    # Fake LAMMPS yaml dump with the box bounds.
    dump = tmp_path / "dump.yaml"
    dump.write_text(
        "---\nbox:\n- [0.0, 5.43]\n- [0.0, 5.43]\n- [0.0, 5.43]\n...\n"
    )
    lattice = get_lattice_from_lammps(str(dump))
    np.testing.assert_allclose(lattice, np.eye(3) * 5.43)

    # Fake MTP prediction CSV: two structures of two atoms.
    rows = []
    for structure_index in (0, 1):
        for atom in range(2):
            rows.append(
                {
                    "structure_index": structure_index,
                    "x": 0.1 * atom,
                    "y": 0.2 * atom,
                    "z": 0.3 * atom,
                    "nbh_grades": 1.0 + structure_index,
                }
            )
    csv_path = tmp_path / "predictions.csv"
    pd.DataFrame(rows).to_csv(csv_path, index=False)

    output = tmp_path / "viz"
    ovito_main(
        [
            "--prediction_file",
            str(csv_path),
            "--lammps_output",
            str(dump),
            "--output_name",
            str(output),
        ]
    )
    text = (tmp_path / "viz.xyz").read_text().splitlines()
    assert text[0] == "2"
    assert "MaxVolGamma" in text[1]
    assert len(text) == 8  # two frames x (2 header + 2 atoms)
    # per-atom gamma annotation present
    assert text[2].split()[-1] == "1.0"
    assert text[6].split()[-1] == "2.0"
