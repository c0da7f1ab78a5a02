import numpy as np
import pytest

from diffusion_for_multi_scale_molecular_dynamics_tpu.data import lammps_parser
from diffusion_for_multi_scale_molecular_dynamics_tpu.data.lammps_data_module import (
    LammpsDataModule,
    LammpsDataModuleParameters,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.data.lammps_parser import (
    parse_lammps_dump,
    parse_lammps_thermo_log,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.data.lammps_processor import (
    LammpsProcessorForDiffusion,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.namespace import (
    ATOM_MASK,
    ATOM_TYPES,
    CARTESIAN_FORCES,
    LATTICE_PARAMETERS,
    RELATIVE_COORDINATES,
)
from tests.fake_lammps_data import write_fake_lammps_run


@pytest.fixture
def fake_run(tmp_path):
    run_dir = tmp_path / "train_run_1"
    truth = write_fake_lammps_run(str(run_dir), n_steps=4, natoms=6)
    return str(run_dir), truth


def test_python_parser_matches_ground_truth(fake_run):
    run_dir, truth = fake_run
    dump = parse_lammps_dump(f"{run_dir}/dump.fake.yaml", use_native=False)
    np.testing.assert_allclose(dump.positions, truth["positions"], atol=1e-8)
    np.testing.assert_allclose(dump.forces, truth["forces"], atol=1e-8)
    np.testing.assert_allclose(dump.boxes, np.tile(truth["box"], (4, 1)))
    assert dump.elements[0] == truth["elements"]  # sorted by id
    np.testing.assert_array_equal(dump.atom_ids[0], np.arange(1, 7))


def test_native_parser_matches_python_parser(fake_run):
    run_dir, _ = fake_run
    path = f"{run_dir}/dump.fake.yaml"
    py = parse_lammps_dump(path, use_native=False)
    if lammps_parser._get_native_library() is None:
        pytest.skip("native parser unavailable (no g++)")
    native = lammps_parser._parse_dump_native(path)
    np.testing.assert_allclose(native.positions, py.positions, atol=1e-12)
    np.testing.assert_allclose(native.forces, py.forces, atol=1e-12)
    np.testing.assert_allclose(native.boxes, py.boxes, atol=1e-12)
    assert native.elements == py.elements
    np.testing.assert_array_equal(native.atom_ids, py.atom_ids)


def test_thermo_parser(fake_run):
    run_dir, truth = fake_run
    thermo = parse_lammps_thermo_log(f"{run_dir}/thermo.fake.yaml")
    np.testing.assert_allclose(
        thermo["potential_energy"], truth["potential_energy"], atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(thermo["energy"]),
        truth["potential_energy"] + truth["kinetic_energy"],
        atol=1e-7,
    )
    assert "temperature" in thermo and "pressure" in thermo


@pytest.fixture
def raw_data_tree(tmp_path):
    raw = tmp_path / "raw"
    for i, (mode, seed) in enumerate(
        [("train", 1), ("train", 2), ("valid", 3)], start=1
    ):
        write_fake_lammps_run(
            str(raw / f"{mode}_run_{seed}"), n_steps=4, natoms=6, seed=seed
        )
    return str(raw)


def test_processor_and_data_module(raw_data_tree, tmp_path):
    processed = str(tmp_path / "processed")
    processor = LammpsProcessorForDiffusion(raw_data_tree, processed, ["Si"])
    assert len(processor.train_files) == 2
    assert len(processor.valid_files) == 1

    # Idempotent: a second instantiation reuses the cache.
    processor2 = LammpsProcessorForDiffusion(raw_data_tree, processed, ["Si"])
    assert processor2.train_files == processor.train_files

    params = LammpsDataModuleParameters(
        elements=["Si"],
        batch_size=4,
        max_atom=8,
        lammps_run_dir=raw_data_tree,
        processed_dataset_dir=processed,
    )
    dm = LammpsDataModule(params)
    batch = next(iter(dm.train_batches()))
    assert batch[RELATIVE_COORDINATES].shape == (4, 8, 3)
    assert batch[ATOM_TYPES].shape == (4, 8)
    assert batch[LATTICE_PARAMETERS].shape == (4, 6)
    assert batch[CARTESIAN_FORCES].shape == (4, 8, 3)
    # 6 real atoms, 2 padded
    np.testing.assert_array_equal(batch[ATOM_MASK].sum(axis=1), 6)
    x = batch[RELATIVE_COORDINATES]
    assert ((x >= 0) & (x < 1)).all()
    # padded entries are exact zeros, not NaN
    assert (x[~batch[ATOM_MASK]] == 0).all()
    assert dm.validation_reference_energies.shape == (4,)
