"""On-device MD data generator: physics sanity and pipeline integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_for_multi_scale_molecular_dynamics_tpu.data.md_generator import (
    ATOMIC_MASSES_AMU,
    MDParameters,
    create_silicon_diffusion_dataset,
    run_nvt_langevin,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.oracle.stillinger_weber import (
    build_sw_tables,
    parse_stillinger_weber_coefficients,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.oracle.energy_oracle_factory import (
    resolve_sw_coefficients_path,
)
from diffusion_for_multi_scale_molecular_dynamics_tpu.utils.reference_configurations import (
    get_silicon_supercell,
)


@pytest.mark.slow
def test_nvt_langevin_physics():
    """Thermostat keeps ~300 K; atoms vibrate near lattice sites; E is sane."""
    coordinates, cell = get_silicon_supercell(1, 5.43)
    tables = build_sw_tables(
        parse_stillinger_weber_coefficients(resolve_sw_coefficients_path("Si.sw")),
        ["Si"],
    )
    parameters = MDParameters(
        temperature=300.0,
        equilibration_steps=500,
        production_steps=1500,
        sample_every=10,
    )
    trajectory = run_nvt_langevin(
        jax.random.PRNGKey(0),
        jnp.asarray(coordinates, jnp.float32),
        jnp.asarray(cell, jnp.float32),
        jnp.zeros(8, jnp.int32),
        jnp.full(8, ATOMIC_MASSES_AMU["Si"]),
        tables,
        parameters,
    )
    temperatures = np.asarray(trajectory.temperatures)
    energies = np.asarray(trajectory.potential_energies)
    x = np.asarray(trajectory.relative_coordinates)

    # Thermostat: mean instantaneous temperature within 25% of the target.
    assert 225.0 < temperatures.mean() < 375.0, temperatures.mean()
    # Solid Si at 300 K: slightly above the 0 K cohesive energy, not molten.
    e_per_atom = energies / 8
    assert -4.34 < e_per_atom.mean() < -4.15, e_per_atom.mean()
    assert ((x >= 0) & (x < 1)).all()
    # Atoms vibrate around their lattice sites (no melting/diffusion at
    # 300 K). The Langevin thermostat lets the center of mass random-walk,
    # so remove the per-frame COM drift before measuring amplitudes.
    delta = np.mod(x - coordinates[None], 1.0)
    delta = np.where(delta > 0.5, delta - 1.0, delta)
    delta = delta - delta.mean(axis=1, keepdims=True)
    displacement_angstrom = np.linalg.norm(delta * 5.43, axis=-1)
    assert displacement_angstrom.max() < 1.0, displacement_angstrom.max()
    assert 0.02 < displacement_angstrom.mean() < 0.4  # it vibrates, solid


@pytest.mark.slow
def test_dataset_generation_feeds_data_module(tmp_path):
    processed = str(tmp_path / "si_data")
    parameters = MDParameters(
        equilibration_steps=100, production_steps=400, sample_every=10
    )
    written = create_silicon_diffusion_dataset(
        processed,
        supercell_factor=1,
        number_of_train_runs=1,
        number_of_valid_runs=1,
        parameters=parameters,
    )
    assert len(written["train"]) == 1 and len(written["valid"]) == 1

    from diffusion_for_multi_scale_molecular_dynamics_tpu.data.lammps_data_module import (
        LammpsDataModule,
        LammpsDataModuleParameters,
    )

    dm = LammpsDataModule(
        LammpsDataModuleParameters(
            elements=["Si"],
            batch_size=8,
            max_atom=8,
            lammps_run_dir=None,
            processed_dataset_dir=processed,
        )
    )
    batch = next(iter(dm.train_batches()))
    from diffusion_for_multi_scale_molecular_dynamics_tpu.namespace import (
        ATOM_MASK,
        RELATIVE_COORDINATES,
    )

    assert batch[RELATIVE_COORDINATES].shape == (8, 8, 3)
    assert batch[ATOM_MASK].all()
    assert dm.validation_reference_energies.shape[0] == 40

    # Idempotent: regeneration reuses the files.
    create_silicon_diffusion_dataset(
        processed,
        supercell_factor=1,
        number_of_train_runs=1,
        number_of_valid_runs=1,
        parameters=parameters,
    )


@pytest.mark.slow
def test_sige_dataset_two_species(tmp_path):
    """The SiGe generator writes two-species frames at the right energy scale
    with element ids preserved (Ge=0, Si=1 by sorted-element convention)."""
    import pandas as pd

    from diffusion_for_multi_scale_molecular_dynamics_tpu.data.md_generator import (
        create_sige_diffusion_dataset,
    )

    written = create_sige_diffusion_dataset(
        str(tmp_path),
        number_of_train_runs=1,
        number_of_valid_runs=1,
        parameters=MDParameters(
            temperature=300.0,
            equilibration_steps=200,
            production_steps=400,
            sample_every=10,
        ),
    )
    frame = pd.read_parquet(written["train"][0])
    assert len(frame) == 40
    elements = np.stack(frame["element"].to_numpy())
    # 4 Si (id 1) and 4 Ge (id 0) per frame, fixed along the trajectory.
    assert elements.shape[1] == 8
    assert (elements.sum(axis=1) == 4).all()
    # SiGe SW parameterization: ~ -6.5 eV/atom at 300 K.
    e_per_atom = frame["potential_energy"].to_numpy() / 8
    assert -6.7 < e_per_atom.mean() < -6.3, e_per_atom.mean()
