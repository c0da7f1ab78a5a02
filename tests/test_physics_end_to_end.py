"""Capstone physics loop, entirely in-repo and on device:

    SW MD data generation -> EGNN training -> PC sampling -> SW energy check.

A miniature of the Si 1x1x1 north-star: the trained model's samples must be
energetically *physical* — far below random atom placements and approaching
the MD data's energy scale.
"""

import functools
import os

import jax
import numpy as np
import pytest
import yaml


@pytest.mark.slow
def test_md_train_sample_energy_loop(tmp_path):
    from diffusion_for_multi_scale_molecular_dynamics_tpu.data.md_generator import (
        MDParameters,
        create_silicon_diffusion_dataset,
    )

    data_dir = str(tmp_path / "si_data")
    create_silicon_diffusion_dataset(
        data_dir,
        supercell_factor=1,
        number_of_train_runs=1,
        number_of_valid_runs=1,
        parameters=MDParameters(
            equilibration_steps=500, production_steps=3000, sample_every=10
        ),
    )

    config = {
        "exp_name": "physics_loop",
        "max_epoch": 30,
        "seed": 3,
        "elements": ["Si"],
        "spatial_dimension": 3,
        "data": {
            "data_source": "LAMMPS",
            "processed_dataset_dir": data_dir,
            "batch_size": 64,
            "max_atom": 8,
            "use_fixed_lattice_parameters": True,
            "noise": {
                "total_time_steps": 100,
                "sigma_min": 0.001,
                "sigma_max": 0.25,
                "schedule_type": "linear",
            },
        },
        "model": {
            "loss": {
                "coordinates": {"algorithm": "mse", "lambda_weight": 1.0},
                "atom_types": {"algorithm": "d3pm", "lambda_weight": 0.0},
                "lattice_parameters": {"algorithm": "mse", "lambda_weight": 0.0},
            },
            "score_network": {
                "architecture": "egnn",
                "n_layers": 2,
                "message_hidden_dimensions_size": 32,
                "message_n_hidden_dimensions": 1,
                "node_hidden_dimensions_size": 32,
                "coordinate_hidden_dimensions_size": 32,
                "edges": "radial_cutoff",
                "radial_cutoff": 4.5,
            },
        },
        "optimizer": {"name": "adamw", "learning_rate": 0.002},
        "model_checkpoint": {"monitor": "validation_epoch_loss", "mode": "min"},
        "logging": ["csv"],
    }
    config_path = tmp_path / "config.yaml"
    with open(config_path, "w") as fh:
        yaml.safe_dump(config, fh)
    output = str(tmp_path / "run")

    from diffusion_for_multi_scale_molecular_dynamics_tpu.train_diffusion import main

    main(["--config", str(config_path), "--output", output])

    # Sample from the trained model and score with the SW oracle.
    from diffusion_for_multi_scale_molecular_dynamics_tpu.generators import (
        LangevinGenerator,
        PredictorCorrectorSamplingParameters,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.noise_schedulers import (
        NoiseParameters,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.oracle import (
        StillingerWeberOracle,
        StillingerWeberParameters,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.oracle.energy_oracle_factory import (
        resolve_sw_coefficients_path,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.utils.restore import (
        load_axl_network_from_checkpoint,
    )

    axl_network = load_axl_network_from_checkpoint(output, prefer="best")
    generator = LangevinGenerator(
        NoiseParameters(
            total_time_steps=100,
            sigma_min=0.001,
            sigma_max=0.25,
            schedule_type="linear",
        ),
        PredictorCorrectorSamplingParameters(
            num_atom_types=1,
            number_of_atoms=8,
            number_of_samples=16,
            number_of_corrector_steps=2,
            use_fixed_lattice_parameters=True,
            cell_dimensions=[5.43, 5.43, 5.43],
        ),
        axl_network,
    )
    samples = generator.sample(jax.random.PRNGKey(5), 16)

    oracle = StillingerWeberOracle(
        StillingerWeberParameters(
            elements=["Si"],
            sw_coeff_filename=resolve_sw_coefficients_path("Si.sw"),
        )
    )
    energies, _ = oracle.compute_oracle_energies_and_forces(samples)
    e_per_atom = energies / 8

    # Random placements in this box score around -1.5 eV/atom or (much)
    # higher; MD data sits near -4.3. The trained model must be clearly on
    # the physical side.
    rng = np.random.RandomState(0)
    from diffusion_for_multi_scale_molecular_dynamics_tpu.namespace import AXL

    random_samples = AXL(
        A=np.zeros((16, 8), np.int32),
        X=rng.uniform(size=(16, 8, 3)).astype(np.float32),
        L=np.asarray(samples.L),
    )
    random_energies, _ = oracle.compute_oracle_energies_and_forces(random_samples)
    random_e_per_atom = random_energies / 8

    assert np.isfinite(e_per_atom).all()
    assert e_per_atom.mean() < -3.0, (e_per_atom.mean(), random_e_per_atom.mean())
    assert e_per_atom.mean() < random_e_per_atom.mean() - 1.0
