"""Production-path training smoke: EGNN + LAMMPS data module + atom masks."""

import os

import numpy as np
import pytest
import yaml

from tests.fake_lammps_data import write_fake_lammps_run


@pytest.fixture
def raw_data(tmp_path):
    raw = tmp_path / "raw"
    write_fake_lammps_run(str(raw / "train_run_1"), n_steps=8, natoms=6, seed=1)
    write_fake_lammps_run(str(raw / "valid_run_1"), n_steps=4, natoms=6, seed=2)
    return str(raw)


def make_config(raw_data, processed_dir):
    return {
        "exp_name": "egnn_smoke",
        "max_epoch": 2,
        "seed": 1,
        "elements": ["Si"],
        "spatial_dimension": 3,
        "data": {
            "data_source": "LAMMPS",
            "lammps_run_dir": raw_data,
            "processed_dataset_dir": processed_dir,
            "batch_size": 4,
            "max_atom": 8,
            "use_fixed_lattice_parameters": True,
            "noise": {"total_time_steps": 5, "sigma_min": 0.001, "sigma_max": 0.5},
        },
        "model": {
            "loss": {
                "coordinates": {"algorithm": "weighted_mse", "lambda_weight": 1.0},
                "atom_types": {"algorithm": "d3pm", "lambda_weight": 1.0},
                "lattice_parameters": {"algorithm": "mse", "lambda_weight": 0.0},
            },
            "score_network": {
                "architecture": "egnn",
                "n_layers": 2,
                "message_hidden_dimensions_size": 8,
                "node_hidden_dimensions_size": 8,
                "coordinate_hidden_dimensions_size": 8,
                "edges": "radial_cutoff",
                "radial_cutoff": 3.0,
            },
        },
        "optimizer": {"name": "adamw", "learning_rate": 0.001},
        "model_checkpoint": {"monitor": "validation_epoch_loss", "mode": "min"},
        "logging": ["csv"],
    }


def test_train_egnn_on_lammps_data(tmp_path, raw_data):
    from diffusion_for_multi_scale_molecular_dynamics_tpu.train_diffusion import main

    config = make_config(raw_data, str(tmp_path / "processed"))
    config_path = tmp_path / "config.yaml"
    with open(config_path, "w") as fh:
        yaml.safe_dump(config, fh)
    output = str(tmp_path / "out")
    main(["--config", str(config_path), "--output", output])

    assert os.path.isdir(os.path.join(output, "best_model"))
    with open(os.path.join(output, "metrics.csv")) as fh:
        content = fh.read()
    assert "validation_epoch_loss" in content


@pytest.mark.slow
def test_train_mlp_with_optimal_transport(tmp_path):
    """The OT-aligned noising path (host LAP via pure_callback) in training."""
    from tests.test_train_diffusion import make_config as make_gaussian_config
    from diffusion_for_multi_scale_molecular_dynamics_tpu.train_diffusion import main

    config = make_gaussian_config(tmp_path, max_epoch=1)
    config["data"]["use_optimal_transport"] = True
    config_path = tmp_path / "config.yaml"
    with open(config_path, "w") as fh:
        yaml.safe_dump(config, fh)
    output = str(tmp_path / "out_ot")
    main(["--config", str(config_path), "--output", output])
    assert os.path.exists(os.path.join(output, "metrics.csv"))
