"""Training with validation-time sampling, SW-oracle KS metrics and figures."""

import csv
import os

import numpy as np
import pytest
import yaml

from tests.test_train_diffusion import make_config


def test_training_with_validation_sampling(tmp_path):
    from diffusion_for_multi_scale_molecular_dynamics_tpu.train_diffusion import main

    config = make_config(tmp_path, max_epoch=1)
    # Make the toy system physically scorable (box in Angstrom).
    config["data"]["use_fixed_lattice_parameters"] = True
    config["diffusion_sampling"] = {
        "noise": {"total_time_steps": 5, "sigma_min": 0.001, "sigma_max": 0.5},
        "sampling": {
            "algorithm": "predictor_corrector",
            "num_atom_types": 1,
            "number_of_atoms": 2,
            "number_of_samples": 8,
            "number_of_corrector_steps": 1,
            "use_fixed_lattice_parameters": True,
            "cell_dimensions": [5.43, 5.43, 5.43],
        },
        "metrics": {
            "compute_energies": True,
            "compute_structure_factor": True,
            "structure_factor_max_distance": 5.0,
        },
    }
    config["oracle"] = {"name": "stillinger_weber", "sw_coeff_filename": "Si.sw"}
    config["sampling_visualization"] = {
        "record_every_n_epochs": 1,
        "first_record_epoch": 0,
        "record_trajectories": True,
    }
    config["logging"] = ["csv"]

    config_path = tmp_path / "config.yaml"
    with open(config_path, "w") as fh:
        yaml.safe_dump(config, fh)
    output = str(tmp_path / "out")
    main(["--config", str(config_path), "--output", output])

    with open(os.path.join(output, "metrics.csv")) as fh:
        rows = list(csv.DictReader(fh))
    ks_energy = [
        float(r["validation_ks_distance_energy"])
        for r in rows
        if r.get("validation_ks_distance_energy")
    ]
    ks_structure = [
        float(r["validation_ks_distance_structure"])
        for r in rows
        if r.get("validation_ks_distance_structure")
    ]
    assert ks_energy and all(0.0 <= v <= 1.0 for v in ks_energy)
    assert ks_structure and all(0.0 <= v <= 1.0 for v in ks_structure)

    samples_dir = os.path.join(output, "samples")
    assert os.path.isdir(samples_dir) and os.listdir(samples_dir)
